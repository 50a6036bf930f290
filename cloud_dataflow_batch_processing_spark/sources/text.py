"""Text / CSV sources and sinks — the Spark twin of Beam's textio.

Reference surface:
- ``ReadFromText(file_pattern, ..., skip_header_lines=0)``
  (reference: beam/io/textio.py:473-525; used dataflow_pipeline.py:153)
- ``WriteToText(prefix, suffix, num_shards, ...)``
  (reference: beam/io/textio.py:528-584; used
  local_directrunner_pipeline.py:112-114)

Spark-first notes:
- CSV parsing + header skip + schema coercion are native reader features
  — the reference's hand-rolled ``parse_method`` line parser
  (dataflow_pipeline.py:57-99) is subsumed by ``spark.read.csv`` with
  ``header=True`` and an explicit StructType, which also fixes the
  reference's newline-in-quoted-field bug (ReadFromText splits on
  newlines before the csv parser sees the line; Spark's multiLine mode
  handles it).
- Glob expansion, compression auto-detect, and per-file splitting are
  Hadoop FileInputFormat features — nothing to build (the reference
  builds these by hand in beam/io/filebasedsource.py:53-299).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

_VALUE_SCHEMA = T.StructType([T.StructField("value", T.StringType())])


def read_text(
    spark: SparkSession,
    path: str,
    skip_header_lines: int = 0,
    wholetext: bool = False,
) -> DataFrame:
    """Read newline-delimited text as a single ``value: string`` column.

    Beam twin: ReadFromText (beam/io/textio.py:473). Compression and
    globs are handled by the Hadoop input layer.

    ``skip_header_lines`` skips the first N lines of *each* file (Beam
    semantics, beam/io/textio.py:91-106). Spark has no native per-file
    line skip for raw text (the CSV reader's ``header`` option covers the
    N=1 case — prefer :func:`read_csv`); we implement it scale-safely in
    ONE distributed read regardless of file count:

    1. Read via Hadoop TextInputFormat, whose record key is the line's
       byte offset *within its file* — so ``offset == 0`` marks every
       file's first line, with no per-file driver loop and no
       ``input_file_name`` string shuffling.
    2. ``zipWithIndex`` assigns global line indices (HadoopRDD partitions
       enumerate splits in file/offset order, so indices are contiguous
       per file; one small count job).
    3. The skip set is exactly ∪ [start, start+N) over each file-start
       index — a frame with files×N rows, removed with a broadcast
       anti-join. No global window, no single-task bottleneck.
    """
    if skip_header_lines <= 0:
        return spark.read.text(path, wholetext=wholetext)

    sc = spark.sparkContext
    n = skip_header_lines
    pairs = sc.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
    )
    indexed = pairs.zipWithIndex().map(lambda kv: (kv[0][0], kv[0][1], kv[1]))
    df = spark.createDataFrame(
        indexed,
        T.StructType(
            [
                T.StructField("__offset", T.LongType()),
                T.StructField("value", T.StringType()),
                T.StructField("__gidx", T.LongType()),
            ]
        ),
    )
    skip = (
        df.filter(F.col("__offset") == 0)
        .select(
            F.explode(
                F.sequence(F.col("__gidx"), F.col("__gidx") + F.lit(n - 1))
            ).alias("__gidx")
        )
    )
    return (
        df.join(F.broadcast(skip), on="__gidx", how="left_anti")
        .select("value")
    )


def read_all_text(
    spark: SparkSession,
    patterns: list[str],
    skip_header_lines: int = 0,
) -> DataFrame:
    """Beam twin: ReadAllFromText (beam/io/textio.py:411) — a collection
    of file patterns, each expanded and read. The pattern list is
    driver-side (Beam's is a PCollection, but its expansion also happens
    on workers holding the full pattern string — the driver-side union
    keeps Spark's scan planning / split computation intact, which is the
    scalable path for file counts in the millions)."""
    dfs = [read_text(spark, p, skip_header_lines=skip_header_lines) for p in patterns]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    all_strings: bool = False,
    multi_line: bool = False,
    sep: str = ",",
    mode: str = "PERMISSIVE",
    corrupt_record_col: str | None = None,
) -> DataFrame:
    """CSV scan — subsumes the reference's ReadFromText + parse_method
    pair (dataflow_pipeline.py:153,57-99).

    ``all_strings=True`` reproduces the reference's "data is not
    transformed" mode (every field read as string; dataflow_pipeline.py:
    64-66): pass the typed schema and we derive its all-string twin.

    Malformed-row policy (``mode``), the ingestion-hygiene knob a
    100 TB CSV load needs (the reference's parse_method silently
    yields whatever split() produces — dataflow_pipeline.py:57-99):
    - ``PERMISSIVE`` (default): bad rows NULL-fill; pass
      ``corrupt_record_col`` to also capture each bad row's raw text
      in a quarantine column (added to the schema automatically) so
      the load can route rejects to a dead-letter sink instead of
      losing them.
    - ``DROPMALFORMED``: bad rows dropped.
    - ``FAILFAST``: the job fails on the first bad row.
    """
    reader = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("multiLine", multi_line)
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", mode)
    )
    if corrupt_record_col:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_record_col)
        if schema is not None and corrupt_record_col not in schema.fieldNames():
            schema = T.StructType(
                [*schema.fields, T.StructField(corrupt_record_col, T.StringType(), True)]
            )
    if schema is not None:
        if all_strings:
            from cloud_dataflow_batch_processing_spark.schema import all_string_struct

            schema = all_string_struct(schema)
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "false")
    return reader.csv(path)


def write_text(
    df: DataFrame,
    path: str,
    num_shards: int = 0,
    mode: str = "overwrite",
    compression: str | None = None,
    header: str | None = None,
) -> None:
    """Beam twin: WriteToText (beam/io/textio.py:528). The frame must be
    a single string column (use :func:`rows_as_repr_lines` or
    ``F.concat_ws`` upstream to serialize rows).

    ``num_shards=0`` keeps Spark's natural partitioning (Beam's
    runner-decided sharding); ``num_shards=n`` coalesces. Beam's
    ``-SSSSS-of-NNNNN`` shard template is an output-committer naming
    detail we deliberately do not reproduce (part-* naming instead).

    ``header`` is written at the beginning of EVERY shard file (Beam
    semantics — textio.py:540,575: the sink's ``open`` emits it per
    file, empty shards included). Spark's text sink has no header
    option, so this branch is the documented RDD carve-out: a
    per-partition ``mapPartitions`` prepend — genuinely imperative
    per-file logic, still one distributed pass, no driver
    materialization. Roundtrips with ``read_text(skip_header_lines=1)``
    / ``read_csv(header=True)``.
    """
    out = df if num_shards <= 0 else df.coalesce(num_shards)
    if header is None:
        w = out.write.mode(mode)
        if compression:
            w = w.option("compression", compression)
        w.text(path)
        return
    import itertools

    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        if mode == "overwrite":
            fs.delete(jpath, True)
        elif mode in ("error", "errorifexists"):
            raise FileExistsError(path)
        elif mode == "ignore":
            return
        else:
            raise ValueError(
                f"mode {mode!r} unsupported with header= (append would "
                "interleave headers mid-directory)"
            )
    lines = out.rdd.map(lambda r: "" if r[0] is None else str(r[0]))
    with_header = lines.mapPartitions(
        lambda it, h=header: itertools.chain([h], it)
    )
    codec = {
        "gzip": "org.apache.hadoop.io.compress.GzipCodec",
        "bzip2": "org.apache.hadoop.io.compress.BZip2Codec",
        "deflate": "org.apache.hadoop.io.compress.DeflateCodec",
    }.get(compression or "")
    if compression and codec is None:
        raise ValueError(f"unsupported compression with header=: {compression!r}")
    if codec:
        with_header.saveAsTextFile(path, codec)
    else:
        with_header.saveAsTextFile(path)


def write_csv(
    df: DataFrame,
    path: str,
    num_shards: int = 0,
    mode: str = "overwrite",
    header: bool = True,
) -> None:
    out = df if num_shards <= 0 else df.coalesce(num_shards)
    out.write.mode(mode).option("header", header).csv(path)


def rows_as_repr_lines(df: DataFrame) -> DataFrame:
    """Fidelity helper: the reference's local text sink writes
    ``str(dict)`` Python-repr lines, not CSV, despite the .csv suffix
    (local_directrunner_pipeline.py:112-114; golden file
    direct_run_output/result2-00000-of-00001.csv:1). This reproduces the
    *shape* (one serialized line per row) with to_json — semantic parity,
    not byte parity (SURVEY.md §7 hard-part 4).
    """
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))
