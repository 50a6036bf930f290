"""VCF (Variant Call Format) source — the Spark twin of Beam's vcfio.

Reference surface:
- ``ReadFromVcf(file_pattern, allow_malformed_records=False)``
  (reference: beam/io/vcfio.py:441-480; record model ``Variant`` /
  ``VariantCall`` / ``VariantInfo`` at :72-229; PyVCF-record →
  ``Variant`` conversion at :343-414).

Spark-first design — the whole record parse is Catalyst expressions
over ONE distributed text scan, so a 100 TB VCF corpus parses inside
whole-stage codegen with zero Python in the hot path:

1. ``spark.read.text`` scans every matched file; ``input_file_name()``
   tags each line with its file (no per-file driver loop over DATA).
2. Header lines (``#``-prefixed) are read DRIVER-SIDE, bounded: a VCF
   header is the first few KB of each file, so the driver streams each
   file only until the ``#CHROM`` line (gzip-aware). That gives the
   per-file sample-name list and INFO ``Number=`` spec — the same
   "bounded side ships, data side never collects" posture as the bloom
   decontamination broadcast. Beam parses the header per file too
   (vcfio.py:265-290, header_processor_fns) — per-file headers ARE the
   format's contract (sample columns differ per file).
3. The per-file header table broadcast-joins onto the line scan, and
   every field — POS→start/end, ALT/ID/FILTER list semantics, the
   INFO map with Beam's ``END`` special case, per-sample genotype /
   phaseset / FORMAT map — is a built-in expression (split / transform
   / zip_with / map_from_entries). No UDF, no shuffle: the parse is a
   map-only stage.

Semantics matched to the reference record model (beam/io/vcfio.py):
- ``start``   = POS - 1 (0-based, :96).
- ``end``     = start + len(REF), overridden by the INFO ``END`` key,
  which is excluded from the info map (:373-377, PyVCF ``record.end``).
- ``reference_bases`` = REF, or NULL when ``.`` (:141-142).
- ``alternate_bases`` = ALT split on ``,`` with ``.`` entries dropped
  (:365-367 — PyVCF yields None for ``.`` and Beam filters it).
- ``names``   = ID split on ``;``; ``[]`` when ``.`` (:368).
- ``quality`` = QUAL as double; NULL when ``.`` (:369).
- ``filters`` = ``[]`` for ``.``, ``['PASS']`` for PASS, else split on
  ``;`` (:370-372 — PyVCF maps ``.``→None / PASS→[], Beam re-expands).
- ``info``    = map key → struct(data, field_count) mirroring
  ``VariantInfo`` (:57,373-381). Divergence, documented: ``data`` is
  the array of raw comma-split value tokens (``[]`` for Flag keys),
  not per-header-typed Python values — a DataFrame column must have ONE
  type; use :func:`info_values_as` for typed access. ``field_count``
  is the header's ``Number=`` spec verbatim (``A``/``G``/``R``/int),
  NULL for ``.`` — exactly Beam's ``_get_field_count_as_string``.
- ``calls``   = one struct per sample column (:382-413): ``genotype``
  from GT with ``.``→-1 and missing-GT→[-1]; ``phaseset`` = the PS
  value when present else ``*`` when the GT is ``|``-phased else NULL;
  ``info`` = the remaining FORMAT fields as raw strings (same
  one-column-one-type divergence as variant info).

Malformed records: ``allow_malformed_records=False`` (Beam's default,
:446) raises on the first structurally-bad line; ``True`` drops them
from the variant output, and :func:`read_vcf_malformed` returns them
as ``(file_name, line)`` rows — the relational spelling of Beam's
``MalformedVcfRecord`` union (:60-65), since one DataFrame cannot
carry two row types. Structural = field count / POS / QUAL; two
finer-grained PyVCF failure classes are deliberately value-level here
instead of record-level: a non-numeric GT allele yields a NULL
genotype element (PyVCF raises → dead-letters the whole record), and a
non-numeric ``END=`` value falls back to ``start + len(REF)`` (PyVCF
raises). Both keep the record's other fields — stricter callers can
filter on ``exists(genotype, isnull)``.
"""

from __future__ import annotations

import gzip
import io

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

MISSING_FIELD_VALUE = "."
PASS_FILTER = "PASS"
END_INFO_KEY = "END"
GENOTYPE_FORMAT_KEY = "GT"
PHASESET_FORMAT_KEY = "PS"
DEFAULT_PHASESET_VALUE = "*"
MISSING_GENOTYPE_VALUE = -1

_FIXED_FIELDS = 8  # CHROM POS ID REF ALT QUAL FILTER INFO

_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("__vcf_file", T.StringType()),
        T.StructField("__vcf_samples", T.ArrayType(T.StringType())),
        T.StructField(
            "__vcf_info_counts", T.MapType(T.StringType(), T.StringType())
        ),
    ]
)

VARIANT_SCHEMA = T.StructType(
    [
        T.StructField("reference_name", T.StringType()),
        T.StructField("start", T.LongType()),
        T.StructField("end", T.LongType()),
        T.StructField("reference_bases", T.StringType()),
        T.StructField("alternate_bases", T.ArrayType(T.StringType())),
        T.StructField("names", T.ArrayType(T.StringType())),
        T.StructField("quality", T.DoubleType()),
        T.StructField("filters", T.ArrayType(T.StringType())),
        T.StructField(
            "info",
            T.MapType(
                T.StringType(),
                T.StructType(
                    [
                        T.StructField("data", T.ArrayType(T.StringType())),
                        T.StructField("field_count", T.StringType()),
                    ]
                ),
            ),
        ),
        T.StructField(
            "calls",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("genotype", T.ArrayType(T.IntegerType())),
                        T.StructField("phaseset", T.StringType()),
                        T.StructField(
                            "info", T.MapType(T.StringType(), T.StringType())
                        ),
                    ]
                )
            ),
        ),
    ]
)


# ---------------------------------------------------------------------------
# Header scan (driver-side, bounded by files x header size, never by data)
# ---------------------------------------------------------------------------


def _open_local_or_fs(path: str):
    """Binary stream for a local path or any pyarrow.fs URI."""
    if "://" in path:
        from pyarrow import fs as pafs

        filesystem, rel = pafs.FileSystem.from_uri(path)
        return filesystem.open_input_stream(rel)
    return open(path, "rb")


def _expand_pattern(spark: SparkSession, pattern: str) -> list[str]:
    """Expand a glob the same way Spark's file index will (so header
    keys line up with ``input_file_name()``), via the Hadoop FS API —
    one driver RPC, not a data read."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(pattern)
    fs = jpath.getFileSystem(conf)
    statuses = fs.globStatus(jpath)
    if statuses is None:
        return []
    out = []
    for st in statuses:
        if st.isDirectory():
            for sub in fs.listStatus(st.getPath()):
                if sub.isFile():
                    out.append(sub.getPath().toString())
        else:
            out.append(st.getPath().toString())
    return sorted(out)


def _read_header(path: str) -> tuple[list[str], dict[str, str]]:
    """Stream ONE file until the ``#CHROM`` column line: returns
    (sample_names, info_key -> Number spec). Beam twin: the
    header_processor_fns prefix capture (vcfio.py:284-287) + PyVCF's
    header parse. Bounded read — a VCF header is KBs at the file head."""
    local = path
    for scheme in ("file://", "file:"):
        if local.startswith(scheme):
            local = "/" + local[len(scheme) :].lstrip("/")
            break
    raw = _open_local_or_fs(local)
    stream: io.IOBase = (
        gzip.GzipFile(fileobj=raw) if local.endswith(".gz") else raw
    )
    samples: list[str] = []
    info_counts: dict[str, str] = {}
    try:
        for bline in io.BufferedReader(stream):
            line = bline.decode("utf-8").rstrip("\r\n")
            if not line.startswith("#"):
                break  # defensive: records with no #CHROM line
            if line.startswith("##INFO=<"):
                body = line[len("##INFO=<") :].rstrip(">")
                fields = dict(
                    kv.split("=", 1) for kv in body.split(",") if "=" in kv
                )
                if "ID" in fields:
                    info_counts[fields["ID"]] = fields.get("Number", ".")
            elif line.startswith("#CHROM"):
                cols = line.lstrip("#").split("\t")
                # CHROM POS ID REF ALT QUAL FILTER INFO [FORMAT samples...]
                samples = cols[_FIXED_FIELDS + 1 :]
                break
    finally:
        stream.close()
    return samples, info_counts


def _header_table(spark: SparkSession, pattern: str) -> DataFrame:
    rows = []
    for path in _expand_pattern(spark, pattern):
        samples, info_counts = _read_header(path)
        rows.append((path, samples, info_counts))
    if not rows:
        raise FileNotFoundError(f"no files match VCF pattern: {pattern!r}")
    # Literal JVM frame, not createDataFrame: the header table is a
    # broadcast side evaluated on EVERY read action — the Python-RDD
    # form re-ran defaultParallelism Python-worker slices per action
    # (sources/create.local_df docstring has the measurement).
    from cloud_dataflow_batch_processing_spark.sources.create import local_df

    return local_df(spark, rows, _HEADER_SCHEMA)


# ---------------------------------------------------------------------------
# Record parse (pure Catalyst expressions)
# ---------------------------------------------------------------------------


def _norm_file(col: Column) -> Column:
    # input_file_name() yields a URI (file:///a/b); the header table
    # stores Hadoop Path.toString() (file:/a/b). Normalize both sides.
    return F.regexp_replace(col, "^(file|hdfs|s3a?|gs|abfss?):/+", "$1:/")


def _split_list(col: Column, sep: str) -> Column:
    """`.` -> [], else split — the shared ALT/ID/FILTER list shape."""
    return F.when(col == MISSING_FIELD_VALUE, F.array().cast("array<string>")).otherwise(
        F.split(col, sep)
    )


def _genotype_expr(gt: Column) -> Column:
    """GT string -> array<int>: 0/1 | 1|1 | . | ./. ; missing -> [-1]
    (vcfio.py:385-389 via PyVCF gt_alleles)."""
    return F.when(
        gt.isNull() | (gt == "") | (gt == MISSING_FIELD_VALUE),
        F.array(F.lit(MISSING_GENOTYPE_VALUE)),
    ).otherwise(
        F.transform(
            F.split(gt, r"[/|]"),
            lambda a: F.when(
                (a == MISSING_FIELD_VALUE) | (a == ""),
                F.lit(MISSING_GENOTYPE_VALUE),
            ).otherwise(a.try_cast("int")),
        )
    )


def _calls_expr() -> Column:
    """Per-sample call structs from FORMAT + sample columns
    (vcfio.py:382-413). zip_with pads the shorter side with NULL, so a
    file whose record rows carry fewer sample columns than the header
    (malformed-tolerated) yields NULL-field calls rather than dropping
    samples."""
    fmt_keys = F.col("__fmt_keys")
    return F.zip_with(
        F.col("__vcf_samples"),
        F.col("__sample_vals"),
        lambda name, sval: F.named_struct(
            F.lit("name"),
            name,
            F.lit("genotype"),
            _genotype_expr(
                F.try_element_at(
                    F.split(sval, ":"),
                    F.coalesce(
                        F.nullif(
                            F.array_position(fmt_keys, GENOTYPE_FORMAT_KEY),
                            F.lit(0),
                        ),
                        # GT absent from FORMAT -> element_at(…, big) = NULL
                        F.lit(2_000_000_000),
                    ).cast("int"),
                )
            ),
            F.lit("phaseset"),
            _phaseset_expr(fmt_keys, sval),
            F.lit("info"),
            _call_info_expr(fmt_keys, sval),
        ),
    )


def _phaseset_expr(fmt_keys: Column, sval: Column) -> Column:
    ps_pos = F.nullif(
        F.array_position(fmt_keys, PHASESET_FORMAT_KEY), F.lit(0)
    ).cast("int")
    ps_val = F.try_element_at(F.split(sval, ":"), F.coalesce(ps_pos, F.lit(2_000_000_000)))
    gt_pos = F.nullif(
        F.array_position(fmt_keys, GENOTYPE_FORMAT_KEY), F.lit(0)
    ).cast("int")
    gt_val = F.try_element_at(F.split(sval, ":"), F.coalesce(gt_pos, F.lit(2_000_000_000)))
    phased = F.coalesce(gt_val.contains("|"), F.lit(False))
    return F.when(
        ps_val.isNotNull() & (ps_val != MISSING_FIELD_VALUE) & (ps_val != ""),
        ps_val,
    ).otherwise(F.when(phased, F.lit(DEFAULT_PHASESET_VALUE)))


def _call_info_expr(fmt_keys: Column, sval: Column) -> Column:
    vals = F.split(sval, ":")
    idx = F.sequence(F.lit(1), F.size(fmt_keys))
    entries = F.filter(
        F.transform(
            idx,
            lambda i: F.struct(
                F.try_element_at(fmt_keys, i.cast("int")).alias("key"),
                F.try_element_at(vals, i.cast("int")).alias("value"),
            ),
        ),
        lambda e: ~e["key"].isin(GENOTYPE_FORMAT_KEY, PHASESET_FORMAT_KEY),
    )
    return F.map_from_entries(entries)


def _info_expr() -> Column:
    """INFO string -> map<key, struct(data array<string>, field_count)>,
    END excluded (it overrides ``end``, vcfio.py:373-377)."""
    raw = F.col("__info_raw")
    entries = F.filter(
        F.transform(
            F.split(raw, ";"),
            lambda kv: F.struct(
                F.substring_index(kv, "=", 1).alias("key"),
                F.when(
                    kv.contains("="),
                    F.split(F.regexp_replace(kv, "^[^=]*=", ""), ","),
                )
                .otherwise(F.array().cast("array<string>"))
                .alias("data"),
            ),
        ),
        lambda e: (e["key"] != END_INFO_KEY) & (e["key"] != MISSING_FIELD_VALUE) & (e["key"] != ""),
    )
    with_counts = F.transform(
        entries,
        lambda e: F.struct(
            e["key"].alias("key"),
            F.struct(
                e["data"].alias("data"),
                F.nullif(
                    F.try_element_at(F.col("__vcf_info_counts"), e["key"]),
                    F.lit(MISSING_FIELD_VALUE),
                ).alias("field_count"),
            ).alias("value"),
        ),
    )
    return F.when(raw == MISSING_FIELD_VALUE, F.map_from_entries(F.array().cast(
        "array<struct<key:string,value:struct<data:array<string>,field_count:string>>>"
    ))).otherwise(F.map_from_entries(with_counts))


def _parsed_lines(spark: SparkSession, file_pattern: str) -> DataFrame:
    # Header scan first: an empty glob fails with FileNotFoundError
    # (Beam raises at pipeline construction too) rather than Spark's
    # generic PATH_NOT_FOUND at read time.
    headers = _header_table(spark, file_pattern).withColumn(
        "__vcf_file", _norm_file(F.col("__vcf_file"))
    )
    lines = (
        spark.read.text(file_pattern)
        # CRLF files: Spark's text reader splits on \n and KEEPS the
        # \r, which would silently pollute the last sample column
        # (Beam's TextSource strips \r\n — textio.py strip_trailing_
        # newlines). Strip it before field split.
        .withColumn("value", F.regexp_replace("value", "\r$", ""))
        .withColumn("__vcf_file", _norm_file(F.input_file_name()))
        .filter(~F.col("value").startswith("#"))
    )
    cols = F.split(F.col("value"), "\t")
    return (
        lines.join(F.broadcast(headers), "__vcf_file", "left")
        .withColumn("__cols", cols)
        .withColumn("__pos", F.try_element_at("__cols", F.lit(2)).try_cast("long"))
        .withColumn("__qual_raw", F.try_element_at("__cols", F.lit(6)))
        .withColumn(
            "__malformed",
            (F.size("__cols") < _FIXED_FIELDS)
            | F.col("__pos").isNull()
            | (
                (F.col("__qual_raw") != MISSING_FIELD_VALUE)
                & F.col("__qual_raw").try_cast("double").isNull()
            ),
        )
    )


def _variant_projection(df: DataFrame) -> DataFrame:
    ref = F.try_element_at("__cols", F.lit(4))
    end_override = F.regexp_extract(
        F.try_element_at("__cols", F.lit(8)), r"(?:^|;)END=([0-9]+)(?:;|$)", 1
    )
    return (
        df.withColumn("__info_raw", F.try_element_at("__cols", F.lit(8)))
        .withColumn("__fmt_keys", F.split(F.try_element_at("__cols", F.lit(9)), ":"))
        .withColumn(
            "__sample_vals",
            F.when(
                F.size("__cols") > _FIXED_FIELDS + 1,
                F.slice(
                    "__cols",
                    _FIXED_FIELDS + 2,
                    F.size("__cols") - (_FIXED_FIELDS + 1),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
        .select(
            F.try_element_at("__cols", F.lit(1)).alias("reference_name"),
            (F.col("__pos") - 1).alias("start"),
            F.coalesce(
                F.nullif(end_override, F.lit("")).try_cast("long"),
                F.col("__pos") - 1 + F.length(ref),
            ).alias("end"),
            F.nullif(ref, F.lit(MISSING_FIELD_VALUE)).alias("reference_bases"),
            F.filter(
                _split_list(F.try_element_at("__cols", F.lit(5)), ","),
                lambda a: a != MISSING_FIELD_VALUE,
            ).alias("alternate_bases"),
            _split_list(F.try_element_at("__cols", F.lit(3)), ";").alias("names"),
            F.nullif(F.col("__qual_raw"), F.lit(MISSING_FIELD_VALUE))
            .try_cast("double")
            .alias("quality"),
            F.when(
                F.try_element_at("__cols", F.lit(7)) == PASS_FILTER,
                F.array(F.lit(PASS_FILTER)),
            )
            .otherwise(_split_list(F.try_element_at("__cols", F.lit(7)), ";"))
            .alias("filters"),
            _info_expr().alias("info"),
            F.when(F.size("__sample_vals") > 0, _calls_expr())
            .otherwise(
                F.array().cast(VARIANT_SCHEMA["calls"].dataType)
            )
            .alias("calls"),
        )
    )


def read_vcf(
    spark: SparkSession,
    file_pattern: str,
    allow_malformed_records: bool = False,
) -> DataFrame:
    """Beam twin: ReadFromVcf (beam/io/vcfio.py:441-480) — VCF records
    as ``VARIANT_SCHEMA`` rows. One map-only scan; per-file headers
    broadcast. ``allow_malformed_records=False`` raises on the first
    structurally-bad record line (Beam :326-341); ``True`` drops them
    (pair with :func:`read_vcf_malformed` for the dead-letter side)."""
    parsed = _parsed_lines(spark, file_pattern)
    if allow_malformed_records:
        good = parsed.filter(~F.col("__malformed"))
    else:
        # assert_true returns NULL when the check passes, raises with the
        # offending line otherwise — the check rides the distributed scan.
        good = parsed.filter(
            F.assert_true(
                ~F.col("__malformed"),
                F.concat(
                    F.lit("malformed VCF record in "),
                    F.col("__vcf_file"),
                    F.lit(": "),
                    F.col("value"),
                ),
            ).isNull()
        )
    return _variant_projection(good)


def read_vcf_malformed(spark: SparkSession, file_pattern: str) -> DataFrame:
    """The dead-letter side of ``allow_malformed_records=True``:
    ``(file_name, line)`` rows, Beam's MalformedVcfRecord
    (beam/io/vcfio.py:60-65) as a relation."""
    return (
        _parsed_lines(spark, file_pattern)
        .filter(F.col("__malformed"))
        .select(
            F.col("__vcf_file").alias("file_name"), F.col("value").alias("line")
        )
    )


def info_values_as(info_col: Column, key: str, cast_to: str = "double") -> Column:
    """Typed access to an info key's data tokens (the per-header typing
    Beam bakes into VariantInfo.data; here an explicit cast because a
    DataFrame column has one type): array of ``cast_to`` values."""
    return F.transform(info_col[key]["data"], lambda v: v.cast(cast_to))


def write_vcf_lines(
    df: DataFrame,
    path: str,
    header_lines: list[str],
) -> None:
    """Serialize pre-formatted VCF record lines (``value: string``) into
    ONE file under ``path`` with ``header_lines`` prepended. Not a
    Beam-2.5 surface (it has no WriteToVcf) — a test/fixture utility so
    roundtrips stay inside the engine. One call = one VCF file (a VCF
    header belongs to exactly one file); write several files for
    multi-file / per-file-header coverage."""
    spark = df.sparkSession
    # Literal JVM frame (sources/create.local_df): the createDataFrame
    # form was a 32-slice Python RDD whose coalesce(1) write evaluated
    # every slice SEQUENTIALLY in one task — ~5 s per file written for
    # a 6-line header (measured, r11 optimization round).
    from cloud_dataflow_batch_processing_spark.sources.create import local_df

    hdr_df = local_df(
        spark, [(i, line) for i, line in enumerate(header_lines)], "ord long, value string"
    )
    rec_df = df.select(F.lit(len(header_lines)).alias("ord"), "value")
    (
        hdr_df.select("ord", "value")
        .unionByName(rec_df)
        .coalesce(1)
        .sortWithinPartitions("ord")
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )


__all__ = [
    "VARIANT_SCHEMA",
    "read_vcf",
    "read_vcf_malformed",
    "info_values_as",
    "write_vcf_lines",
]
