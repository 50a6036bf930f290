"""Deterministic global shuffle + round-robin sharding — the step
between a cleaned corpus and the training job: materialize the corpus
in a seeded pseudo-random order, split into exactly-balanced shards,
so (a) a rerun reproduces byte-identical shards, (b) every shard is an
unbiased sample of the corpus (sources interleave), and (c) shard
sizes differ by at most one document.

Spelling: each row gets ``shuffle_key = md5(seed || ':' || id)`` — a
keyed permutation both engines compute identically — then the global
0-based rank in ``(shuffle_key, id)`` order, then
``shard_id = rank % n_shards`` (round-robin over the permuted order =
exact balance, unlike hash-mod sharding whose shard sizes fluctuate
binomially).

Scale posture (100 TB): the rank does NOT use an unpartitioned
``row_number()`` (a single-reduce-task plan). It reuses
``operators/ids.py::assign_sequential_ids`` — range-repartition by the
md5 key (sampled boundaries: balanced AND ordered), sort within
partitions, per-partition counts to a tiny driver list, offset + local
index. One range shuffle over narrow ``(key, id)`` rows plus one
partition-count job; the payload columns can be fetched back by id
after assignment (narrow-then-wide, the same fetch-join posture as the
dedup family) or carried through when they are slim. The write path is
``.write.partitionBy('shard_id')`` or per-shard files via
``repartition(n_shards, 'shard_id')``; round-robin ids mean every
shard's size is known exactly beforehand.

Determinism contract: md5 of the UTF-8 string is engine-independent;
``(shuffle_key, id)`` is a total order (id unique); ranks therefore
match ``row_number() OVER (ORDER BY shuffle_key, id) - 1`` exactly,
which is what the DuckDB oracle checks (rank-exactness of the two-pass
trick is already unit-pinned for assign_sequential_ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cloud_dataflow_batch_processing_spark.operators.ids import assign_sequential_ids


def shuffle_shard_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: str = "r11",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``shuffle_key`` (seeded md5), ``seq`` (global rank in the
    permuted order) and ``shard_id`` (round-robin) to ``df``.

    ``id_col`` must be unique — it is both the permutation input and
    the rank tiebreak.
    """
    keyed = df.withColumn(
        "shuffle_key",
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
    )
    ranked = assign_sequential_ids(
        keyed, ["shuffle_key", id_col], id_col="seq", num_partitions=num_partitions
    )
    return ranked.withColumn(
        "shard_id", (F.col("seq") % F.lit(n_shards)).cast("int")
    )


def shard_stats(sharded: DataFrame, size_col: str = "n_chars") -> DataFrame:
    """Per-shard manifest: doc count, payload size, permutation
    checksum (sum of rank x id — any rank misassignment moves it), and
    the shard's key range. Small (n_shards rows); this is the frame a
    pipeline would persist next to the shard files as the manifest."""
    return (
        sharded.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(size_col).cast("bigint").alias("n_chars_sum"),
            F.sum(F.col("seq") * F.col("doc_id")).cast("bigint").alias("perm_checksum"),
            F.min("shuffle_key").alias("first_key"),
            F.max("shuffle_key").alias("last_key"),
        )
        .orderBy("shard_id")
    )


def shuffle_shard_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    n_shards: int = 8,
    seed: str = "r11",
) -> str:
    """DuckDB oracle: the naive unpartitioned ROW_NUMBER form — the
    hash gate proves the scalable two-pass rank is permutation-exact."""
    return f"""
    WITH keyed AS (
      SELECT {id_col}, {size_col},
             md5('{seed}:' || CAST({id_col} AS VARCHAR)) AS shuffle_key
      FROM {table}
    ),
    ranked AS (
      SELECT {id_col}, {size_col}, shuffle_key,
             CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key, {id_col}) - 1
                  AS BIGINT) AS seq
      FROM keyed
    )
    SELECT CAST(seq % {n_shards} AS INT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM({size_col}) AS BIGINT) AS n_chars_sum,
           CAST(SUM(seq * {id_col}) AS BIGINT) AS perm_checksum,
           MIN(shuffle_key) AS first_key,
           MAX(shuffle_key) AS last_key
    FROM ranked
    GROUP BY shard_id
    ORDER BY shard_id
    """
