"""Deterministic shuffle-shard (extensions/shard.py): exact balance,
seeded determinism, permutation-exactness vs the naive rank, and the
scalable-plan contract (no single-reduce window stage)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from cloud_dataflow_batch_processing_spark.extensions import shard as SH


def _docs(spark, n=23):
    return spark.range(n).select(
        (F.col("id") * 7 + 3).alias("doc_id"), (F.col("id") % 5 + 1).alias("n_chars")
    )


def _expected_order(ids, seed="r11"):
    return sorted(ids, key=lambda i: (hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), i))


def test_ranks_match_python_md5_order(spark):
    """seq == the rank in (md5(seed:id), id) order computed by an
    independent Python oracle — permutation-exact, engine-independent."""
    d = _docs(spark, 23)
    got = {r["doc_id"]: r["seq"] for r in SH.shuffle_shard_assign(d).collect()}
    ids = sorted(got)
    expect = {i: rank for rank, i in enumerate(_expected_order(ids))}
    assert got == expect


def test_round_robin_balance_exact(spark):
    """Shard sizes differ by at most one — the round-robin guarantee
    hash-mod sharding does not give."""
    d = _docs(spark, 23)
    sizes = [
        r["n_docs"]
        for r in SH.shard_stats(SH.shuffle_shard_assign(d, n_shards=4)).collect()
    ]
    assert sorted(sizes) == [5, 6, 6, 6]


def test_partitioning_invariance(spark):
    """Ranks depend only on the total order, not the physical layout:
    1-partition and 16-partition inputs assign identical shards."""
    d = _docs(spark, 40)
    a = SH.shuffle_shard_assign(d.coalesce(1), num_partitions=2).collect()
    b = SH.shuffle_shard_assign(d.repartition(16), num_partitions=5).collect()
    key = lambda rows: {r["doc_id"]: (r["seq"], r["shard_id"]) for r in rows}
    assert key(a) == key(b)


def test_seed_changes_permutation(spark):
    """A different seed yields a different interleave (the permutation
    is keyed), while each remains internally deterministic."""
    d = _docs(spark, 40)
    a = {r["doc_id"]: r["seq"] for r in SH.shuffle_shard_assign(d, seed="r11").collect()}
    b = {r["doc_id"]: r["seq"] for r in SH.shuffle_shard_assign(d, seed="other").collect()}
    assert a != b
    assert set(a.values()) == set(b.values()) == set(range(40))


def test_no_single_partition_window_plan(spark):
    """The scalable-plan contract: no unpartitioned Window node (the
    naive ROW_NUMBER spelling) anywhere; the only wide stages are the
    range repartition and the manifest's hash agg."""
    from cloud_dataflow_batch_processing_spark.plans.inspect import executed_plan

    d = _docs(spark, 100)
    df = SH.shard_stats(SH.shuffle_shard_assign(d, num_partitions=4))
    plan = executed_plan(df)
    assert "Window" not in plan
    assert "SinglePartition" not in plan
