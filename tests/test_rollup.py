"""Incremental rollup (extensions/rollup.py): the partial/merge/
finalize contract — merge associativity-composition, parquet round-trip
of accumulator state (the real persistence path), backfill repair."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_dataflow_batch_processing_spark.extensions import rollup as RU

KEYS = ["o_orderstatus"]
MEASURES = ["o_totalprice"]


def _direct(o):
    return {
        r["o_orderstatus"]: r.asDict()
        for r in RU.rollup_finalize(
            RU.rollup_merge(RU.rollup_partial(o, KEYS, MEASURES), KEYS, MEASURES),
            KEYS,
            MEASURES,
        ).collect()
    }


def test_merge_of_shards_equals_whole(spark, tables):
    o = tables["orders"]
    whole = _direct(o)
    # shard by month, build partials independently, merge
    parts = [
        RU.rollup_partial(
            o.filter(F.month("o_orderdate") == m), KEYS, MEASURES
        )
        for m in range(1, 13)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = {
        r["o_orderstatus"]: r.asDict()
        for r in RU.rollup_finalize(
            RU.rollup_merge(u, KEYS, MEASURES), KEYS, MEASURES
        ).collect()
    }
    assert merged == whole


def test_merge_composes(spark, tables):
    """day→month→year: merging pre-merged halves equals one-shot."""
    o = tables["orders"]
    h1 = RU.rollup_merge(
        RU.rollup_partial(o.filter("o_orderkey % 2 = 0"), KEYS, MEASURES), KEYS, MEASURES
    )
    h2 = RU.rollup_merge(
        RU.rollup_partial(o.filter("o_orderkey % 2 = 1"), KEYS, MEASURES), KEYS, MEASURES
    )
    two_level = {
        r["o_orderstatus"]: r.asDict()
        for r in RU.rollup_finalize(
            RU.rollup_merge(h1.unionByName(h2), KEYS, MEASURES), KEYS, MEASURES
        ).collect()
    }
    assert two_level == _direct(o)


def test_partials_survive_parquet_roundtrip(spark, tables, tmp_path):
    """The persistence path: partials written per shard, read back,
    merged — DECIMAL accumulators must survive the file round-trip
    bit-exactly."""
    o = tables["orders"]
    for half, pred in (("a", "o_orderkey % 2 = 0"), ("b", "o_orderkey % 2 = 1")):
        RU.rollup_partial(o.filter(pred), KEYS, MEASURES).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / half))
    back = spark.read.parquet(str(tmp_path / "a")).unionByName(
        spark.read.parquet(str(tmp_path / "b"))
    )
    merged = {
        r["o_orderstatus"]: r.asDict()
        for r in RU.rollup_finalize(
            RU.rollup_merge(back, KEYS, MEASURES), KEYS, MEASURES
        ).collect()
    }
    assert merged == _direct(o)


def test_backfill_repair(spark, tables, tmp_path):
    """Recompute ONE shard's partial and re-merge: identical to a full
    rebuild — the repair story that makes stored partials safe."""
    o = tables["orders"]
    jan = RU.rollup_partial(o.filter(F.month("o_orderdate") == 1), KEYS, MEASURES)
    rest = RU.rollup_partial(o.filter(F.month("o_orderdate") != 1), KEYS, MEASURES)
    # "corrupt" jan by building it from half the rows, then repair
    bad_jan = RU.rollup_partial(
        o.filter((F.month("o_orderdate") == 1) & (F.col("o_orderkey") % 2 == 0)),
        KEYS,
        MEASURES,
    )
    bad = {
        r["o_orderstatus"]: r.asDict()
        for r in RU.rollup_finalize(
            RU.rollup_merge(bad_jan.unionByName(rest), KEYS, MEASURES), KEYS, MEASURES
        ).collect()
    }
    repaired = {
        r["o_orderstatus"]: r.asDict()
        for r in RU.rollup_finalize(
            RU.rollup_merge(jan.unionByName(rest), KEYS, MEASURES), KEYS, MEASURES
        ).collect()
    }
    assert repaired == _direct(o)
    assert bad != repaired  # the corruption was visible, the repair real
