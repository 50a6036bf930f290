"""PageRank (extensions/graph.py): closed-form fixtures and invariants."""

from __future__ import annotations

import pytest

from cloud_dataflow_batch_processing_spark.extensions.graph import pagerank


def _ranks(spark, edges, iters=3, damping=0.85):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(df, iters, damping).collect()}


def test_cycle_stays_uniform(spark):
    """A 3-cycle is already stationary: every iteration returns 1/3."""
    r = _ranks(spark, [(1, 2), (2, 3), (3, 1)])
    # output rounds to 10 dp at the boundary
    assert all(abs(v - 1 / 3) < 1e-9 for v in r.values())


def test_star_concentrates_rank(spark):
    """All edges into one hub: the hub's rank dominates and equals
    (1-d)/N + d * sum(leaf ranks), leaves keep (1-d)/N."""
    r = _ranks(spark, [(1, 9), (2, 9), (3, 9)], iters=1)
    n, d = 4, 0.85
    leaf = (1 - d) / n
    assert r[1] == pytest.approx(leaf, abs=1e-9)
    assert r[9] == pytest.approx(leaf + d * 3 * (1 / n), abs=1e-9)
    assert r[9] > r[1]


def test_sink_leaks_mass(spark):
    """Documented semantics: dangling mass leaves the system — total
    rank strictly below 1 when a sink exists, equal to 1 on a cycle."""
    cyc = _ranks(spark, [(1, 2), (2, 3), (3, 1)])
    assert sum(cyc.values()) == pytest.approx(1.0, abs=1e-9)
    sink = _ranks(spark, [(1, 2), (2, 3)])  # 3 is dangling
    assert sum(sink.values()) < 1.0


def test_deterministic_across_runs(spark):
    edges = [(i, (i * 7) % 23) for i in range(100)]
    a = _ranks(spark, edges)
    b = _ranks(spark, edges)
    assert a == b  # exact, not approximate
