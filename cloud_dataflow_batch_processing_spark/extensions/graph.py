"""Iterative graph algorithms on DataFrames: PageRank (alongside the
family's k-means in similarity.py and connected components in
dedup.py). The 100 TB use cases: domain authority for crawl
prioritization, influence ranking over interaction graphs, link-graph
features for quality scoring.

Engine-neutral determinism: each iteration's per-node contribution sum
is carried in DECIMAL(38,18) (exact, order-independent) and converted
back to binary64 only for the next iteration's per-edge division —
both engines then execute the identical IEEE ops in the identical
order, so the full trajectory is bit-reproducible and the DuckDB
oracle (iterations unrolled as CTEs, same posture as
kmeans_assign_sql) certifies values, not just shapes.

Semantics: the standard damped update
    rank'(v) = (1-d)/N + d * SUM over in-edges (u,v) of rank(u)/deg(u)
WITHOUT dangling-mass redistribution (a sink's mass leaves the
system): the simplification keeps the SQL twin exact; callers who
need stochastic-matrix semantics can add self-loops upstream.

Scale posture: one shuffle per iteration (groupBy dst), the join
src→rank broadcast when ranks fit / SMJ otherwise (AQE decides), edges
never materialized per iteration beyond their scan. Iterations are a
driver-side Python loop over DataFrame transforms — the lineage grows
linearly, so for deep iteration counts checkpoint every few rounds
(same posture as connected_components' pointer-jumping loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEC = "decimal(38,18)"


def out_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))


def pagerank(
    edges: DataFrame, iters: int = 3, damping: float = 0.85
) -> DataFrame:
    """(node, rank) after ``iters`` damped iterations from the uniform
    start 1/N. ``edges`` is (src, dst), treated as a simple directed
    graph (dedupe upstream if needed)."""
    from cloud_dataflow_batch_processing_spark.caching import managed_cache

    # The edge relation is scanned by nodes (×2), deg, and every
    # iteration's contrib join — and callers often pass a derived frame
    # (join + distinct). Without a cache each of those re-executes the
    # whole upstream plan (measured r11, pagerank_supplier_customer at
    # sf0.1: warm 5.96 s → 4.83 s, 27 → 8 exchanges in the final plan —
    # the per-iteration edge-derivation re-runs disappear). nodes is
    # also re-scanned per iteration AND counted, so it caches too.
    edges = managed_cache(edges)
    nodes = managed_cache(
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # one scalar; every PageRank needs N
    if n == 0:
        # Empty graph: no nodes, no ranks — return the empty (node,
        # rank) frame with the right schema instead of dividing by N.
        return nodes.withColumn("rank", F.lit(0.0))
    deg = managed_cache(out_degrees(edges))
    base = 1.0 - damping
    rank = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iters):
        contrib = (
            edges.join(rank, edges["src"] == rank["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).cast(_DEC).alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        rank = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(base / n)
                + F.lit(damping) * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
            ).alias("rank"),
        )
        if i < iters - 1:
            # Round state is an EAGER localCheckpoint (the
            # connected_components discipline, r11): each round's plan
            # then starts from a LogicalRDD instead of re-entering AQE
            # with the previous rounds' joins unrolled beneath it. The
            # 2-column rank frame is tiny; old rounds' blocks release
            # when the driver handle rotates. Values unchanged —
            # checkpointing is plan surgery only. The LAST round stays
            # lazy so the returned frame composes into the caller's
            # plan as before.
            rank = rank.localCheckpoint(eager=True)
    return rank.select("node", F.round("rank", 10).alias("rank"))


def pagerank_sql(
    edges_sql: str, iters: int = 3, damping: float = 0.85
) -> str:
    """Oracle twin: iterations unrolled as CTEs over the same edge
    relation (``edges_sql`` must select columns src, dst)."""
    base = 1.0 - damping
    ctes = [
        f"e AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e)",
        "n_t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
        "r0 AS (SELECT node, (SELECT 1.0 / n FROM n_t) AS rank FROM nodes)",
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        ctes.append(
            f"""s{i} AS (
              SELECT e.dst AS node,
                     SUM(CAST(r.rank / deg.deg AS DECIMAL(38,18))) AS s
              FROM e JOIN {prev} r ON e.src = r.node JOIN deg ON e.src = deg.src
              GROUP BY e.dst
            )"""
        )
        ctes.append(
            f"""r{i} AS (
              SELECT nodes.node,
                     (SELECT {base!r} / n FROM n_t)
                     + {damping!r} * COALESCE(CAST(s.s AS DOUBLE), 0.0) AS rank
              FROM nodes LEFT JOIN s{i} s ON nodes.node = s.node
            )"""
        )
        prev = f"r{i}"
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT node, ROUND(rank, 10) AS rank FROM {prev}"
    )
