"""Z-order layout (extensions/layout.py): the curve must interleave
bits correctly, and the layout must actually cluster BOTH dimensions —
the property row-group min/max skipping depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_dataflow_batch_processing_spark.extensions.layout import (
    clustering_spread,
    zorder_layout,
    zvalue,
)


def test_zvalue_bit_interleave(spark):
    df = spark.range(1).select(
        zvalue(F.lit(0b101), F.lit(0b011), 3).alias("z"),
        zvalue(F.lit(0), F.lit(0), 3).alias("z0"),
        zvalue(F.lit(7), F.lit(7), 3).alias("z7"),
    )
    r = df.head()
    # x=101, y=011 -> bits (y2 x2 y1 x1 y0 x0) = 0 1 1 0 1 1 = 0b011011
    assert r["z"] == 0b011011
    assert r["z0"] == 0
    assert r["z7"] == 0b111111


def test_zorder_layout_clusters_both_dimensions(spark):
    """On a 64x64 grid laid out into 16 partitions, each partition must
    cover a small window of BOTH x and y — unlike a sort by x alone,
    which leaves y unclustered (full-range in every partition)."""
    n = 64
    grid = (
        spark.range(n * n)
        .select((F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y"))
    )
    z = zorder_layout(grid, "x", "y", bits=6, num_partitions=16)
    spread = clustering_spread(z, ["x", "y"]).collect()
    assert len(spread) == 16
    avg_xw = sum(r["x_width"] for r in spread) / len(spread)
    avg_yw = sum(r["y_width"] for r in spread) / len(spread)
    # 16 z-partitions over a 64x64 grid -> each covers a ~16x16 tile
    # (allow slack for range-boundary straddling).
    assert avg_xw <= n / 2, avg_xw
    assert avg_yw <= n / 2, avg_yw

    naive = grid.repartitionByRange(16, "x").sortWithinPartitions("x")
    naive_spread = clustering_spread(naive, ["x", "y"]).collect()
    naive_yw = sum(r["y_width"] for r in naive_spread) / len(naive_spread)
    assert naive_yw >= n - 1  # x-sort leaves y full-range everywhere
    assert avg_yw < naive_yw / 2


def test_zorder_layout_single_range_exchange(spark):
    from cloud_dataflow_batch_processing_spark.plans import count_shuffles

    grid = spark.range(100).select(
        (F.col("id") % 10).alias("x"), (F.col("id") / 10).cast("long").alias("y")
    )
    z = zorder_layout(grid, "x", "y", bits=4, num_partitions=4)
    assert count_shuffles(z) == 1
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
