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


def test_zorder_parquet_rowgroup_skipping(spark, tmp_path):
    """End-to-end proof of the layout's purpose: after a z-ordered
    parquet write, row-group min/max stats prune BOTH dimensions,
    while an x-sorted layout cannot prune y at all."""
    import glob

    import pyarrow.parquet as pq

    n = 256
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    zp, np_ = str(tmp_path / "z"), str(tmp_path / "naive")
    zorder_layout(grid, "x", "y", bits=8, num_partitions=16).drop("__z").write.parquet(zp)
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(np_)

    def rg_hit(path, col, lo, hi):
        total = hit = 0
        for f in glob.glob(path + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                idx = [
                    j for j in range(rg.num_columns) if rg.column(j).path_in_schema == col
                ][0]
                st = rg.column(idx).statistics
                total += 1
                if st.min <= hi and st.max >= lo:
                    hit += 1
        return hit, total

    zx, zy = rg_hit(zp, "x", 10, 20), rg_hit(zp, "y", 10, 20)
    nx, ny = rg_hit(np_, "x", 10, 20), rg_hit(np_, "y", 10, 20)
    # x-sort prunes x only; y is unprunable (every row group spans it).
    assert ny[0] == ny[1]
    # z-order prunes BOTH dimensions to a minority of row groups.
    assert zx[0] <= zx[1] // 2, (zx, zy)
    assert zy[0] <= zy[1] // 2, (zx, zy)
