"""Round 11: scale points for the shuffle-shard rank two-pass.

The operator's 100 TB claim is that the global rank does NOT plan the
naive single-reduce window — it range-partitions by the md5 key and
composes prefix offsets. This measures the full manifest (assign +
per-shard agg) at 5M and 20M docs on the scale corpora, checks the
round-robin ±1 balance invariant at both points, and records wall
times. Run on a quiet box:

    SPARK_GRAFT_DRIVER_MEM=48g python scripts/shard_scale_point.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_dataflow_batch_processing_spark.session import get_spark  # noqa: E402
from scripts.gen_scale_docs import ensure_scale_docs  # noqa: E402
from scripts.scale_curve import BASE  # noqa: E402

POINTS = {"5m": (5_000_000, "sf100_docs", 128), "20m": (20_000_000, "sf400_docs", 256)}
N_SHARDS = 1024


def main() -> None:
    from pyspark.sql import functions as F

    from cloud_dataflow_batch_processing_spark.extensions.shard import (
        shard_stats,
        shuffle_shard_assign,
    )

    spark = get_spark(app_name="cdbp-r11shard")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for label, (n, sub, parts) in POINTS.items():
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        docs = spark.read.parquet(
            ensure_scale_docs(os.path.join(BASE, sub), n_docs=n)
        ).select("doc_id", F.length("text").alias("n_chars"))
        runs = []
        sizes = None
        for _ in range(2):
            t0 = time.perf_counter()
            manifest = shard_stats(
                shuffle_shard_assign(docs, n_shards=N_SHARDS, num_partitions=parts)
            ).collect()
            runs.append(round(time.perf_counter() - t0, 2))
            sizes = [r["n_docs"] for r in manifest]
        balanced = max(sizes) - min(sizes) <= 1
        total = sum(sizes)
        out[label] = {
            "n_docs": n,
            "runs": runs,
            "n_shards": N_SHARDS,
            "balance_ok": balanced,
            "total_ok": total == n,
        }
        print(f"  {label}: runs={runs} balance_ok={balanced}", file=sys.stderr, flush=True)
    print(json.dumps({"op": "corpus_shuffle_shard", "points": out}))


if __name__ == "__main__":
    main()
