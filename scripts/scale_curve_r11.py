"""Round 11: a FOURTH scale decade for the MINHASH bucketed signature
store — the same extension SCALE_CURVE_r10 gave the substring span
store.

The r10 adoption of materialize='bucketed' for minhash rests on the
500k/5M interleaved A/B (scripts/exp_minhash_bucketed.py). This
measures 5M → 20M docs (4×, 0.6 decade — the biggest point the
single-process generator + 48g driver budget accommodates) in bucketed
mode, with the 5M point re-measured in the SAME session so the
exponent is drift-free. Exponent = log(t20/t5) / log(4).

    SPARK_GRAFT_DRIVER_MEM=48g python scripts/scale_curve_r11.py

Output: one JSON line; recorded as SCALE_CURVE_r11.json + NOTES.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_dataflow_batch_processing_spark.caching import release_managed_caches  # noqa: E402
from cloud_dataflow_batch_processing_spark.session import get_spark  # noqa: E402
from scripts.gen_scale_docs import ensure_scale_docs  # noqa: E402
from scripts.scale_curve import BASE  # noqa: E402

POINTS = {
    "5m": (5_000_000, "sf100_docs", 128),
    "20m": (20_000_000, "sf400_docs", 256),
}


def run_point(spark, label: str, n_runs: int = 2) -> dict:
    from cloud_dataflow_batch_processing_spark.extensions.dedup import (
        minhash_near_dup_pairs,
    )

    n, sub, parts = POINTS[label]
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    docs = spark.read.parquet(ensure_scale_docs(os.path.join(BASE, sub), n_docs=n))
    scratch = os.path.join(BASE, f"r11curve_scratch_{label}")
    runs: list[float] = []
    n_pairs = None
    for _ in range(n_runs):
        t0 = time.perf_counter()
        n_pairs = minhash_near_dup_pairs(
            docs, "doc_id", "text", materialize="bucketed", scratch_dir=scratch
        ).count()
        runs.append(round(time.perf_counter() - t0, 2))
        release_managed_caches()
        print(
            f"  {label} bucketed run={runs[-1]} pairs={n_pairs}",
            file=sys.stderr,
            flush=True,
        )
    return {"cold": runs[0], "warm": min(runs[1:]), "all": runs, "n_pairs": n_pairs}


def main() -> None:
    spark = get_spark(app_name="cdbp-r11curve")
    spark.sparkContext.setLogLevel("ERROR")
    points = {label: run_point(spark, label) for label in ("5m", "20m")}
    ratio = 20_000_000 / 5_000_000
    exps = {
        k: round(math.log(points["20m"][k] / points["5m"][k]) / math.log(ratio), 3)
        for k in ("cold", "warm")
    }
    print(
        json.dumps(
            {
                "op": "minhash_near_dup_pairs",
                "mode": "bucketed",
                "points": points,
                "exponent_5m_20m": exps,
            }
        )
    )


if __name__ == "__main__":
    main()
