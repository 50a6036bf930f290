"""VERDICT r9 #6: A/B the bucketed SIGNATURE store against the existing
minhash materialize modes at 500k and 5M docs, same session,
interleaved — the only valid cross-version timing method on this box
(NOTES r7/r8/r9 adjudications).

Question: the hybrid dedup-fetch-verify plan's two fetch joins
re-exchange the wide signature frame (shingle arrays) on every run. A
signature store bucketed+sorted by __id (mirroring substring.py's span
store) makes both fetches consume the bucket distribution — only the
narrow candidate side co-partitions (plan-verified at sf0.01: zero
shuffle exchanges on the wide side). One-shot cost moves to the
write-side repartition; repeated/incremental dedup amortizes the store.
This script decides adopt / dead-end with numbers.

    SPARK_GRAFT_DRIVER_MEM=48g python scripts/exp_minhash_bucketed.py

Results + decision recorded in NOTES.md.
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
from scripts.scale_curve import BASE, POINTS, SHUFFLE_PARTITIONS  # noqa: E402

MODES = ("cache", "checkpoint", "bucketed")


def run_point(spark, label: str, n_runs: int = 2) -> dict:
    from cloud_dataflow_batch_processing_spark.extensions.dedup import (
        minhash_near_dup_pairs,
    )

    n, sub = POINTS[label]
    spark.conf.set("spark.sql.shuffle.partitions", str(SHUFFLE_PARTITIONS[label]))
    docs = spark.read.parquet(ensure_scale_docs(os.path.join(BASE, sub), n_docs=n))
    scratch = os.path.join(BASE, f"mhbkt_scratch_{label}")
    out: dict[str, dict] = {}
    runs: dict[str, list[float]] = {m: [] for m in MODES}
    counts: dict[str, int] = {}
    for _ in range(n_runs):
        for mode in MODES:
            kw = {"materialize": mode, "scratch_dir": scratch}
            t0 = time.perf_counter()
            counts[mode] = minhash_near_dup_pairs(
                docs, "doc_id", "text", **kw
            ).count()
            runs[mode].append(round(time.perf_counter() - t0, 2))
            release_managed_caches()
            print(
                f"  {label} {mode} run={runs[mode][-1]} pairs={counts[mode]}",
                file=sys.stderr,
                flush=True,
            )
    assert len(set(counts.values())) == 1, f"mode outputs diverge: {counts}"
    for mode in MODES:
        out[mode] = {
            "cold": runs[mode][0],
            "warm": min(runs[mode][1:]),
            "all": runs[mode],
        }
    out["n_pairs"] = next(iter(counts.values()))
    return out


def main() -> None:
    spark = get_spark(app_name="cdbp-mhbkt")
    spark.sparkContext.setLogLevel("ERROR")
    points = {label: run_point(spark, label) for label in ("500k", "5m")}
    exps = {
        f"{m}.{k}": round(math.log10(points["5m"][m][k] / points["500k"][m][k]), 3)
        for m in MODES
        for k in ("cold", "warm")
    }
    print(json.dumps({"points": points, "d2_exponent_log10": exps}))


if __name__ == "__main__":
    main()
