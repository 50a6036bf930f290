"""VERDICT r8 #6: measure the bucketed span store against the existing
materialize modes at the substring d2 point (500k → 5M docs), same
session, interleaved — the only valid cross-version timing method on
this box (NOTES r7/r8 adjudications).

Question: r8 named substring d2's super-linear decade (exponent
1.13/1.11) as the dup-hash set outgrowing the 64 MB broadcast, turning
the dup semi-join into an SMJ that exchanges the full 240M-row span
frame on h. The untried lever: persist the span store BUCKETED by h so
the groupBy(h) and the semi-join both inherit the bucket distribution
(plan-verified: exchanges 3 → 1 with broadcast disabled). This script
decides adopt / dead-end with numbers.

    SPARK_GRAFT_DRIVER_MEM=48g python scripts/exp_substring_bucketed.py

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
    from cloud_dataflow_batch_processing_spark.extensions import substring as SUB

    n, sub = POINTS[label]
    spark.conf.set("spark.sql.shuffle.partitions", str(SHUFFLE_PARTITIONS[label]))
    docs = spark.read.parquet(ensure_scale_docs(os.path.join(BASE, sub), n_docs=n))
    scratch = os.path.join(BASE, f"bktexp_ckpt_{label}")
    out: dict[str, dict] = {}
    # Interleave: one full (cold..warm) cycle per mode per round so
    # session-level drift hits every mode equally.
    runs: dict[str, list[float]] = {m: [] for m in MODES}
    for _ in range(n_runs):
        for mode in MODES:
            kw = {} if mode == "cache" else {"materialize": mode, "scratch_dir": scratch}
            t0 = time.perf_counter()
            SUB.substring_dup_stats(docs, **kw).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[mode].append(round(time.perf_counter() - t0, 2))
            release_managed_caches()
            print(f"  {label} {mode} run={runs[mode][-1]}", file=sys.stderr, flush=True)
    for mode in MODES:
        out[mode] = {"cold": runs[mode][0], "warm": min(runs[mode][1:]), "all": runs[mode]}
    return out


def main() -> None:
    spark = get_spark(app_name="cdbp-bktexp")
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
