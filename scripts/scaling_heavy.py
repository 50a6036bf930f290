"""Core-scaling demonstration at sf1-equivalent scale (VERDICT r11 #6).

The driver's 8-vs-32-core ratios on the sf0.1 headliners are all ≈1
because those queries are sub-second and overhead-bound at that SF.
This script runs the bench's ``queries_heavy`` block (the
sf1-equivalent entries added for VERDICT r11 #2) at BOTH core counts
in alternating fresh-JVM subprocesses — same session shape as
bench.py (tuned session, worker warm-up, median-of-3 noop-sink runs,
caches released per entry) — and reports the 8→32 speedup per entry.

    python scripts/scaling_heavy.py [--cycles 2] [--out FILE]

A ratio ≫1 demonstrates the operator parallelizes with cores at a
scale where there is real work to spread; an entry stuck at ≈1 has a
serial stage.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child() -> None:
    sys.path.insert(0, REPO)
    from cloud_dataflow_batch_processing_spark.queries import queries
    from cloud_dataflow_batch_processing_spark.session import get_spark

    import bench

    queries()  # populate the registry heavy_bench reads
    spark = get_spark(app_name=f"scaling-heavy-c{os.environ['SPARK_GRAFT_CPUS']}")
    spark.sparkContext.setLogLevel("ERROR")
    # Same python-worker warm-up as bench.main so the first pandas-udf
    # entry is not charged the daemon-pool fork.
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    _touch = pandas_udf(lambda s: s, "long")
    spark.range(10_000).repartition(
        int(spark.sparkContext.defaultParallelism)
    ).select(_touch(F.col("id"))).write.format("noop").mode("overwrite").save()

    print("SCALERESULT " + json.dumps(bench.heavy_bench(spark)), flush=True)


def run_child(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--run-child"],
        capture_output=True, text=True, env=env, timeout=3600, cwd=REPO,
    )
    for line in p.stdout.splitlines():
        if line.startswith("SCALERESULT "):
            return json.loads(line[len("SCALERESULT "):])
    raise RuntimeError(f"child rc={p.returncode}\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=2)
    ap.add_argument("--out", default="")
    ap.add_argument("--run-child", action="store_true")
    args = ap.parse_args()
    if args.run_child:
        child()
        return

    results: dict[int, list[dict]] = {8: [], 32: []}
    lines: list[str] = []

    def emit(s: str) -> None:
        print(s, flush=True)
        lines.append(s)

    for c in range(args.cycles):
        order = [8, 32] if c % 2 == 0 else [32, 8]
        for cpus in order:
            t0 = time.time()
            res = run_child(cpus)
            results[cpus].append(res)
            emit(f"cycle {c} cpus={cpus} ({round(time.time() - t0, 1)}s): "
                 + json.dumps(res))

    names = [k for k in results[32][0] if isinstance(results[32][0][k], dict)]
    summary = {}
    for q in names:
        m8 = min(r[q]["median"] for r in results[8])
        m32 = min(r[q]["median"] for r in results[32])
        summary[q] = {
            "c8_median_best": m8,
            "c32_median_best": m32,
            "speedup_32_over_8": round(m8 / max(m32, 1e-9), 2),
        }
    emit(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
