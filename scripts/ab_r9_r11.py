"""Interleaved A/B: r9 tree vs current tree on the BENCH_r10-regressed
headline queries (VERDICT r10 #2).

BENCH_r10 regressed vs r9 (warm: substring_dedup_stats 1.84x,
q1_pricing_summary 1.44x, flagship_group_sum 1.50x, corpus_build_full
1.19x) but none of those queries' source changed in r10 — the evidence
pointed at session/environment drift. This script adjudicates it the
way the NOTES discipline demands: SAME-SESSION interleaving of the two
TREES, each measurement in a fresh subprocess JVM (bench.py's own
protocol: table+worker warm-up, 3 runs per query, cold = run 1, warm =
min of runs), tree order alternated per cycle so slow-environment
windows hit both trees equally.

    python scripts/ab_r9_r11.py [--cycles 3] [--ref <r9-commit>]

The r9 tree is checked out into .ab_worktrees/r9 (git worktree,
ignored; removed and re-added if stale).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES = [
    "flagship_group_sum",
    "q1_pricing_summary",
    "substring_dedup_stats",
    "corpus_build_full",
]


def child(tree: str) -> None:
    sys.path.insert(0, tree)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cloud_dataflow_batch_processing_spark.caching import release_managed_caches
    from cloud_dataflow_batch_processing_spark.queries import REGISTRY, queries
    from cloud_dataflow_batch_processing_spark.session import get_spark
    from cloud_dataflow_batch_processing_spark.sources.testdata import load_tables

    spark = get_spark(app_name="cdbp-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for df in load_tables(spark, sf_dir).values():
        df.count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    _touch = pandas_udf(lambda s: s, "long")
    spark.range(10_000).repartition(
        int(spark.sparkContext.defaultParallelism)
    ).select(_touch(F.col("id"))).write.format("noop").mode("overwrite").save()

    queries()
    out: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        release_managed_caches()
        out[name] = {"cold": round(runs[0], 4), "warm": round(min(runs[1:]), 4)}
    print("ABRESULT " + json.dumps(out), flush=True)


def ensure_worktree(ref: str) -> str:
    path = os.path.join(REPO, ".ab_worktrees", "r9")
    if os.path.isdir(path):
        subprocess.run(
            ["git", "worktree", "remove", "--force", path], cwd=REPO, check=False,
            capture_output=True,
        )
    subprocess.run(
        ["git", "worktree", "add", "--force", "--detach", path, ref],
        cwd=REPO, check=True,
    )
    return path


def run_child(tree: str) -> dict:
    env = dict(os.environ)
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--run-child", tree],
        capture_output=True, text=True, env=env, cwd=tree, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"child failed rc={p.returncode}\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=3)
    ap.add_argument("--ref", default="64a9c0b")  # round-9 artifact commit
    ap.add_argument("--run-child", dest="run_child_tree", default=None)
    args = ap.parse_args()
    if args.run_child_tree:
        child(args.run_child_tree)
        return
    r9 = ensure_worktree(args.ref)
    trees = {"r9": r9, "r11": REPO}
    results: dict[str, list[dict]] = {"r9": [], "r11": []}
    for c in range(args.cycles):
        order = ["r9", "r11"] if c % 2 == 0 else ["r11", "r9"]
        for label in order:
            t0 = time.time()
            res = run_child(trees[label])
            results[label].append(res)
            print(f"cycle {c} {label}: {round(time.time() - t0, 1)}s "
                  + json.dumps(res), flush=True)
    summary = {}
    for q in QUERIES:
        summary[q] = {
            lab: {
                "cold": [r[q]["cold"] for r in results[lab]],
                "warm": [r[q]["warm"] for r in results[lab]],
                "warm_min": min(r[q]["warm"] for r in results[lab]),
                "cold_min": min(r[q]["cold"] for r in results[lab]),
            }
            for lab in ("r9", "r11")
        }
        summary[q]["warm_ratio_r11_over_r9"] = round(
            summary[q]["r11"]["warm_min"] / summary[q]["r9"]["warm_min"], 3
        )
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
