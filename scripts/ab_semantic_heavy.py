"""Interleaved A/B for the heavy-bench semantic entry (k=256 over the
20k-vector sf1-equivalent embeddings): REF tree vs current tree, same
protocol as scripts/ab_r12.py (fresh JVM per measurement, alternating
order, cold = run 1, warm = min of runs 2+).

    python scripts/ab_semantic_heavy.py --ref HEAD --cycles 3 [--out F]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(tree: str, runs_n: int) -> None:
    sys.path.insert(0, tree)
    from cloud_dataflow_batch_processing_spark.caching import release_managed_caches
    from cloud_dataflow_batch_processing_spark.extensions import similarity as S
    from cloud_dataflow_batch_processing_spark.session import get_spark

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    spark = get_spark(app_name="ab-semantic-heavy")
    spark.sparkContext.setLogLevel("ERROR")
    _touch = pandas_udf(lambda s: s, "long")
    spark.range(10_000).repartition(
        int(spark.sparkContext.defaultParallelism)
    ).select(_touch(F.col("id"))).write.format("noop").mode("overwrite").save()

    emb = spark.read.parquet(
        os.path.join(REPO, ".bench_data", "sf1_docs", "embeddings.parquet")
    ).filter("vec_id < 20000")
    runs = []
    for _ in range(runs_n):
        t0 = time.perf_counter()
        S.semantic_dedup_stats(
            emb, k=256, iters=2, min_cosine=0.9, assign_method="arrow"
        ).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
        release_managed_caches()
    print("ABRESULT " + json.dumps({
        "cold": round(runs[0], 4),
        "warm": round(min(runs[1:]) if len(runs) > 1 else runs[0], 4),
        "runs": [round(r, 4) for r in runs],
    }), flush=True)


def run_child(tree: str, runs_n: int) -> dict:
    env = dict(os.environ)
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--run-child", tree,
         "--runs", str(runs_n)],
        capture_output=True, text=True, env=env, cwd=tree, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"child rc={p.returncode}\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--ref", default="HEAD")
    ap.add_argument("--out", default="")
    ap.add_argument("--run-child", dest="run_child_tree", default=None)
    args = ap.parse_args()
    if args.run_child_tree:
        child(args.run_child_tree, args.runs)
        return
    ref_tree = os.path.join(REPO, ".ab_worktrees", args.ref.replace("/", "_"))
    subprocess.run(["git", "worktree", "remove", "--force", ref_tree],
                   cwd=REPO, check=False, capture_output=True)
    subprocess.run(["git", "worktree", "add", "--force", "--detach", ref_tree, args.ref],
                   cwd=REPO, check=True)
    trees = {"ref": ref_tree, "new": REPO}
    results: dict[str, list[dict]] = {"ref": [], "new": []}
    lines: list[str] = []

    def emit(s: str) -> None:
        print(s, flush=True)
        lines.append(s)

    for c in range(args.cycles):
        order = ["ref", "new"] if c % 2 == 0 else ["new", "ref"]
        for label in order:
            t0 = time.time()
            res = run_child(trees[label], args.runs)
            results[label].append(res)
            emit(f"cycle {c} {label} ({trees[label]}): "
                 f"{round(time.time() - t0, 1)}s " + json.dumps(res))
    summary = {
        lab: {
            "cold": [r["cold"] for r in results[lab]],
            "warm": [r["warm"] for r in results[lab]],
            "warm_min": min(r["warm"] for r in results[lab]),
            "cold_min": min(r["cold"] for r in results[lab]),
        }
        for lab in ("ref", "new")
    }
    summary["warm_speedup_ref_over_new"] = round(
        summary["ref"]["warm_min"] / max(summary["new"]["warm_min"], 1e-9), 3
    )
    summary["cold_speedup_ref_over_new"] = round(
        summary["ref"]["cold_min"] / max(summary["new"]["cold_min"], 1e-9), 3
    )
    emit(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
