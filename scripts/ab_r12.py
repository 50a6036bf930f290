"""Round-12 interleaved A/B harness: REF tree vs current tree on any
registry query list — the same protocol as scripts/ab_r9_r11.py
(NOTES r11: the box drifts +/-25% session to session, so only
SAME-SESSION interleaved subprocess pairs are admissible evidence).

Each measurement is a fresh subprocess JVM running bench.py's own
methodology (table+worker warm-up, N runs per query with the noop
sink, cold = run 1, warm = min of runs 2+, managed caches released
between queries); tree order alternates per cycle so throttle windows
hit both trees equally.

    python scripts/ab_r12.py --ref <commit> --names q1,q2 [--cycles 3]
                             [--runs 3] [--sf-dir DIR] [--out FILE]

The ref tree is checked out into .ab_worktrees/<ref> (git worktree,
ignored; recreated if stale). Raw per-cycle lines land in --out (and
stdout) so the adjudication is replayable (VERDICT r11 #9).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(tree: str, names: list[str], runs_n: int) -> None:
    sys.path.insert(0, tree)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cloud_dataflow_batch_processing_spark.caching import release_managed_caches
    from cloud_dataflow_batch_processing_spark.queries import REGISTRY, queries
    from cloud_dataflow_batch_processing_spark.session import get_spark
    from cloud_dataflow_batch_processing_spark.sources.testdata import load_tables

    spark = get_spark(app_name="cdbp-ab-r12")
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
    for name in names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"ab-r12: {name}")
        runs = []
        for _ in range(runs_n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        release_managed_caches()
        out[name] = {
            "cold": round(runs[0], 4),
            "warm": round(min(runs[1:]) if len(runs) > 1 else runs[0], 4),
            "runs": [round(r, 4) for r in runs],
        }
    print("ABRESULT " + json.dumps(out), flush=True)


def ensure_worktree(ref: str) -> str:
    path = os.path.join(REPO, ".ab_worktrees", ref.replace("/", "_"))
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


def run_child(tree: str, names: list[str], runs_n: int) -> dict:
    env = dict(os.environ)
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--run-child", tree,
         "--names", ",".join(names), "--runs", str(runs_n)],
        capture_output=True, text=True, env=env, cwd=tree, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"child failed rc={p.returncode}\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--ref", default="HEAD")
    ap.add_argument("--names", required=True)
    ap.add_argument("--out", default="")
    ap.add_argument("--run-child", dest="run_child_tree", default=None)
    args = ap.parse_args()
    names = [n.strip() for n in args.names.split(",") if n.strip()]
    if args.run_child_tree:
        child(args.run_child_tree, names, args.runs)
        return
    ref_tree = ensure_worktree(args.ref)
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
            res = run_child(trees[label], names, args.runs)
            results[label].append(res)
            emit(f"cycle {c} {label} ({trees[label]}): "
                 f"{round(time.time() - t0, 1)}s " + json.dumps(res))
    summary = {}
    for q in names:
        summary[q] = {
            lab: {
                "cold": [r[q]["cold"] for r in results[lab]],
                "warm": [r[q]["warm"] for r in results[lab]],
                "warm_min": min(r[q]["warm"] for r in results[lab]),
                "cold_min": min(r[q]["cold"] for r in results[lab]),
                "warm_med": sorted(r[q]["warm"] for r in results[lab])[
                    len(results[lab]) // 2
                ],
                "cold_med": sorted(r[q]["cold"] for r in results[lab])[
                    len(results[lab]) // 2
                ],
            }
            for lab in ("ref", "new")
        }
        summary[q]["warm_speedup_ref_over_new"] = round(
            summary[q]["ref"]["warm_min"] / max(summary[q]["new"]["warm_min"], 1e-9), 3
        )
        summary[q]["cold_speedup_ref_over_new"] = round(
            summary[q]["ref"]["cold_min"] / max(summary[q]["new"]["cold_min"], 1e-9), 3
        )
    emit(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
