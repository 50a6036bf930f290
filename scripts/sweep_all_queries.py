"""Time EVERY registry query at sf0.1 with the noop sink (guide §1.4)
plus plan-shape counters — the optimization round's measurement pass.

For each query: cold = run 1, warm = min of runs 2-3 (bench.py's
protocol), distinct shuffle-exchange count (plans/inspect.py node walk),
and flags for row-at-a-time Python (BatchEvalPython) and nested-loop /
cartesian joins. One JSON line per query to stdout and a summary table
sorted by warm time.

    python scripts/sweep_all_queries.py [--names a,b,c] [--runs 3] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_dataflow_batch_processing_spark.caching import release_managed_caches
from cloud_dataflow_batch_processing_spark.plans import (
    count_plan_nodes,
    count_shuffles,
    executed_plan,
)
from cloud_dataflow_batch_processing_spark.queries import queries
from cloud_dataflow_batch_processing_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cdbp-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    qs = queries()
    if args.names:
        pick = [n.strip() for n in args.names.split(",") if n.strip()]
        qs = {n: qs[n] for n in pick}

    # Same warm-up as bench.py: table listing + python worker pool.
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from cloud_dataflow_batch_processing_spark.sources.testdata import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()
    _touch = pandas_udf(lambda s: s, "long")
    spark.range(10_000).repartition(int(spark.sparkContext.defaultParallelism)).select(
        _touch(F.col("id"))
    ).write.format("noop").mode("overwrite").save()

    rows = []
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        rec: dict = {"name": name}
        try:
            runs = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            df = fn(spark, sf_dir)
            plan = executed_plan(df)
            rec.update(
                cold=round(runs[0], 3),
                warm=round(min(runs[1:]) if len(runs) > 1 else runs[0], 3),
                shuffles=count_shuffles(df),
                # Node-walk counters (plans/inspect.py), NOT string
                # counts: the textual dump re-prints cached lineage per
                # reference (4202 "ArrowEvalPython" where the truth was
                # 5 — VERDICT r10 #3 / ADVICE r11 #3).
                batch_eval_python=count_plan_nodes(df, "BatchEvalPython"),
                arrow_eval_python=count_plan_nodes(df, "ArrowEvalPython"),
                cartesian=("CartesianProduct" in plan)
                or ("BroadcastNestedLoopJoin" in plan),
            )
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            rec["error"] = f"{type(exc).__name__}: {exc}"[:300]
        finally:
            release_managed_caches()
            spark.sparkContext.setJobDescription(None)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    ok = [r for r in rows if "error" not in r]
    ok.sort(key=lambda r: -r["warm"])
    print("\n== slowest warm ==")
    for r in ok[:30]:
        print(
            f"{r['name']:42s} cold={r['cold']:8.3f} warm={r['warm']:8.3f} "
            f"sh={r['shuffles']:3d} bep={r['batch_eval_python']:2d} "
            f"cart={'Y' if r['cartesian'] else 'n'}"
        )
    bad = [r for r in rows if "error" in r]
    if bad:
        print("\n== errors ==")
        for r in bad:
            print(r["name"], r["error"])
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
