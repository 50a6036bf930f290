"""One-shot A/B: corpus_build_full at sf0.1, THIS checkout vs whatever
repo root is passed first on argv — used for same-session interleaved
plan-version attribution (NOTES round 9). Mirrors bench.py's
measurement exactly: session warm-up, 3 noop-write runs, warm = min of
runs 2-3. Prints one JSON line."""

import json
import os
import sys
import time

root = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
sys.path.insert(0, root)

from cloud_dataflow_batch_processing_spark.queries import REGISTRY, queries
from cloud_dataflow_batch_processing_spark.session import get_spark
from cloud_dataflow_batch_processing_spark.sources.testdata import load_tables

queries()
spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
# Session warm-up, same as bench.py — but only tables that exist, so
# the script also runs against the partial sf1-equivalent directory
# (documents + the heavy-block tpch tables, no customer/part/...).
tables = load_tables(spark, sf_dir)
for t in tables:
    if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
        tables[t].count()

fn = REGISTRY["corpus_build_full"].fn
runs = []
for _ in range(3):
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs.append(time.perf_counter() - t0)
print(json.dumps({
    "root": root, "cold": round(runs[0], 4),
    "warm": round(min(runs[1:]), 4), "runs": [round(r, 4) for r in runs],
}))
