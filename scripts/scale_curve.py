"""One-off scaling-curve measurement (round 5): the three heaviest
corpus operators at 50k AND 500k documents (sf1- and sf10-equivalent),
same deterministic generator, warm + cold wall-clock, plus the naive
scaling exponent log10(t_500k/t_50k) — direct evidence for the
"would this still work at 100×" question the 100 TB posture makes.

Not part of bench.py: the 500k corpus takes minutes to generate and
the DuckDB oracle at that size would dominate the driver's per-round
budget. Run by hand; results recorded in NOTES.md.

    python scripts/scale_curve.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_dataflow_batch_processing_spark.session import get_spark  # noqa: E402
from scripts.gen_scale_docs import ensure_scale_docs  # noqa: E402

BASE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_data")


def run_point(
    spark,
    path: str,
    scratch: str,
    only: tuple[str, ...] | None = None,
    n_runs: int = 3,
) -> dict[str, dict]:
    from pyspark.sql import functions as F

    from cloud_dataflow_batch_processing_spark.caching import release_managed_caches
    from cloud_dataflow_batch_processing_spark.extensions import dedup as D
    from cloud_dataflow_batch_processing_spark.extensions import substring as SUB
    from cloud_dataflow_batch_processing_spark.functions.text_fast import (
        lang_id_fast,
        quality_score_fast,
    )

    docs = spark.read.parquet(path)

    def dedup_q():
        return D.minhash_near_dup_pairs(
            docs, "doc_id", "text", threshold=0.8,
            materialize="checkpoint", scratch_dir=scratch,
        )

    def clean_q():
        dropped = dedup_q().select(F.col("doc_b").alias("doc_id")).distinct()
        kept = docs.filter(quality_score_fast(F.col("text")) >= 0.5).join(
            dropped, on="doc_id", how="left_anti"
        )
        return kept.groupBy(lang_id_fast(F.col("text")).alias("pred_lang")).agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars")
        )

    def substring_q():
        return SUB.substring_dup_stats(docs)

    out: dict[str, dict] = {"n_docs": {"value": docs.count()}}
    for name, q in (
        ("dedup_minhash_pairs_fast", dedup_q),
        ("substring_dedup_stats", substring_q),
        ("corpus_clean_pipeline", clean_q),
    ):
        if only is not None and name not in only:
            continue
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            q().write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        release_managed_caches()
        out[name] = {"cold": round(runs[0], 2), "warm": round(min(runs[1:]), 2)}
    return out


POINTS = {
    "50k": (50_000, "sf1_docs"),
    "500k": (500_000, "sf10_docs"),
    # Third decade (VERDICT r6 #8): 5M docs = sf100-equivalent, run to
    # pin corpus_clean_pipeline's exponent after the verify-then-dedup
    # reorder removed its super-linear wide shuffle.
    "5m": (5_000_000, "sf100_docs"),
}

# Shuffle partitions grow with the data — the same sizing a real
# cluster submit does, and the contract the minhash fetch joins'
# shuffle-hash hint documents ("bounded at 100 TB by sizing P"): the
# per-task hash build is |corpus|/P rows, so holding P at the local
# default while the corpus grows 100x would concentrate 2 x 5M/32
# wide rows per task (measured: Java heap OOM at the 5M point).
SHUFFLE_PARTITIONS = {"50k": 32, "500k": 64, "5m": 128}


def main(labels: list[str] | None = None) -> None:
    labels = labels or ["50k", "500k"]
    spark = get_spark(app_name="cdbp-scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    points = {}
    for label in labels:
        n, sub = POINTS[label]
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(SHUFFLE_PARTITIONS[label])
        )
        t0 = time.perf_counter()
        path = ensure_scale_docs(os.path.join(BASE, sub), n_docs=n)
        gen_sec = round(time.perf_counter() - t0, 1)
        # The third decade runs every query but with one cold + one
        # warm run (a 5M cold run is minutes each; round 7 gated this
        # to corpus_clean_pipeline, round 8 extended it to the two
        # heavy-shuffle dedup headliners per VERDICT r7 #4).
        only = None
        points[label] = run_point(
            spark,
            path,
            os.path.join(BASE, f"curve_ckpt_{label}"),
            only=only,
            n_runs=2 if label == "5m" else 3,
        )
        points[label]["gen_sec"] = gen_sec
    exps = {}
    for lo, hi, decade in (("50k", "500k", ""), ("500k", "5m", ".x10")):
        if lo not in points or hi not in points:
            continue
        for q in ("dedup_minhash_pairs_fast", "substring_dedup_stats", "corpus_clean_pipeline"):
            if q not in points[lo] or q not in points[hi]:
                continue
            for mode in ("cold", "warm"):
                r = points[hi][q][mode] / points[lo][q][mode]
                exps[f"{q}.{mode}{decade}"] = round(math.log10(r), 3)  # 1.0 == linear
    print(json.dumps({"points": points, "scaling_exponent_log10": exps}))


if __name__ == "__main__":
    main(sys.argv[1:] or None)
