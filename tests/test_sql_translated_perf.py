"""Translated-tier plan/perf ratio gate at sf0.1 (VERDICT r10 #5).

The TRANSLATED façade names are value-certified at sf0.001/sf0.01 and
on the adversarial corpus — but a shim rewrite can silently change the
PLAN while keeping the values (the r9 ASOF correlated-LATERAL spelling
planned as a BroadcastNestedLoopJoin, 455×; the r10 boilerplate_ngrams
twin hit the CollapseProject quadratic). This sweep times every
translated name's SQL spelling (with its certified opts) against its
DataFrame twin at sf0.1, one run each — a DETECTOR, not a rigorous
A/B: it fails only when the SQL path is both >2× the twin AND more
than 2 s absolute slower, so sub-second noise can't trip it, while a
reintroduced quadratic plan (tens of seconds) cannot hide.

Known-slower names are pinned in ``PINNED_RATIO_EXCEPTIONS`` with the
measured cause (NOTES r10/r11): mechanical SQL on Catalyst evaluates
interpreted higher-order char-folds that the twins run as Arrow UDFs —
the translated tier is the COMPATIBILITY surface, the twins are the
production path. A NEW name exceeding the gate means a plan
regression: fix the shim or pin it here with a measured reason.

Opt-in (``-m perfsweep``): ~15-25 min for the full tier.
"""

from __future__ import annotations

import time

import pytest

from cloud_dataflow_batch_processing_spark.caching import release_managed_caches
from cloud_dataflow_batch_processing_spark.queries import REGISTRY, queries
from cloud_dataflow_batch_processing_spark.sql import sql as engine_sql
from cloud_dataflow_batch_processing_spark.sql_dialect import translate_duckdb
from tests.test_sql_facade import TRANSLATED_CERTIFIED, TRANSLATED_OPTS

queries()

SF01 = "/root/testdata/sf0.1"

# name -> measured cause. Every entry must cite the mechanism and the
# round it was measured in; "it's slow" is not a reason. Kept TIGHT:
# entries the r11 sweep showed non-material were removed (notably
# dedup_quality_survivor 1.19x and dedup_duplicate_clusters 1.22x after
# the r11 connected_components rewrite), so a future regression on
# those names trips the gate again. Full r11 ratio table in NOTES.
PINNED_RATIO_EXCEPTIONS = {
    # All one mechanism: the SQL spelling evaluates the interpreted
    # higher-order token/shingle/span-hash char-folds that the twins
    # run as Arrow UDFs (HOFs don't codegen; folds embedding
    # regexp_replace re-run it per element). Compatibility tier.
    "corpus_build_full": "interpreted HOF char-fold SQL vs Arrow twins, 43x (r11 sweep; 42x NOTES r10)",
    "bloom_decontaminate": "interpreted char-fold after barriers, 22x (r11 sweep; 39x NOTES r10)",
    "substring_dedup_stats": "interpreted span-hash fold vs Arrow span store, 2.15x (r11 sweep)",
    "substring_dedup_clean": "interpreted span-hash fold vs Arrow span store, 2.21x (r11 sweep)",
    "substring_dedup_incremental": "interpreted span-hash fold, both batch and store sides, 2.75x (r11 sweep)",
    "decontaminate_eval_overlap": "shingle char-fold on both sides, 2.77x/+1.2s (r11 sweep)",
    "text_fingerprint": "interpreted rolling-hash fold, 23x/+1.6s (r11 sweep; NOTES r10)",
    "text_profile_single_pass": "quality-formula char-fold, 5.3x/+1.7s (r11 sweep)",
    "corpus_clean_pipeline": "char-fold pipeline, 1.5x at r11 but family-bound (NOTES r10)",
    "corpus_audit_report": "same char-fold family, barriered CTEs, 1.85x (r11 sweep)",
}


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


@pytest.mark.perfsweep
def test_translated_tier_ratio_gate(spark):
    rows = []
    failures = []
    for name in TRANSLATED_CERTIFIED:
        q = REGISTRY[name]
        opts = TRANSLATED_OPTS.get(name, {})
        translated = translate_duckdb(
            q.oracle,
            double_literals=opts.get("double_literals", False),
            inline_where_aliases=opts.get("inline_where_aliases", False),
        )
        twin_sec = _timed(lambda: q.fn(spark, SF01))
        release_managed_caches()
        sql_sec = _timed(
            lambda: engine_sql(
                spark,
                translated,
                SF01,
                materialize_ctes=opts.get("materialize_ctes", False),
            )
        )
        release_managed_caches()
        ratio = sql_sec / max(twin_sec, 1e-6)
        rows.append(f"{name}: sql {sql_sec:.2f}s twin {twin_sec:.2f}s ratio {ratio:.2f}")
        material = sql_sec > 2 * twin_sec and sql_sec - twin_sec > 2.0
        if material and name not in PINNED_RATIO_EXCEPTIONS:
            failures.append(rows[-1])
    table = "\n".join(rows)
    print("\nTRANSLATED-TIER RATIO TABLE (sf0.1, 1 run each)\n" + table)
    assert not failures, (
        f"{len(failures)} translated names regressed past the 2x+2s gate "
        f"(fix the shim plan or pin with a measured reason):\n"
        + "\n".join(failures)
        + "\n\nfull table:\n"
        + table
    )


@pytest.mark.perfsweep
def test_pinned_exceptions_are_translated_names():
    stale = set(PINNED_RATIO_EXCEPTIONS) - set(TRANSLATED_CERTIFIED)
    assert not stale, f"pinned exceptions not in the translated tier: {sorted(stale)}"
