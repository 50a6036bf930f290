"""Generate EXPLAINS.md: formatted physical plans for every headline
query at sf0.1 — the artifact for reviewing plan quality (pushdown,
pruning, broadcast choice, shuffle placement) without a cluster.

    python scripts/explain_headlines.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_dataflow_batch_processing_spark.plans import count_shuffles, executed_plan
from cloud_dataflow_batch_processing_spark.queries import REGISTRY, headline_queries, queries
from cloud_dataflow_batch_processing_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cdbp-explains")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# Headline query physical plans (generated; do not edit)",
        "",
        f"Scale: `{sf_dir}`. Review targets: PushedFilters reach the scan,",
        "ReadSchema is pruned, dims broadcast, shuffle count is the",
        "semantic minimum. Regenerate: `python scripts/explain_headlines.py`.",
        "",
    ]
    queries()
    # Non-headline operators whose plan shape is itself the deliverable.
    extra = [
        "asof_join_events",
        "range_join_events",
        "heavy_hitters_countmin",
        "table_fingerprint",
        "snapshot_diff_orders",
        # TPC-H wave: the planner capabilities each exists to exercise
        # (decorrelation, disjunction pushdown, aggregate rewrite).
        "q17_small_quantity_revenue",
        "q19_disjunctive_predicates",
        "q21_waiting_suppliers",
        # round 11: the VCF parse must stay a map-only scan with a
        # broadcast header join; the TV divergence's only exchanges are
        # the (source,token) agg, the vocab rollup, and the token join.
        "vcf_variants_agg",
        "corpus_source_tv_divergence",
        # round 11 session 4: eval span hashes must broadcast; the only
        # exchanges are the per-doc interval merge and stats join; the
        # corpus-side leakage matrix must fetch sources off a
        # materialized narrow pair frame.
        "decontaminate_exact_spans",
        "dedup_cross_source_matrix",
        # zero-shuffle contract: scan -> one Arrow pass -> projection
        "gopher_repetition_filter",
        # one pair-key hash agg + TakeOrderedAndProject
        "bpe_merge_pairs",
        # range shuffle + manifest hash agg; no Window/SinglePartition
        "corpus_shuffle_shard",
        # zero-shuffle codegen projection; no EvalPython anywhere
        "classifier_quality_score",
    ]
    audited = dict(headline_queries())
    audited.update({n: REGISTRY[n].fn for n in extra})
    for name, fn in audited.items():
        df = fn(spark, sf_dir)
        out.append(f"## {name}")
        out.append(f"shuffle exchanges: **{count_shuffles(df)}**")
        out.append("```")
        plan_lines = executed_plan(df).strip().splitlines()
        # Eagerly-cached stage boundaries (materialize_stage) embed each
        # upstream stage's full plan inside every InMemoryRelation they
        # feed, so multi-stage pipelines repeat subtrees combinatorially
        # in toString (corpus_build_full: ~35k lines). The review value
        # is in the top of the final stage — cap the dump and say so.
        cap = 200
        if len(plan_lines) > cap:
            dropped = len(plan_lines) - cap
            plan_lines = plan_lines[:cap] + [
                f"... ({dropped} more lines elided: repeated InMemoryRelation"
                " subtrees from eager stage caches; the executed stages are"
                " cached once each — see tests/test_stage_profile.py for the"
                " pinned per-stage work counts)"
            ]
        out.extend(plan_lines)
        out.append("```")
        out.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXPLAINS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote EXPLAINS.md")


if __name__ == "__main__":
    main()
