"""SQL entry façade certification (VERDICT r7 #7).

``cloud_dataflow_batch_processing_spark.sql.sql(spark, query, sf_dir)``
registers the engine tables as temp views and runs any ANSI SQL on
Catalyst. The strongest evidence it is a real SQL surface — not a toy —
is running the registry's own DuckDB oracle strings VERBATIM on the
engine and matching the engine's DataFrame results value-for-value:
for every name in ``VERBATIM_CERTIFIED`` the oracle string is executed
by BOTH DuckDB (the driver's gate does that) and Spark SQL, so the
DataFrame implementation, the Spark SQL dialect, and the DuckDB
dialect all agree on the same bytes.

Names outside this list use DuckDB-specific syntax/functions
(json_extract_string, ``::`` casts, VARCHAR casts, list_* lambdas,
epoch_us); those with an exact mechanical Spark equivalent are covered
by the second tier, ``TRANSLATED_CERTIFIED`` — the oracle string run
through ``sql_dialect.translate_duckdb`` and value-matched against the
DataFrame twin the same way (VERDICT r8 #5). Some translated names
need documented run options (``TRANSLATED_OPTS``, VERDICT r9 #2):

- ``materialize_ctes`` — the 13 quadratic-HOF char-fold pipelines
  whose one-string SQL plan is the measured CollapseProject trap
  (NOTES r3/r8): each CTE (and each nested ``(WITH ...)`` subquery)
  executes behind a localCheckpoint barrier, so Catalyst cannot inline
  a CTE's higher-order-function expression into every downstream
  reference and multiply the work combinatorially.
- ``double_literals`` — the FLOOR-ULP pair (plus corpus_audit_report,
  which embeds the same quality formula): Spark keeps bare decimal
  literals on the exact-decimal arithmetic path while DuckDB promotes
  to DOUBLE; wrapping user literals in CAST(.. AS DOUBLE) puts the
  translated SQL on the twin's double path and the 1e-4 boundary
  drift disappears (certified at sf0.001 AND sf0.01, round 10).

- ``inline_where_aliases`` — corpus_build_full's ``ex`` CTE uses a
  select-list alias in its own WHERE (DuckDB extension); the shim
  inlines the defining expression textually (round 10).

``WITH RECURSIVE`` (the two dedup-cluster names) runs through
``sql.py``'s driver-side fixpoint loop — semantically DuckDB's UNION
DISTINCT recursion — reached via ``materialize_ctes=True``; and DuckDB
list comprehensions / struct literals now translate mechanically
(``substring_dedup_clean``). Since round 11 the tiers cover ALL
137 oracles: the last residue, ``text_normalize_nfc``, certifies via a
registered SQL function — ``register_views`` installs the stdlib-NFC
pandas UDF under DuckDB's name ``nfc_normalize``, a documented session
requirement rather than a string rewrite. (The two roundtrip names'
"reads files outside the façade" exclusion was stale — their ORACLES
read only the registered views, and the r10 shim translates them;
certified at both scales, round 10.)
"""

from __future__ import annotations

import pytest

from cloud_dataflow_batch_processing_spark.queries import REGISTRY, queries
from cloud_dataflow_batch_processing_spark.sql import register_views, sql
from cloud_dataflow_batch_processing_spark.sql_dialect import translate_duckdb
from tests.oracle import compare_frames

queries()

# Certified verbatim-portable oracle strings (discovered by running all
# 136 against Spark SQL at sf0.001; each listed name parsed, executed,
# and value-hash-matched its DataFrame twin). Keep sorted.
VERBATIM_CERTIFIED = [
    "approx_distinct",
    "approx_distinct_hll",
    "approx_distinct_hll_by_type",
    "approx_percentile",
    "approx_quantile_histogram",
    "avro_roundtrip_agg",
    "broadcast_dim_join",
    "combine_fn_udaf",
    "combine_globally",
    "corpus_mix_sample",
    "corpus_mix_temperature",
    "corpus_split_train_val",
    "count_per_element",
    "datastore_mutations_agg",
    "dedup_exact",
    "distinct_values",
    "filter_project",
    "group_count_distinct",
    "group_mean",
    "group_normalize_zscore",
    "grouping_sets_rollup",
    "heavy_hitters_countmin",
    "incremental_rollup_orders",
    "intersect_except",
    "json_roundtrip_agg",
    "kv_swap",
    "multi_table_join_chain",
    "orc_roundtrip_agg",
    "pagerank_supplier_customer",
    "partition_route",
    "pivot_event_matrix",
    "q10_returned_items",
    "q11_important_part_value",
    "q12_priority_lines_by_class",
    "q13_customer_order_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_predicates",
    "q1_pricing_summary",
    "q20_excess_shipped_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customer_balance",
    "q2_min_cost_supplier",
    "q4_order_priority_exists",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "salted_aggregate_lineitem",
    "salted_join_lineitem_orders",
    "sample_deterministic",
    "sample_per_key_deterministic",
    "scalar_subquery_above_avg",
    "scd2_user_event_history",
    "sequential_ids_orders",
    "snapshot_diff_orders",
    "stats_corr_ols_lineitem",
    "table_fingerprint",
    "to_dict_global",
    "top_n_global",
    "top_n_per_key",
    "union_all",
    "union_distinct",
    "unpivot_roundtrip",
    "vcf_variants_agg",
    "window_global",
    "window_rank_analytics",
    "zorder_curve",
]


# Certified through the mechanical DuckDB→Spark translator
# (sql_dialect.translate_duckdb): each translated string parsed,
# executed on Catalyst, and value-hash-matched its DataFrame twin at
# sf0.001 (discovery run, round 9). Keep sorted.
TRANSLATED_CERTIFIED = [
    "ann_brute_topk",
    "ann_ivf_topk",
    "ann_lsh_buckets",
    "ann_lsh_pairs",
    "asof_join_events",
    "bloom_decontaminate",
    "boilerplate_ngrams",
    "bpe_merge_pairs",
    "cdc_merge_orders",
    "classifier_quality_score",
    "cogroup_by_key",
    "corpus_audit_report",
    "corpus_build_full",
    "corpus_clean_pipeline",
    "corpus_shuffle_shard",
    "corpus_source_tv_divergence",
    "decontaminate_eval_overlap",
    "decontaminate_exact_spans",
    "dedup_cross_source_matrix",
    "dedup_duplicate_clusters",
    "dedup_embedding_cosine",
    "dedup_incremental_minhash",
    "dedup_minhash_pairs",
    "dedup_minhash_pairs_fast",
    "dedup_minhash_signature",
    "dedup_near_exact_keep",
    "dedup_ngram_jaccard",
    "dedup_quality_survivor",
    "dedup_segments",
    "dedup_simhash",
    "dq_violation_summary",
    "embedding_normalize_quantize",
    "events_json_extract",
    "flagship_group_sum",
    "flat_map_explode",
    "funnel_signup_click_purchase",
    "fuzzy_match_part_names",
    "gopher_repetition_filter",
    "group_by_key_lists",
    "group_sorted_values",
    "multimodal_decode_features",
    "pack_sequences",
    "percentiles_exact",
    "pii_redact_roundtrip",
    "pii_scrub_stats",
    "q3_shipping_priority",
    "range_join_events",
    "resample_ffill_events",
    "retention_cohorts",
    "rolling_avg_events",
    "semantic_dedup_prune",
    "semantic_kmeans_assign",
    "semantic_kmeans_assign_arrow",
    "sessionize_events",
    "streaming_lsh_dedup",
    "substring_dedup_clean",
    "substring_dedup_incremental",
    "substring_dedup_stats",
    "text_chunks",
    "text_fingerprint",
    "text_lang_id",
    "text_normalize_nfc",
    "text_profile_single_pass",
    "text_quality_filter",
    "text_repetition_ratio",
    "text_token_stats",
    "tfidf_top_terms",
    "tfrecord_roundtrip_agg",
    "token_length_histogram",
    "udtf_split_segments",
    "unigram_lm_quality",
    "vocab_coverage_curve",
    "window_session",
    "window_sliding",
    "window_tumbling",
]

# Documented run options for TRANSLATED names (see module docstring):
# materialize_ctes breaks the CollapseProject trap with checkpoint
# barriers; double_literals puts decimal-literal arithmetic on the
# DOUBLE path DuckDB (and the DataFrame twin) use. Certified with
# exactly these options at sf0.001 and sf0.01, round 10.
_TRAP = {"materialize_ctes": True}
TRANSLATED_OPTS = {
    "bloom_decontaminate": _TRAP,
    "boilerplate_ngrams": _TRAP,
    "corpus_audit_report": {"materialize_ctes": True, "double_literals": True},
    "corpus_build_full": {"materialize_ctes": True, "inline_where_aliases": True},
    "dedup_cross_source_matrix": _TRAP,
    "dedup_duplicate_clusters": _TRAP,
    "dedup_quality_survivor": {"materialize_ctes": True, "double_literals": True},
    "corpus_clean_pipeline": _TRAP,
    "decontaminate_eval_overlap": _TRAP,
    "decontaminate_exact_spans": _TRAP,
    "dedup_embedding_cosine": _TRAP,
    "dedup_incremental_minhash": _TRAP,
    "dedup_minhash_pairs": _TRAP,
    "dedup_minhash_pairs_fast": _TRAP,
    "dedup_near_exact_keep": _TRAP,
    "gopher_repetition_filter": _TRAP,
    "streaming_lsh_dedup": _TRAP,
    "substring_dedup_incremental": _TRAP,
    "substring_dedup_stats": _TRAP,
    "text_profile_single_pass": {"double_literals": True},
    "text_quality_filter": {"double_literals": True},
    "text_repetition_ratio": _TRAP,
}

# Documented DataFrame-only residue, with the exclusion class for
# each — kept exhaustive so every registry oracle is accounted for in
# exactly one tier. EMPTY since round 11: the last residue
# (text_normalize_nfc) certifies now that sql()'s register_views also
# registers the stdlib-NFC pandas UDF under DuckDB's name
# `nfc_normalize` (functions/text_fast.py::register_sql_functions) —
# the oracle string needs no rewriting, only that session function.
NOT_TRANSLATED: dict[str, str] = {}


def test_every_oracle_is_accounted_for():
    """Exhaustiveness: VERBATIM ∪ TRANSLATED ∪ NOT_TRANSLATED covers
    every registry oracle exactly once (a new query must land in a
    tier deliberately, never by omission)."""
    queries()
    with_oracle = {n for n, q in REGISTRY.items() if q.oracle}
    tiers = [set(VERBATIM_CERTIFIED), set(TRANSLATED_CERTIFIED), set(NOT_TRANSLATED)]
    union = set().union(*tiers)
    assert union == with_oracle, (
        f"unaccounted: {sorted(with_oracle - union)}; "
        f"stale: {sorted(union - with_oracle)}"
    )
    assert sum(len(t) for t in tiers) == len(union), "tier overlap"


@pytest.mark.parametrize("name", VERBATIM_CERTIFIED)
def test_oracle_sql_runs_verbatim_on_engine(spark, sf_dir, name):
    q = REGISTRY[name]
    via_sql = sql(spark, q.oracle, sf_dir).toPandas()
    via_df = q.fn(spark, sf_dir).toPandas()
    errs = compare_frames(via_sql, via_df, f"sql_facade:{name}")
    assert not errs, "\n".join(errs)


@pytest.mark.slowsweep
@pytest.mark.parametrize("name", TRANSLATED_CERTIFIED)
def test_oracle_sql_runs_translated_on_engine(spark, sf_dir, name):
    q = REGISTRY[name]
    opts = TRANSLATED_OPTS.get(name, {})
    translated = translate_duckdb(
        q.oracle,
        double_literals=opts.get("double_literals", False),
        inline_where_aliases=opts.get("inline_where_aliases", False),
    )
    via_sql = sql(
        spark,
        translated,
        sf_dir,
        materialize_ctes=opts.get("materialize_ctes", False),
    ).toPandas()
    via_df = q.fn(spark, sf_dir).toPandas()
    errs = compare_frames(via_sql, via_df, f"sql_facade_translated:{name}")
    assert not errs, "\n".join(errs)


def test_translated_opts_subset_of_translated():
    """Every TRANSLATED_OPTS key is a certified TRANSLATED name — an
    option for a name outside the tier is a stale entry."""
    assert set(TRANSLATED_OPTS) <= set(TRANSLATED_CERTIFIED)


def test_register_views_idempotent_and_repointable(spark, sf_dir, tmp_path):
    register_views(spark, sf_dir)
    n1 = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0].n
    register_views(spark, sf_dir)  # idempotent
    assert spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0].n == n1
    assert n1 > 0


def test_sql_facade_duckdb_dialect_param(spark, sf_dir):
    """sql(..., dialect='duckdb') accepts DuckDB-dialect strings."""
    out = sql(
        spark,
        "SELECT l_returnflag, len(['a', 'b']) AS l, COUNT(*) // 2 AS h "
        "FROM lineitem GROUP BY 1",
        sf_dir,
        dialect="duckdb",
    ).collect()
    assert len(out) == 3 and all(r.l == 2 and r.h >= 0 for r in out)
    with pytest.raises(ValueError, match="dialect"):
        sql(spark, "SELECT 1", sf_dir, dialect="postgres")


def test_sql_facade_adhoc_query(spark, sf_dir):
    """The façade is a general SQL surface, not a registry replayer."""
    out = sql(
        spark,
        """
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_totalprice > 0 GROUP BY l_returnflag
        """,
        sf_dir,
    ).collect()
    assert len(out) >= 1 and all(r.n > 0 for r in out)
