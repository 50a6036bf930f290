"""Dedup query registrations: exact, MinHash-LSH, SimHash, n-gram
Jaccard — every stage oracle-checked thanks to engine-neutral hashing
(extensions/dedup.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cloud_dataflow_batch_processing_spark.extensions import dedup as D
from cloud_dataflow_batch_processing_spark.extensions import sketch as S
from cloud_dataflow_batch_processing_spark.extensions import substring as SUB
from cloud_dataflow_batch_processing_spark.functions.text import (
    doc_fingerprint as fingerprint,
    doc_fingerprint_sql as fingerprint_sql,
    lang_id_sql,
    quality_score_sql,
)
from cloud_dataflow_batch_processing_spark.queries import register
from cloud_dataflow_batch_processing_spark.sources.testdata import load_tables


@register(
    "dedup_exact",
    oracle="""
    SELECT text, CAST(MIN(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: deterministic survivor (min doc_id) per distinct
    text — one hash-aggregate shuffle."""
    d = load_tables(spark, sf_dir)["documents"]
    return D.exact_dedup(d, ["text"], "doc_id")


@register(
    "dedup_minhash_signature",
    oracle=f"""
    WITH th_t AS (
      SELECT doc_id, {D.token_hashes_sql('text')} AS th FROM documents WHERE doc_id < 100
    ),
    sh_t AS (
      SELECT doc_id, {D.shingle_hashes_sql('text')} AS sh FROM th_t
    )
    SELECT doc_id, {D.minhash_signature_sql()}[1] AS mh0,
           {D.minhash_signature_sql()}[2] AS mh1,
           {D.minhash_signature_sql()}[8] AS mh7
    FROM (SELECT doc_id, sh FROM sh_t) s
    """,
    # All 16 lanes are driver-verified end-to-end by the pairs
    # pipeline; the lane spot-check registers late.
    late=True,
)
def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature values (spot-checking 3 of 16 hash lanes
    against the oracle; all 16 drive the pairs query below)."""
    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 100)
    staged = d.select("doc_id", D.token_hashes("text").alias("__th")).select(
        "doc_id", D.shingles_from_token_hashes(F.col("__th")).alias("__shl")
    )
    sig = D.minhash_from_shingles(F.col("__shl"))
    return staged.select("doc_id", sig[0], sig[1], sig[7])


@register(
    "dedup_minhash_pairs",
    oracle=D.minhash_pipeline_sql(threshold=0.8),
    headline=True,
    # The HOF oracle-reference twin of dedup_minhash_pairs_fast (same
    # oracle, bit-identical values); the production-default fast path
    # holds the primary driver row, this one registers late.
    late=True,
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate detection with the pure-Column HOF
    token-hash fold (fast_hashing=False) — the oracle-reference
    variant: shingles → 16-lane signature → 4 LSH bands → bucket
    self-join → exact Jaccard ≥ 0.8. The driver's planted near-dup
    docs (shingle-Jaccard ≈ 0.99) surface here; the oracle recomputes
    the identical pipeline in SQL. Kept in bench so the HOF-vs-Arrow
    trade stays measured at sf0.1 (VERDICT r1 #5 / r2 #4)."""
    d = load_tables(spark, sf_dir)["documents"]
    return D.minhash_near_dup_pairs(d, "doc_id", "text", threshold=0.8, fast_hashing=False)


@register(
    "dedup_minhash_pairs_fast",
    oracle=D.minhash_pipeline_sql(threshold=0.8),
    headline=True,
)
def dedup_minhash_pairs_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production-default MinHash-LSH pipeline: the token-hash
    stage runs as the Arrow-batched pandas_udf twin
    (functions/text_fast.py) — the ``minhash_near_dup_pairs`` default
    since round 3. Values are bit-identical to the HOF fold, so the
    SAME DuckDB oracle verifies this path."""
    d = load_tables(spark, sf_dir)["documents"]
    return D.minhash_near_dup_pairs(d, "doc_id", "text", threshold=0.8, fast_hashing=True)


@register(
    "dedup_simhash",
    # r11: demoted late — the banded near-dup class is carried by the
    # minhash family (pairs/fast/incremental, certified r10) plus
    # ngram_jaccard and embedding_cosine; simhash itself certified
    # r10. Its slot funds classifier_quality_score (a new class:
    # model-based quality filtering).
    late=True,
    oracle=f"""
    WITH th_t AS (
      SELECT doc_id, {D.token_hashes_sql('text')} AS th FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, {D.simhash_sql('text')} AS simhash FROM th_t
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (majority vote over token-hash bits)."""
    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 100)
    return d.select("doc_id", D.token_hashes("text").alias("__th")).select(
        "doc_id", D.simhash_from_token_hashes(F.col("__th")).alias("simhash")
    )


@register(
    "corpus_clean_pipeline",
    oracle=f"""
    WITH dropped AS (
      SELECT DISTINCT doc_b FROM ({D.minhash_pipeline_sql(threshold=0.8)}) p
    ),
    kept AS (
      SELECT * FROM documents
      WHERE {quality_score_sql('text')} >= 0.5
        AND doc_id NOT IN (SELECT doc_b FROM dropped)
    )
    SELECT {lang_id_sql('text')} AS pred_lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM kept GROUP BY pred_lang
    """,
    headline=True,
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data cleaning pipeline in one plan: quality
    scoring → MinHash-LSH near-dup removal (anti-join on the dropped
    side of each pair) → language-ID corpus stats. Every stage is the
    same oracle-checked operator used standalone; this query checks
    their composition. Runs the production defaults (Arrow-batched
    fast_hashing since round 3; Arrow lang-id/quality twins since this
    session — bit-identical to the Column expressions, so the SAME
    oracle verifies, and they halve the per-row expression cost that
    dominated this query's warm profile)."""
    from cloud_dataflow_batch_processing_spark.functions.text_fast import (
        lang_id_fast,
        quality_score_fast,
    )

    d = load_tables(spark, sf_dir)["documents"]
    dropped = (
        D.minhash_near_dup_pairs(d, "doc_id", "text", threshold=0.8)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = d.filter(quality_score_fast(F.col("text")) >= 0.5).join(
        dropped, on="doc_id", how="left_anti"
    )
    return kept.groupBy(lang_id_fast(F.col("text")).alias("pred_lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


from cloud_dataflow_batch_processing_spark.streaming.neardup import (  # noqa: E402
    near_exact_key_sql,
)


@register(
    "dedup_near_exact_keep",
    # The streaming suppressor's key semantics as a deterministic batch
    # twin (streaming/neardup.py); near-exact class variant of
    # dedup_exact — registers late.
    late=True,
    oracle=f"""
    WITH th_t AS (
      SELECT doc_id, text, {D.token_hashes_sql('text')} AS th FROM documents
    ),
    sh_t AS (
      SELECT doc_id, text, {D.shingle_hashes_sql('text')} AS sh FROM th_t
    ),
    keyed AS (
      SELECT doc_id, {near_exact_key_sql()} AS k FROM sh_t
    )
    SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id, COUNT(*) AS n_copies
    FROM keyed GROUP BY k
    """,
)
def dedup_near_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-exact dedup on the FULL 16-lane minhash signature (the
    all-LSH-bands-collide key the streaming suppressor uses,
    streaming/neardup.py): keep the min doc_id per key, count copies.
    Short docs key on their exact text hash in a disjoint key space.
    One hash-aggregate shuffle; certifies the streaming operator's key
    byte-for-byte under the driver gate."""
    from cloud_dataflow_batch_processing_spark.streaming.neardup import (
        with_near_exact_key,
    )

    d = load_tables(spark, sf_dir)["documents"]
    keyed = with_near_exact_key(d, "text", key_col="__key")
    return keyed.groupBy("__key").agg(
        F.min("doc_id").cast("long").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select("keep_id", "n_copies")


@register(
    "dedup_segments",
    oracle=D.segment_dup_stats_sql(),
    # Exact-hash dedup class is driver-carried by `dedup_exact`; this
    # segment-granularity variant registers late.
    late=True,
)
def dedup_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level (line-level) exact dedup: per-document fraction of
    fixed 8-token segments that repeat anywhere in the corpus — the
    CCNet/C4-style boilerplate-line removal signal, computed with ONE
    segment-key shuffle (window count, no join-back). The synthetic
    corpus has no newlines, so token windows stand in for lines (the
    split expression is the only real-text difference)."""
    d = load_tables(spark, sf_dir)["documents"]
    return D.segment_dup_stats(d, "doc_id", "text")


@register(
    "dedup_duplicate_clusters",
    oracle=D.duplicate_clusters_sql(threshold=0.8),
)
def dedup_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: MinHash-LSH near-dup pairs closed
    transitively via iterative connected components (min-label
    propagation + pointer jumping, the MapReduce-CC shape), then one
    canonical survivor per cluster. This is the step between PAIRS and
    SURVIVORS that pair-wise dropping gets wrong (A~B, B~C with A!~C
    must still collapse to one survivor). The oracle replays the
    closure as a recursive CTE over the identical pair pipeline, so
    every per-document component assignment — not just counts — is
    hash-checked."""
    d = load_tables(spark, sf_dir)["documents"]
    return D.duplicate_clusters(d, "doc_id", "text", threshold=0.8)


@register(
    "dedup_ngram_jaccard",
    # r7 window rotation: class long driver-certified (green in
    # CORRECTNESS r02-r06); registers late to free a slot for a
    # class that never saw the driver gate.
    late=True,
    oracle=f"""
    WITH th_t AS (
      SELECT doc_id, {D.token_hashes_sql('text')} AS th FROM documents WHERE doc_id < 40
    ),
    sh_t AS (
      SELECT doc_id, list_distinct({D.shingle_hashes_sql('text')}) AS sh FROM th_t
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
                 / (len(a.sh) + len(b.sh) - len(list_filter(a.sh, x -> list_contains(b.sh, x)))),
                 4) AS jaccard
    FROM sh_t a JOIN sh_t b ON a.doc_id < b.doc_id
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise n-gram (3-token shingle) Jaccard on a small doc
    slice — the brute-force ground truth MinHash approximates."""
    d = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 40)
    sh = (
        d.select("doc_id", D.token_hashes("text").alias("__th"))
        .select("doc_id", D.shingles_from_token_hashes(F.col("__th")).alias("__shl"))
        .select(F.col("doc_id"), F.array_distinct("__shl").alias("sh"))
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.filter(F.col("a.sh"), lambda x: F.array_contains(F.col("b.sh"), x)))
    union = F.size("a.sh") + F.size("b.sh") - inter
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(inter.cast("double") / union, 4).alias("jaccard"),
        )
    )


@register(
    "decontaminate_eval_overlap",
    headline=True,
    oracle=f"""
    WITH th_t AS (
      SELECT doc_id, {D.token_hashes_sql('text')} AS th FROM documents
    ),
    sh_t AS (
      SELECT doc_id, list_distinct({D.shingle_hashes_sql('text')}) AS sh FROM th_t
    ),
    ev AS (
      SELECT DISTINCT unnest(sh) AS h FROM sh_t WHERE doc_id % 97 = 0
    ),
    ex AS (
      SELECT doc_id, len(sh) AS n, unnest(sh) AS h
      FROM sh_t WHERE doc_id % 97 <> 0 AND len(sh) > 0
    ),
    hits AS (
      SELECT doc_id, MAX(n) AS n_shingles, COUNT(*) AS n_overlap
      FROM ex JOIN ev USING (h) GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_overlap AS BIGINT) AS n_overlap,
           ROUND(CAST(n_overlap AS DOUBLE) / n_shingles, 4) AS contamination
    FROM hits
    """,
)
def decontaminate_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the train-set hygiene step every LLM
    pipeline needs (and the reference has no analog for): docs whose
    ``doc_id % 97 == 0`` stand in for a held-out eval set; every other
    document is scored by the fraction of its distinct 3-token shingles
    that appear anywhere in the eval set.

    Scale posture: the eval side of the join is a benchmark suite — a
    few thousand documents against a 100 TB corpus — so its distinct
    shingle set is BROADCAST and the corpus-side explode never
    shuffles; the only exchange is the per-doc overlap count, whose
    map-side partial collapses each doc's hits before the wire. The
    corpus is never self-joined and never leaves its scan partitioning.

    The shingle frame MUST be materialized (managed_cache, same as the
    minhash/simhash pipelines). With a lazy projection, the pushed-down
    ``size(sh) > 0`` / split filters re-embed the whole hash chain into
    the predicate, and inside ``shingles_from_token_hashes``'s lambda
    every ``element_at(th, i)`` then carries the FULL token-hash tree —
    re-evaluated once per shingle per reference, i.e. O(tokens ×
    shingles) per document instead of O(tokens). Measured 117 s vs
    1.2 s at sf0.1 (see NOTES.md round 3)."""
    from cloud_dataflow_batch_processing_spark.caching import managed_cache

    d = load_tables(spark, sf_dir)["documents"]
    staged = managed_cache(
        d.select("doc_id", D.token_hashes("text").alias("__th"))
        .select("doc_id", D.shingles_from_token_hashes(F.col("__th")).alias("__shl"))
        .select("doc_id", F.array_distinct("__shl").alias("sh"))
    )
    ev = (
        staged.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("sh").alias("h"))
        .distinct()
    )
    ex = staged.filter((F.col("doc_id") % 97 != 0) & (F.size("sh") > 0)).select(
        "doc_id", F.size("sh").alias("n"), F.explode("sh").alias("h")
    )
    hits = ex.join(F.broadcast(ev), "h").groupBy("doc_id").agg(
        F.max("n").cast("long").alias("n_shingles"),
        F.count(F.lit(1)).alias("n_overlap"),
    )
    return hits.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        F.round(F.col("n_overlap").cast("double") / F.col("n_shingles"), 4).alias(
            "contamination"
        ),
    )


@register(
    "boilerplate_ngrams",
    oracle=f"""
    WITH th_t AS (
      SELECT doc_id, {D.token_hashes_sql('text')} AS th FROM documents
    ),
    sh_t AS (
      SELECT doc_id, list_distinct({D.shingle_hashes_sql('text')}) AS sh FROM th_t
    ),
    ex AS (SELECT doc_id, unnest(sh) AS h FROM sh_t)
    SELECT h, COUNT(*) AS n_docs
    FROM ex GROUP BY h ORDER BY n_docs DESC, h LIMIT 20
    """,
    # Shares the explode+count+top-k classes with
    # decontaminate_eval_overlap / top_n_global; registers late.
    late=True,
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate n-gram mining (the RefinedWeb/CCNet prefilter): the
    20 most document-frequent 3-token shingles across the corpus —
    shingles appearing in a large fraction of documents are templates/
    navigation chrome to strip before training.

    Plan: per-doc distinct shingles (map-side, one pass), explode, one
    hash-agg shuffle on the shingle key with map-side partials, then
    TakeOrderedAndProject for the bounded top-k — no per-doc state, no
    self-join, order fully deterministic via the (count DESC, h) key.

    Token hashing is the ARROW fast path — NOT because of throughput
    alone: with the interpreted Column fold, CollapseProject inlines
    the whole fold into each of the shingle transform's three ``__th``
    subscripts, re-evaluating it PER SHINGLE INDEX — O(tokens²) per
    doc, measured 84 s vs 2.4 s at sf0.1 (r10 blanket sweep; the
    cached/staged sibling twins never hit this because a cache or
    checkpoint boundary stops the inlining). The Arrow UDF node is
    un-inlinable by construction, so this plan is collapse-proof
    without coupling a one-pass query to cache capacity."""
    from cloud_dataflow_batch_processing_spark.functions.text_fast import (
        token_hashes_fast,
    )

    d = load_tables(spark, sf_dir)["documents"]
    staged = (
        d.select("doc_id", token_hashes_fast(F.col("text")).alias("__th"))
        .select("doc_id", D.shingles_from_token_hashes(F.col("__th")).alias("__shl"))
        .select("doc_id", F.array_distinct("__shl").alias("sh"))
    )
    counts = (
        staged.select(F.explode("sh").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return counts.orderBy(F.desc("n_docs"), F.asc("h")).limit(20)


_BLOOM_M, _BLOOM_K = 4096, 3


@register(
    "bloom_decontaminate",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, {fingerprint_sql('text')} AS fp FROM documents
    ),
    ev AS (
      SELECT DISTINCT fp FROM fp WHERE doc_id % 97 = 0
    ),
    pos AS (
      SELECT DISTINCT unnest({S.bloom_positions_sql('fp', _BLOOM_M, _BLOOM_K)}) AS p
      FROM ev
    ),
    cand AS (
      SELECT doc_id, fp FROM fp WHERE doc_id % 97 <> 0
    ),
    cp AS (
      SELECT doc_id, unnest({S.bloom_positions_sql('fp', _BLOOM_M, _BLOOM_K)}) AS p
      FROM cand
    ),
    hits AS (
      SELECT doc_id, COUNT(*) AS n_set FROM cp JOIN pos USING (p) GROUP BY doc_id
    )
    SELECT c.doc_id,
           COALESCE(h.n_set, 0) = {_BLOOM_K} AS bloom_hit,
           -- NULL fingerprint (NULL text): not a member, FALSE — the
           -- engine's left-join membership flag says false, and a bare
           -- IN returns NULL here (adversarial sweep).
           COALESCE(c.fp IN (SELECT fp FROM ev), FALSE) AS exact_hit
    FROM cand c LEFT JOIN hits h USING (doc_id)
    """,
    # Sketch/approximate class is driver-covered by approx_distinct and
    # approx_percentile; the Bloom probe (exact-value-checkable thanks
    # to engine-neutral hashing) registers late.
    late=True,
)
def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination: eval-set document fingerprints
    (doc_id % 97 == 0, as in decontaminate_eval_overlap) go into a
    4096-bit / 3-hash Bloom filter built driver-side and broadcast;
    every other document is probed with a vectorized O(k) bit test —
    no shuffle, no join on the corpus side. The oracle rebuilds the
    IDENTICAL bit positions in SQL (engine-neutral affine hashes), so
    the driver checks the Bloom verdict — including any false
    positives — value-for-value against the exact membership flag."""
    from cloud_dataflow_batch_processing_spark.caching import managed_cache

    d = load_tables(spark, sf_dir)["documents"]
    fp = managed_cache(d.select("doc_id", fingerprint("text").alias("fp")))
    ev = fp.filter(F.col("doc_id") % 97 == 0).select("fp").distinct()
    bits = S.bloom_from_df(ev, "fp", _BLOOM_M, _BLOOM_K)
    cand = fp.filter(F.col("doc_id") % 97 != 0)
    ev_marked = ev.withColumn("__m", F.lit(1))
    return (
        cand.join(F.broadcast(ev_marked), "fp", "left")
        .select(
            "doc_id",
            S.bloom_might_contain(cand, "fp", bits, _BLOOM_M, _BLOOM_K).alias(
                "bloom_hit"
            ),
            F.col("__m").isNotNull().alias("exact_hit"),
        )
    )


_INCR_SPLIT = 400  # doc_id < 400 = stored corpus; >= 400 = new batch


@register(
    "dedup_incremental_minhash",
    # MinHash-LSH class is driver-carried by `dedup_minhash_pairs_fast`;
    # the incremental (signature-store probe) variant registers late.
    late=True,
    oracle=D.incremental_pipeline_sql(split_id=_INCR_SPLIT, threshold=0.8),
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash-LSH: near-dup pairs involving a NEW batch
    (doc_id >= 400) against the stored corpus signatures (doc_id <
    400) — the daily-increment production loop. Old×old candidates are
    never generated; the old corpus contributes one scan of its
    signature store (extensions/dedup.py::minhash_signatures /
    incremental_near_dups). Unit test pins equivalence with a full
    re-run restricted to pairs touching the batch."""
    d = load_tables(spark, sf_dir)["documents"]
    old_sigs = D.minhash_signatures(d.filter(F.col("doc_id") < _INCR_SPLIT), "doc_id", "text")
    new_sigs = D.minhash_signatures(d.filter(F.col("doc_id") >= _INCR_SPLIT), "doc_id", "text")
    return D.incremental_near_dups(old_sigs, new_sigs, threshold=0.8)


@register(
    "fuzzy_match_part_names",
    # Fuzzy-match class: blocked pair join + integer edit distance;
    # the blocking shape is the LSH-bucket family already driver-carried
    # (dedup_minhash_pairs_fast); registers late.
    late=True,
    oracle="""
    WITH names AS (
      SELECT DISTINCT p_name AS name FROM part
    ),
    blocked AS (
      SELECT name, string_split(name, ' ')[-1] AS block FROM names
      UNION ALL
      SELECT name, string_split(name, ' ')[1] AS block FROM names
    ),
    cand AS (
      SELECT DISTINCT a.name AS name_a, b.name AS name_b
      FROM blocked a JOIN blocked b
        ON a.block = b.block AND a.name < b.name
    )
    SELECT name_a, name_b, CAST(levenshtein(name_a, name_b) AS INT) AS dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 5
    """,
)
def fuzzy_match_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: distinct part names blocked on their last
    AND first tokens (two bounded blocks, pair-level dedup — VERDICT r3
    #6: last-token-only blocking misses pairs differing in their final
    token), scored with integer Levenshtein ≤ 5 — the record-linkage
    shape (block → pair → score) with the same never-all-pairs
    discipline as the LSH dedups. Levenshtein is an exact integer on
    both engines, so the oracle is a value match, and the blocked join
    is a plain equi-join. Impl: extensions/dedup.py::fuzzy_blocked_pairs."""
    p = load_tables(spark, sf_dir)["part"]
    return D.fuzzy_blocked_pairs(p.select(F.col("p_name").alias("name")))


@register(
    "substring_dedup_stats",
    oracle=SUB.substring_dup_stats_sql(),
    headline=True,
)
def substring_dedup_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup (Lee et al. 2022, suffix-array dedup
    re-expressed for distributed execution): every 8-token span hashed
    (rolling polynomial, engine-neutral), spans whose hash occurs >1
    time corpus-wide marked, marked spans merged into maximal removal
    intervals per document (lag-based gaps-and-islands). Per-doc
    report: token counts, interval count, removed/kept tokens,
    removed fraction. ONE shuffle on the span hash (window count, no
    join-back), one narrow per-doc shuffle — the distributed analog of
    the paper's suffix-array pass. Impl:
    extensions/substring.py::substring_dup_stats."""
    d = load_tables(spark, sf_dir)["documents"]
    return SUB.substring_dup_stats(d)


@register(
    "substring_dedup_clean",
    oracle=SUB.substring_dedup_text_sql(),
    # The stats entry drives the operator class through the driver
    # window; the cleaned-text materialization registers late.
    late=True,
)
def substring_dedup_clean_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaned-corpus materialization of exact substring dedup: each
    document's tokens with all duplicated-span removal intervals
    excised and rejoined (the training-corpus output shape of Lee et
    al. 2022). Interval application is a per-row array filter over a
    bounded per-doc interval list — no second corpus shuffle beyond
    the interval computation. Impl:
    extensions/substring.py::substring_dedup_text."""
    d = load_tables(spark, sf_dir)["documents"]
    return SUB.substring_dedup_text(d)


@register(
    "decontaminate_exact_spans",
    oracle=SUB.decontaminate_span_stats_sql(
        corpus_where="doc_id % 97 <> 0", eval_where="doc_id % 97 = 0"
    ),
)
def decontaminate_exact_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring benchmark decontamination (GPT-3 appendix C /
    Lee et al. 2022): documents with ``doc_id % 97 == 0`` stand in for
    a held-out eval set (same split as ``decontaminate_eval_overlap``);
    every 8-token span of a training document whose hash occurs
    anywhere in the eval set is marked and merged into maximal
    contamination intervals; per-doc report over ALL training docs
    (clean docs report zeros). Surgical span-level hygiene — a third
    decontamination mechanism next to the doc-level shingle-overlap
    score and the doc-level bloom drop: a doc quoting one benchmark
    question loses the quote, not the document. Eval span hashes are
    the bounded broadcast side; the corpus never self-joins and the
    only shuffles are the narrow per-doc interval merge and stats.
    Impl: extensions/substring.py::decontaminate_span_stats."""
    d = load_tables(spark, sf_dir)["documents"]
    return SUB.decontaminate_span_stats(
        d.filter(F.col("doc_id") % 97 != 0), d.filter(F.col("doc_id") % 97 == 0)
    )


@register(
    "approx_distinct_hll",
    oracle=f"""
    SELECT o.est AS est_orderkey, p.est AS est_partkey
    FROM ({S.hll_estimate_sql('l_orderkey', 'lineitem')}) o,
         ({S.hll_estimate_sql('l_partkey', 'lineitem')}) p
    """,
    # the approximate-distinct class; this deterministic twin registers
    # r7: promoted into the driver's 50-query window (window rotation
    # — this operator class had only local-oracle coverage before).
)
def approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic engine-mirrored HyperLogLog (extensions/sketch.py):
    unlike ``approx_distinct`` (Spark's opaque HLL++, certified only to
    an error envelope), this sketch's quadratic-mix hash and register
    math are shared SQL strings evaluated by both engines, so the
    ESTIMATE VALUE itself is hash-certified. The register table is one
    hash-agg shuffle collapsing to 256 rows and is register-wise-max
    mergeable across shards/days (unit-pinned), the property that
    makes it the 100 TB incremental-distinct primitive."""
    li = load_tables(spark, sf_dir)["lineitem"]
    eo = S.hll_estimate(S.hll_register_table(li, "l_orderkey")).withColumnRenamed(
        "est", "est_orderkey"
    )
    ep = S.hll_estimate(S.hll_register_table(li, "l_partkey")).withColumnRenamed(
        "est", "est_partkey"
    )
    return eo.crossJoin(ep)


@register(
    "approx_quantile_histogram",
    oracle=f"""
    SELECT a.est AS p50_est, b.est AS p90_est
    FROM ({S.histogram_quantile_sql('o_totalprice', 'orders', 0.5, 0.0, 600000.0, 256)}) a,
         ({S.histogram_quantile_sql('o_totalprice', 'orders', 0.9, 0.0, 600000.0, 256)}) b
    """,
    # approx_percentile (GK envelope) holds the driver slot for the
    # approximate-quantile class; the deterministic mergeable twin
    # registers late.
    late=True,
)
def approx_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mergeable quantile sketch
    (extensions/sketch.py::histogram_*): fixed equi-width bins from
    ARGUMENTS (not data) make build one bounded hash-agg shuffle,
    merge a bin-wise sum, and the interpolated estimate an exact
    double both engines compute identically — so unlike
    approx_percentile's envelope check, the driver hash-certifies the
    VALUE. Completes the sketch quartet (Bloom / CMS / HLL /
    histogram)."""
    o = load_tables(spark, sf_dir)["orders"]
    lo, hi, bins = 0.0, 600000.0, 256
    sk = S.histogram_sketch(o, "o_totalprice", lo, hi, bins)
    p50 = S.histogram_quantile(sk, 0.5, lo, hi, bins).withColumnRenamed("est", "p50_est")
    p90 = S.histogram_quantile(sk, 0.9, lo, hi, bins).withColumnRenamed("est", "p90_est")
    return p50.crossJoin(p90)


@register(
    "corpus_build_full",
    headline=True,
    oracle=f"""
    WITH q1 AS (
      SELECT doc_id, text, source FROM documents
      WHERE doc_id % 97 <> 0 AND {quality_score_sql('text')} >= 0.5
    ),
    q2 AS (
      SELECT d.doc_id, d.text, d.source FROM q1 d
      JOIN (SELECT MIN(doc_id) AS keep_id FROM q1 GROUP BY text) s
        ON d.doc_id = s.keep_id
    ),
    nd AS (
      SELECT DISTINCT doc_b FROM ({D.minhash_pipeline_sql(0.8, 'q2')}) p
    ),
    q3 AS (
      SELECT * FROM q2 WHERE doc_id NOT IN (SELECT doc_b FROM nd)
    ),
    ev AS (
      SELECT DISTINCT unnest(list_distinct({D.shingle_hashes_sql('text')})) AS h
      FROM (SELECT {D.token_hashes_sql('text')} AS th, text FROM documents
            WHERE doc_id % 97 = 0)
    ),
    ex AS (
      SELECT doc_id, len(sh) AS n, unnest(sh) AS h
      FROM (SELECT doc_id, list_distinct({D.shingle_hashes_sql('text')}) AS sh
            FROM (SELECT doc_id, {D.token_hashes_sql('text')} AS th, text FROM q3))
      WHERE n > 0
    ),
    contaminated AS (
      SELECT doc_id FROM ex JOIN ev USING (h)
      GROUP BY doc_id, n HAVING CAST(COUNT(*) AS DOUBLE) / n > 0.2
    ),
    q4 AS (
      SELECT * FROM q3 WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    st AS ({SUB.substring_dup_stats_sql('q4')})
    SELECT q4.source,
           COUNT(*) AS n_docs,
           CAST(SUM(st.kept_tokens) AS BIGINT) AS kept_tokens,
           CAST(SUM(st.removed_tokens) AS BIGINT) AS removed_tokens
    FROM q4 JOIN st USING (doc_id)
    GROUP BY q4.source
    """,
    late=True,
)
def corpus_build_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END training-corpus build — every cleaning stage this
    repo implements, composed in ONE plan and certified by ONE oracle:

      quality filter → exact dedup (min-id survivor) → MinHash-LSH
      near-dup removal → eval-set decontamination (>20% shingle
      overlap dropped) → exact substring dedup → per-source corpus
      stats (docs, kept/removed tokens).

    Each stage is the standalone oracle-checked operator run with its
    production defaults (Arrow fast paths — value-identical to the
    HOF/SQL forms, so the composed DuckDB twin certifies the whole
    chain). Scale posture: the union of each stage's posture — no
    all-pairs joins, eval side broadcast, substring dup-marking one
    hash shuffle; stage boundaries are anti-joins on doc_id (narrow
    keys). The 100 TB submission configuration passes
    ``materialize='bucketed'`` for BOTH stores via :func:`corpus_build`
    (certified end-to-end at 5M docs — tests/test_corpus_scale.py)."""
    return corpus_build(spark, sf_dir)


def corpus_build(
    spark: SparkSession,
    sf_dir: str,
    materialize: str = "cache",
    scratch_dir: str | None = None,
) -> DataFrame:
    """Parameterized corpus build behind ``corpus_build_full``: the
    ``materialize``/``scratch_dir`` knob pair is forwarded to BOTH
    heavy stores (the MinHash signature store and the substring span
    store) so the composed pipeline can run the bench posture
    ('cache', default), the fault-isolation posture ('checkpoint'), or
    the corpus-scale posture ('bucketed' — zero wide re-exchange,
    adopted via the 500k/5M A/Bs, NOTES r10) as ONE configuration."""
    from cloud_dataflow_batch_processing_spark.extensions import substring as _SUB
    from cloud_dataflow_batch_processing_spark.functions.text_fast import (
        quality_th_fast,
    )

    from cloud_dataflow_batch_processing_spark.caching import materialize_stage

    d = load_tables(spark, sf_dir)["documents"]
    # ONE Arrow pass over the corpus text (r12, guide §4): the combined
    # quality+token-hash UDF tokenizes each document once and every
    # later stage consumes the carried `__th` — before, the quality
    # filter ran its own tokenize TWICE (q1 fed both the exact-dedup
    # aggregate and the survivor join, and Catalyst cannot share a UDF
    # subtree across consumers), the signature stage re-tokenized q2,
    # and the substring stage re-tokenized q4: four full UDF passes +
    # a JVM tokens() pass for n_tokens, now one.
    q1 = (
        d.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", "source", "text", quality_th_fast(F.col("text")).alias("__qt"))
        .filter(F.col("__qt.q") >= 0.5)
        .select("doc_id", "source", "text", F.col("__qt.th").alias("__th"))
    )
    # Exact dedup as ONE row_number window (r12, guide §2.4): the old
    # groupBy(text).min(doc_id) + self-join consumed q1 twice (the
    # duplicated quality pass above) and shuffled the corpus twice
    # (agg by text, join back by doc_id). The window keeps the min-id
    # survivor row in one exchange and one pass over a SINGLE q1
    # consumer — identical rows (doc_id is unique, so rank ties are
    # impossible; quality is a pure function of text, so duplicate
    # texts agree on the filter) — and Spark's WindowGroupLimit prunes
    # to the per-group top-1 on the MAP side, so the shuffle carries
    # one candidate per (task, text) like a partial aggregate would.
    # (min_by(struct) was measured first: a struct buffer is not
    # hash-aggregable, so it planned a SortAggregate with a second
    # full local sort.) `text` itself is no longer carried past this
    # point: every downstream stage reads `__th`.
    #
    # Stage boundaries are EAGERLY cached (materialize_stage): each
    # survivor frame feeds several downstream branches (q2 -> near-dup
    # + anti-join; q3 -> shingle probe + q4; q4 -> substring stats
    # base/intervals + final join). Without the materialization the
    # minhash/decontaminate subtrees replicate into every consumer of
    # the final plan — measured 58 s vs 6 s warm at sf0.1. Eager (not
    # lazy .cache()) because a lazily-populated multi-consumer boundary
    # races AQE's cache replacement: byte-identical runs flipped
    # between reusing and re-executing the exact-dedup exchange
    # (work-profile 3 vs 4 shuffles). At 100 TB the same boundaries
    # would be checkpoint writes (the dedup family's materialize knob).
    from pyspark.sql import Window as _W

    q2 = materialize_stage(
        q1.withColumn(
            "__rn",
            F.row_number().over(_W.partitionBy("text").orderBy(F.col("doc_id").asc())),
        )
        .filter(F.col("__rn") == 1)
        .select("doc_id", "source", "__th")
    )
    nd = (
        D.minhash_near_dup_pairs(
            q2, "doc_id", "text", threshold=0.8,
            materialize=materialize, scratch_dir=scratch_dir,
            th_col="__th",
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    q3 = materialize_stage(q2.join(nd, "doc_id", "left_anti"))

    # Arrow token hashes (value-identical twin of the HOF fold — the
    # same fast path minhash_near_dup_pairs defaults to): at 5M docs
    # the interpreted char-fold made THESE two stages the composed
    # build's dominant cost (r11 certify profiling); the stage caches
    # keep the once-per-doc contract either way.
    from cloud_dataflow_batch_processing_spark.functions.text_fast import (
        token_hashes_fast,
    )

    staged_ev = (
        d.filter(F.col("doc_id") % 97 == 0)
        .select(token_hashes_fast(F.col("text")).alias("__th"))
        .select(D.shingles_from_token_hashes(F.col("__th")).alias("__shl"))
        .select(F.explode(F.array_distinct("__shl")).alias("h"))
        .distinct()
    )
    if materialize == "cache":
        # The near-dup stage above cached the q2 signature frame
        # (managed_cache inside minhash_near_dup_pairs); rebuilding the
        # IDENTICAL plan here substitutes that InMemoryRelation
        # (verified: InMemoryTableScan in the executed plan), so the
        # decontamination probe reads __sh from the cache instead of
        # running a THIRD full tokenize+shingle pass over the corpus
        # (r11, guide §2 "shuffle/scan fewer bytes": the signature pass
        # is the dominant corpus-scale cost — NOTES). __sh is exactly
        # array_distinct(shingles(token_hashes(text))), the value this
        # branch computed inline before.
        sigs_cached = D.minhash_signatures(q2, "doc_id", "text", th_col="__th")
        staged_ex = materialize_stage(
            sigs_cached.select(
                F.col("__id").alias("doc_id"), F.col("__sh").alias("sh")
            )
            # Probe ALL q2 signatures, not a q3 semi-join (r12): the
            # q4 anti-join intersects `contaminated` with q3 anyway, so
            # contamination rows for near-dup-dropped docs are inert —
            # identical output, and the q3-id broadcast build (the one
            # AQE-timing-sensitive node in the pinned work profile)
            # drops out of the cached stage.
            .filter(F.size("sh") > 0)
        )
    else:
        # checkpoint/bucketed postures materialize signatures under
        # uuid-tagged paths/tables the plan matcher cannot see; the
        # q3-only recompute stays (strictly less work than rebuilding
        # the full-q2 signature frame on a cache miss) — and with
        # `__th` carried, it is a JVM-only shingle fold: no re-tokenize.
        staged_ex = materialize_stage(
            q3.select(
                "doc_id", D.shingles_from_token_hashes(F.col("__th")).alias("__shl")
            )
            .select("doc_id", F.array_distinct("__shl").alias("sh"))
            .filter(F.size("sh") > 0)
        )
    ex = staged_ex.select("doc_id", F.size("sh").alias("n"), F.explode("sh").alias("h"))
    contaminated = (
        ex.join(F.broadcast(staged_ev), "h")
        .groupBy("doc_id", "n")
        .agg(F.count(F.lit(1)).alias("o"))
        .filter(F.col("o").cast("double") / F.col("n") > 0.2)
        .select("doc_id")
    )
    q4 = materialize_stage(q3.join(contaminated, "doc_id", "left_anti"))
    st = _SUB.substring_dup_stats(
        q4, materialize=materialize, scratch_dir=scratch_dir, th_col="__th"
    )
    return (
        q4.join(st, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept_tokens").alias("kept_tokens"),
            F.sum("removed_tokens").alias("removed_tokens"),
        )
    )


@register(
    "approx_distinct_hll_by_type",
    oracle=S.hll_estimate_by_sql("user_id", "events", ["event_type"]),
    late=True,
)
def approx_distinct_hll_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED deterministic HLL: approx distinct users per event_type
    — the realistic GROUP-BY-approx-distinct shape, in two bounded
    hash aggregations (<= 256 register rows per group; per-group
    estimates value-certified like the global sketch)."""
    e = load_tables(spark, sf_dir)["events"]
    regs = S.hll_register_table_by(e, ["event_type"], "user_id")
    return S.hll_estimate_by(regs, ["event_type"])


@register(
    "corpus_audit_report",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, text, {quality_score_sql('text')} AS quality FROM documents
    ),
    exact_keep AS (
      SELECT MIN(doc_id) AS keep_id, text FROM documents GROUP BY text
    ),
    nd AS (
      SELECT DISTINCT doc_b FROM ({D.minhash_pipeline_sql(0.8)}) p
    ),
    sh_t AS (
      SELECT doc_id, list_distinct({D.shingle_hashes_sql('text')}) AS sh
      FROM (SELECT doc_id, {D.token_hashes_sql('text')} AS th, text FROM documents)
    ),
    ev AS (
      SELECT DISTINCT unnest(sh) AS h FROM sh_t WHERE doc_id % 97 = 0
    ),
    contam AS (
      SELECT doc_id, ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(n), 4) AS contamination
      FROM (
        SELECT doc_id, len(sh) AS n, unnest(sh) AS h FROM sh_t
        WHERE doc_id % 97 <> 0 AND len(sh) > 0
      ) e JOIN ev USING (h)
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           ROUND(q.quality, 4) AS quality,
           {lang_id_sql('d.text')} AS pred_lang,
           (ek.keep_id <> d.doc_id) AS is_exact_dup,
           (nd.doc_b IS NOT NULL) AS is_near_dup,
           COALESCE(c.contamination, 0.0) AS contamination,
           CASE
             WHEN d.doc_id % 97 = 0 THEN 'eval'
             WHEN ROUND(q.quality, 4) < 0.5 THEN 'drop_low_quality'
             WHEN ek.keep_id <> d.doc_id THEN 'drop_exact_dup'
             WHEN nd.doc_b IS NOT NULL THEN 'drop_near_dup'
             WHEN COALESCE(c.contamination, 0.0) > 0.2 THEN 'drop_contaminated'
             ELSE 'keep'
           END AS verdict
    FROM documents d
    JOIN q ON d.doc_id = q.doc_id
    JOIN exact_keep ek ON d.text = ek.text
    LEFT JOIN nd ON d.doc_id = nd.doc_b
    LEFT JOIN contam c ON d.doc_id = c.doc_id
    """,
    late=True,
)
def corpus_audit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document corpus AUDIT: every hygiene signal this engine
    computes — quality score, language, exact-dup flag, near-dup flag,
    eval-set contamination — plus the prioritized keep/drop verdict
    with its REASON. The explainability twin of corpus_build_full
    (that query emits the cleaned corpus; this one emits WHY each
    document survived or didn't — the report a data-curation team
    actually reviews). Signals reuse the certified operators; the
    composed oracle certifies the whole report row-for-row."""
    from cloud_dataflow_batch_processing_spark.caching import managed_cache
    from cloud_dataflow_batch_processing_spark.functions.text_fast import (
        lang_id_fast,
        quality_score_fast,
    )

    d = load_tables(spark, sf_dir)["documents"]
    base = d.select("doc_id", "text")
    exact_keep = base.groupBy("text").agg(F.min("doc_id").alias("keep_id"))
    nd = (
        D.minhash_near_dup_pairs(d, "doc_id", "text", threshold=0.8)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("__nd", F.lit(True))
    )
    # r11 (guide §4/§2): the near-dup stage above caches the signature
    # frame over the same `d` (minhash_near_dup_pairs builds it through
    # minhash_signatures); the IDENTICAL plan here resolves to that
    # InMemoryRelation, so the audit's shingle sets come from the cache
    # instead of a SECOND tokenize pass — and the old spelling's
    # interpreted HOF fold (token_hashes) drops out entirely. __sh is
    # exactly array_distinct(shingles(token_hashes(text))).
    staged = managed_cache(
        D.minhash_signatures(d, "doc_id", "text").select(
            F.col("__id").alias("doc_id"), F.col("__sh").alias("sh")
        )
    )
    ev = (
        staged.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("sh").alias("h"))
        .distinct()
    )
    contam = (
        staged.filter((F.col("doc_id") % 97 != 0) & (F.size("sh") > 0))
        .select("doc_id", F.size("sh").alias("n"), F.explode("sh").alias("h"))
        .join(F.broadcast(ev), "h")
        .groupBy("doc_id")
        .agg(F.round(F.count(F.lit(1)).cast("double") / F.max("n"), 4).alias("contamination"))
    )
    out = (
        base.withColumn("quality", F.round(quality_score_fast(F.col("text")), 4))
        .withColumn("pred_lang", lang_id_fast(F.col("text")))
        .join(exact_keep, "text")
        .join(nd, "doc_id", "left")
        .join(contam, "doc_id", "left")
    )
    contamination = F.coalesce("contamination", F.lit(0.0))
    return out.select(
        "doc_id",
        "quality",
        "pred_lang",
        (F.col("keep_id") != F.col("doc_id")).alias("is_exact_dup"),
        F.coalesce("__nd", F.lit(False)).alias("is_near_dup"),
        contamination.alias("contamination"),
        F.when(F.col("doc_id") % 97 == 0, "eval")
        .when(F.col("quality") < 0.5, "drop_low_quality")
        .when(F.col("keep_id") != F.col("doc_id"), "drop_exact_dup")
        .when(F.col("__nd").isNotNull(), "drop_near_dup")
        .when(contamination > 0.2, "drop_contaminated")
        .otherwise("keep")
        .alias("verdict"),
    )


@register(
    "substring_dedup_incremental",
    oracle=SUB.incremental_substring_stats_sql(
        "doc_id % 5 = 0", "doc_id % 5 <> 0"
    ),
    late=True,
)
def substring_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental substring dedup (extensions/substring.py): a NEW
    batch (doc_id % 5 == 0) audited against the persisted span-hash
    STORE of the existing corpus — the old corpus is never rescanned;
    a new span is duplicated iff it's in the store or repeats within
    the batch (provably equal to the full-corpus run restricted to the
    batch — unit-pinned). The daily-increment member of the substring
    family, mirroring dedup_incremental_minhash / ivf_index_append."""
    d = load_tables(spark, sf_dir)["documents"]
    old = d.filter(F.col("doc_id") % 5 != 0)
    new = d.filter(F.col("doc_id") % 5 == 0)
    store = SUB.span_store(old)
    return SUB.incremental_substring_dup_stats(new, store)


@register(
    "dedup_quality_survivor",
    # r7: promoted into the driver's 50-query window (window rotation
    # — this operator class had only local-oracle coverage before).
    oracle=f"""
    SELECT c.doc_id, c.component_id, c.cluster_size,
           {quality_score_sql('d.text')} AS quality,
           (ROW_NUMBER() OVER (
              PARTITION BY c.component_id
              ORDER BY {quality_score_sql('d.text')} DESC, c.doc_id ASC
            ) = 1) AS keep
    FROM ({D.duplicate_clusters_sql(threshold=0.8)}) c
    JOIN documents d ON c.doc_id = d.doc_id
    """,
)
def dedup_quality_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup survivor selection by QUALITY instead of min-id: within
    each duplicate cluster keep the highest-quality document (score
    desc, doc_id asc tiebreak; quality_score is already floor-quantized
    to 4 decimals — no extra rounding) — the wrinkle real corpus
    pipelines add over `dedup_duplicate_clusters`' positional
    canonical (a scraped mirror often has the cleaner copy under the
    LATER id). The cluster table joins to the corpus FIRST so the
    multi-regex quality expression evaluates on cluster members only
    (a small fraction of the corpus), then one window per component."""
    from pyspark.sql import Window

    from cloud_dataflow_batch_processing_spark.functions.text import quality_score

    d = load_tables(spark, sf_dir)["documents"]
    cl = D.duplicate_clusters(d, "doc_id", "text", threshold=0.8)
    j = cl.join(d.select("doc_id", "text"), "doc_id").withColumn(
        "quality", quality_score("text")
    )
    w = Window.partitionBy("component_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return j.select(
        "doc_id",
        "component_id",
        "cluster_size",
        "quality",
        (F.row_number().over(w) == 1).alias("keep"),
    )


@register(
    "dedup_cross_source_matrix",
    # New round-11 audit composition over driver-covered stages
    # (minhash pairs: dedup_minhash_pairs_fast; relational audit:
    # corpus_audit_report) — registers late, leads DRIVER_WINDOW for
    # first-exposure certification (never-certified-first rule).
    late=True,
    oracle=f"""
    WITH pairs AS ({D.minhash_pipeline_sql(threshold=0.8)}),
    m AS (
      SELECT least(da.source, db.source) AS source_a,
             greatest(da.source, db.source) AS source_b,
             p.jaccard
      FROM pairs p
      JOIN documents da ON p.doc_a = da.doc_id
      JOIN documents db ON p.doc_b = db.doc_id
    )
    SELECT source_a, source_b,
           COUNT(*) AS n_pairs,
           CAST(SUM(CAST(ROUND(jaccard * 10000, 0) AS BIGINT)) AS BIGINT)
             AS sum_jaccard_bp,
           MAX(jaccard) AS max_jaccard
    FROM m GROUP BY source_a, source_b
    """,
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-duplicate leakage matrix: MinHash-LSH pairs
    (threshold 0.8) attributed to the unordered (source, source) pair
    of the two documents — the audit a mixture designer runs before
    setting per-source sampling weights (a source whose rows duplicate
    ANOTHER source contributes less novel text than its token count
    suggests; the diagonal is intra-source redundancy). Aggregates are
    exact: pair counts plus the jaccard sum in integer basis points
    (jaccard is already ROUND(·,4), so ×10000 is integral — no float
    summation-order hazard in the driver hash), and MAX over rounded
    doubles.

    Scale posture: the pair frame is bounded by the near-dup rate (≪
    corpus) and feeds TWO join branches, so it is materialized once
    (``materialize_stage`` — without the eager cache the second
    broadcast build re-executes the whole LSH pipeline; measured 46 s
    vs 11 s at sf0.1) and both source-fetch joins broadcast it —
    documents is scanned twice but only as the narrow (doc_id, source)
    projection, and the wide shingle/text columns never shuffle; the
    final groupBy keys on source×source (tiny). Parity: Beam would
    spell this as the CoGroupByKey of the pair PCollection with a
    doc→source side input (beam/transforms/util.py CoGroupByKey); here
    the LSH pipeline and the audit rollup stay one Catalyst plan."""
    from cloud_dataflow_batch_processing_spark.caching import materialize_stage

    d = load_tables(spark, sf_dir)["documents"]
    # materialize=None (r12, VERDICT r11 #7): the pair frame is
    # consumed exactly once — into the eager stage cache right here —
    # so the pipeline's internal cache posture (signature + bands
    # caches, built for repeated/multi-consumer use) is pure overhead
    # in this query; the None posture serves the self-join's two sides
    # from ONE shuffle write via ReuseExchange and runs the hash
    # pipeline once into this cache.
    pairs = materialize_stage(
        D.minhash_near_dup_pairs(d, "doc_id", "text", threshold=0.8, materialize=None)
    )
    src = d.select("doc_id", "source")
    sa = src.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("__sa")
    )
    sb = src.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("__sb")
    )
    withs_a = sa.join(F.broadcast(pairs), "doc_a")
    j = sb.join(F.broadcast(withs_a), "doc_b")
    return (
        j.select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.round(F.col("jaccard") * 10000, 0).cast("long"))
            .cast("long")
            .alias("sum_jaccard_bp"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )
