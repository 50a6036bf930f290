"""Corpus-trained unigram frequency-class scoring — the distributed
shape of CCNet/Gopher-style LM quality filtering (score every document
by how "typical" its tokens are; drop the tails before training).

A production pipeline scores with a trained KenLM; no LM toolkit ships
in this container, and a float log-probability would not survive the
cross-engine value gate anyway (libm `ln` and float summation order
both differ between engines). So the score here is the INTEGER-EXACT
analog: each token's corpus frequency maps to its frequency class
``floor(log2(count)) = length(bin(count)) - 1`` — a pure integer both
engines compute identically — and a document scores the exact rational
``sum(class) / n_tokens``, rounded once at the end. The *plumbing* is
exactly the LM-filter plumbing (train = one hash-agg over the corpus,
score = explode + join + per-doc agg); swapping the class column for a
real LM's quantized logprob table changes nothing structural.

Scale posture (100 TB):
- Training is ONE hash aggregation: tokens shuffle once on the token
  key with map-side partial counts; the freq table is vocab-sized
  (millions of rows — orders of magnitude below the corpus) and
  counter-sum MERGEABLE, so shards/days train independently and merge
  (same incremental posture as the sketch family).
- Scoring joins exploded tokens to the freq table on ``tok``: AQE
  broadcasts the freq side when it fits, else it's a hash join keyed
  by token — bounded by total token count, never all-pairs.
- No collects, no UDFs — every expression is codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cloud_dataflow_batch_processing_spark.functions.text import tokens, tokens_sql


def unigram_freq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Train: (tok, cnt) corpus frequency table — one hash-agg shuffle.
    Mergeable: counter-sum two tables (any sharding) == training on
    the union, exactly (unit-pinned)."""
    return (
        df.select(F.explode(tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def unigram_freq_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two frequency tables (shard/day increments): counter sum."""
    return a.unionByName(b).groupBy("tok").agg(F.sum("cnt").alias("cnt"))


def freq_class(cnt: F.Column) -> F.Column:
    """floor(log2(cnt)) via the binary-string length — integer-exact in
    both engines (no float log), defined for cnt >= 1."""
    return (F.length(F.bin(cnt)) - 1).cast("long")


def unigram_score(
    df: DataFrame,
    freq: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    unseen_class: int = -1,
) -> DataFrame:
    """Score each document: exact mean frequency class of its tokens
    (ROUND(sum(class)/n, 4) — integer sum and count, one double
    division, so the VALUE is engine-identical). Tokens absent from
    ``freq`` (scoring against a foreign/stale table) take
    ``unseen_class``, one below the rarest real class. Token-less
    documents produce no row (nothing to score — same contract as the
    dedup family's empty-doc handling)."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    classed = freq.select("tok", freq_class(F.col("cnt")).alias("cls"))
    ratio = F.sum(F.coalesce(F.col("cls"), F.lit(unseen_class))) / F.count(F.lit(1))
    return (
        toks.join(classed, "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # floor-quantize, NOT round(): Spark's round() works on the
            # double's shortest decimal repr while DuckDB rounds the
            # true binary value — they disagree on ...5-boundary values
            # (e.g. 0.54175), reachable at realistic doc lengths. Same
            # convention as vocab_coverage / functions/text.py.
            (F.floor(ratio * 10000 + F.lit(0.5)) / 10000.0).alias("lm_score"),
        )
    )


def unigram_score_sql(
    source: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of train-on-corpus + score-corpus (the self-scoring
    shape the registered query uses; every token is seen by
    construction, so the unseen branch is dead here and omitted)."""
    return f"""
    WITH toks AS (
      SELECT {id_col}, unnest({tokens_sql(text_col)}) AS tok FROM {source}
    ),
    freq AS (
      SELECT tok, length(bin(COUNT(*))) - 1 AS cls FROM toks GROUP BY tok
    )
    SELECT t.{id_col},
           COUNT(*) AS n_tokens,
           FLOOR(CAST(SUM(f.cls) AS BIGINT) / COUNT(*) * 10000 + 0.5) / 10000.0 AS lm_score
    FROM toks t JOIN freq f USING (tok)
    GROUP BY t.{id_col}
    """


def vocab_coverage(
    freq: DataFrame,
    top_ks: list[int],
) -> DataFrame:
    """Tokenizer-design metric: for each candidate vocabulary size k,
    the fraction of all corpus TOKEN OCCURRENCES covered by the k most
    frequent types (the curve a team reads before fixing a tokenizer's
    vocab budget). Ranking is deterministic: count desc, token asc on
    ties — both engines order identically, so the coverage VALUES are
    hash-certifiable (integer cumulative sums, one double division).

    Cost: the freq table is vocab-sized (≪ corpus); and the GLOBAL
    rank touches only a BOUNDED candidate set, never the whole vocab
    in one partition. Only ranks ≤ kmax = max(top_ks) can ever join a
    curve point, and any type in the global top-kmax is in the
    top-kmax of whichever hash bucket holds it — so the vocab is
    pre-reduced by a 64-bucket per-bucket top-kmax window (parallel,
    deterministic: bucket = pmod(hash(tok), 64)) and the single-
    partition window runs over ≤ 64·kmax rows regardless of vocab
    size (10⁹ web-corpus types → the same ≤ 64·kmax-row final stage).
    Totals come from a plain hash aggregate, not an unbounded window.

    Empty-corpus contract: an empty ``freq`` yields an EMPTY curve —
    no rank exists for any k, so no row is emitted (not coverage 0.0;
    a curve of 0/0 points would be a fabrication). Unit-pinned."""
    from pyspark.sql import Window

    if not top_ks:
        raise ValueError("top_ks must be non-empty")
    kmax = max(top_ks)
    order = (F.col("cnt").desc(), F.col("tok").asc())

    # Stage 1 (parallel): per-bucket top-kmax. 64 buckets is plenty of
    # parallelism for a vocab-sized table while keeping the candidate
    # set (≤ 64·kmax rows) trivially broadcast/sort-able.
    w_bucket = Window.partitionBy(F.pmod(F.hash("tok"), F.lit(64))).orderBy(*order)
    cand = (
        freq.withColumn("__brank", F.row_number().over(w_bucket))
        .filter(F.col("__brank") <= kmax)
        .drop("__brank")
    )

    # Stage 2 (bounded): global rank + cumulative count over the
    # candidates. For rank ≤ kmax the candidate-set cumsum equals the
    # full-vocab cumsum: every type excluded by stage 1 has ≥ kmax
    # types above it in its own bucket, hence global rank > kmax.
    w_cum = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = cand.select(
        F.row_number().over(Window.orderBy(*order)).alias("rank"),
        F.sum("cnt").over(w_cum).alias("cum_cnt"),
    )

    # Totals via ONE hash aggregate (mergeable, distributed) — not an
    # unbounded-frame window over the vocab.
    totals = freq.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_types")
    )
    from cloud_dataflow_batch_processing_spark.sources.create import local_df

    # Literal JVM frame — the createDataFrame form re-evaluated a
    # 32-slice Python RDD on every action (sources/create.local_df).
    ks = local_df(freq.sparkSession, [(k,) for k in top_ks], "top_k int")
    # A k beyond the vocabulary clamps to the last rank (coverage 1.0)
    # instead of silently dropping the point. Resolving the clamp on
    # the tiny ks × totals side makes the main join an EQUI join
    # (BroadcastHashJoin), not a BNLJ over the ranked frame.
    points = (
        ks.crossJoin(F.broadcast(totals))  # len(top_ks) × 1 row — bounded
        .select(
            "top_k",
            F.least(F.col("top_k").cast("long"), F.col("n_types")).alias("want_rank"),
            "total",
        )
    )
    ratio = F.col("cum_cnt") / F.col("total")
    return ranked.join(F.broadcast(points), ranked.rank == points.want_rank).select(
        "top_k",
        F.col("cum_cnt").alias("covered_tokens"),
        # floor-quantize, NOT round(): Spark's round() works on the
        # double's shortest decimal repr while DuckDB rounds the true
        # binary value — they disagree on e.g. 0.54175 (the same
        # divergence functions/text.py::quality_score documents).
        (F.floor(ratio * 10000 + F.lit(0.5)) / 10000.0).alias("coverage"),
    )


def vocab_coverage_sql(
    source: str,
    text_col: str,
    top_ks: list[int],
) -> str:
    """DuckDB twin of train + :func:`vocab_coverage` over ``source``."""
    ks = ", ".join(f"({k})" for k in top_ks)
    return f"""
    WITH toks AS (
      SELECT unnest({tokens_sql(text_col)}) AS tok FROM {source}
    ),
    freq AS (
      SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
    ),
    ranked AS (
      SELECT tok, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS rank,
             SUM(cnt) OVER (ORDER BY cnt DESC, tok ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cnt,
             SUM(cnt) OVER () AS total,
             COUNT(*) OVER () AS n_types
      FROM freq
    ),
    ks(top_k) AS (VALUES {ks})
    SELECT ks.top_k,
           CAST(r.cum_cnt AS BIGINT) AS covered_tokens,
           FLOOR(CAST(r.cum_cnt AS BIGINT) / CAST(r.total AS BIGINT) * 10000 + 0.5) / 10000.0 AS coverage
    FROM ranked r JOIN ks ON r.rank = LEAST(ks.top_k, r.n_types)
    """


def bpe_merge_pair_counts(
    df: DataFrame, text_col: str = "text", top_k: int = 100
) -> DataFrame:
    """Vocabulary induction, step 1 of BPE/WordPiece training (Sennrich
    et al. 2016): corpus-wide adjacent-token-pair frequencies, top-k
    merge candidates. A tokenizer trainer iterates this count -> pick
    argmax -> re-segment loop; the count is the distributed part (the
    merge-table update is vocab-sized), so this operator IS the scale
    bottleneck of tokenizer training, expressed relationally.

    Shape: per-doc adjacent pairs come from one codegen ``transform``
    over the token array (no self-join of token positions); the count
    is ONE partial/final hash aggregation on the pair key (map-side
    combine absorbs the Zipf head before the shuffle — 'the the' never
    crosses the wire more than once per task); top-k plans as
    TakeOrderedAndProject, never a global sort. Counts are mergeable
    across shards/days like :func:`unigram_freq`.

    Ties break (count DESC, left ASC, right ASC) — a total order, so
    the limit boundary is engine-independent.
    """
    d = df.filter(F.col(text_col).isNotNull()).select(tokens(text_col).alias("t"))
    return (
        _pair_counts_from_arrays(d)
        .orderBy(F.desc("pair_count"), "left_tok", "right_tok")
        .limit(top_k)
    )


def bpe_merge_pairs_sql(
    source: str = "documents", text_col: str = "text", top_k: int = 100
) -> str:
    """DuckDB twin of :func:`bpe_merge_pair_counts` (1-based list
    subscripts; ``range(1, len)`` is end-exclusive = positions of every
    pair's left token)."""
    return f"""
    WITH toks AS (
      SELECT {tokens_sql(text_col)} AS t
      FROM {source} WHERE {text_col} IS NOT NULL
    ),
    idx AS (
      SELECT t, unnest(range(1, len(t))) AS i FROM toks WHERE len(t) >= 2
    ),
    pairs AS (
      SELECT t[i] AS left_tok, t[i + 1] AS right_tok FROM idx
    )
    SELECT left_tok, right_tok, CAST(COUNT(*) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY left_tok, right_tok
    ORDER BY pair_count DESC, left_tok, right_tok
    LIMIT {top_k}
    """


def _pair_counts_from_arrays(d: DataFrame) -> DataFrame:
    """(left_tok, right_tok, pair_count) over a frame with token-array
    column ``t`` — the shared count kernel of
    :func:`bpe_merge_pair_counts` and :func:`bpe_train`."""
    pairs = d.filter(F.size("t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(t[i-1] AS left_tok, t[i] AS right_tok))"
            )
        ).alias("p")
    ).select("p.left_tok", "p.right_tok")
    return pairs.groupBy("left_tok", "right_tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("pair_count")
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    min_count: int = 2,
    sep: str = "\x1e",
    checkpoint_every: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Full BPE merge-table training (Sennrich et al. 2016) over the
    corpus token streams: iterate count -> adopt the most frequent
    pair -> re-segment -> repeat. Returns the learned merge table
    ``[(left, right, count_at_adoption), ...]`` and the final
    segmentation frame (``doc_id``, ``t``) where merged units join
    their parts with ``sep``.

    Semantics pinned by the pure-Python property oracle in
    tests/test_lm.py: adoption tiebreak (count DESC, left ASC, right
    ASC); re-segmentation is leftmost-greedy non-overlapping ('a a a'
    + merge (a,a) -> ['a<sep>a', 'a']); training stops early when the
    best pair's count falls under ``min_count``.

    Scale posture (100 TB): each round is ONE partial/final hash agg
    (the count), a 1-row driver collect (the argmax — vocab-update
    sized, the same bounded-collect contract as the watermark reads),
    and one zero-shuffle Arrow pass (the re-segment, per-doc greedy —
    no cross-doc data). Round state is an eager localCheckpoint every
    ``checkpoint_every`` rounds so the plan never accretes n_merges
    chained UDF layers (the connected-components precedent). Real
    trainers batch many merges per count; the loop adopts one per
    round for exactness — batching changes the constant, not the
    shape.
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    cur = (
        df.filter(F.col(text_col).isNotNull())
        .select("doc_id", tokens(text_col).alias("t"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for rnd in range(n_merges):
        top = (
            _pair_counts_from_arrays(cur)
            .orderBy(F.desc("pair_count"), "left_tok", "right_tok")
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < min_count:
            break
        a, b, cnt = top[0]["left_tok"], top[0]["right_tok"], top[0]["pair_count"]
        merges.append((a, b, int(cnt)))
        joined = f"{a}{sep}{b}"

        def make_apply(_a: str, _b: str, _j: str):
            def apply_merge(col):
                def one(toks):
                    if toks is None:
                        return toks
                    out, i, n = [], 0, len(toks)
                    while i < n:
                        if i + 1 < n and toks[i] == _a and toks[i + 1] == _b:
                            out.append(_j)
                            i += 2
                        else:
                            out.append(toks[i])
                            i += 1
                    return out

                return col.map(one)

            return pandas_udf(apply_merge, T.ArrayType(T.StringType()))

        cur = cur.withColumn("t", make_apply(a, b, joined)("t"))
        if (rnd + 1) % checkpoint_every == 0:
            nxt = cur.localCheckpoint(eager=True)
            cur = nxt
    return merges, cur.localCheckpoint(eager=True)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    sep: str = "\x1e",
    out_col: str = "t",
) -> DataFrame:
    """Tokenizer ENCODE: apply a learned merge table (the
    :func:`bpe_train` output, adoption order) to text — the
    deployment half of the tokenizer pair. Applying the merges in
    adoption order with the same leftmost-greedy semantics reproduces
    the training segmentation exactly on the training corpus
    (unit-pinned), and segments new text the way the trained
    tokenizer would.

    Scale posture (100 TB): ZERO-shuffle — the whole merge table
    ships in the UDF closure (vocab-sized, the same bounded side as a
    broadcast dim) and every document encodes in ONE Arrow pass (the
    per-merge loop runs in-process per batch, not as chained plan
    nodes). NULL text -> NULL tokens.
    """
    import pandas as pd  # noqa: F401 — executor-side import

    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    pairs = [(m[0], m[1], f"{m[0]}{sep}{m[1]}") for m in merges]

    def enc(col):
        def one(text):
            if text is None:
                return None
            toks = text.split()
            for a, b, j in pairs:
                out, i, n = [], 0, len(toks)
                while i < n:
                    if i + 1 < n and toks[i] == a and toks[i + 1] == b:
                        out.append(j)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                toks = out
            return toks

        return col.map(one)

    return df.withColumn(
        out_col, pandas_udf(enc, T.ArrayType(T.StringType()))(text_col)
    )
