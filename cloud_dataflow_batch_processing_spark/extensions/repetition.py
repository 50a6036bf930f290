"""Gopher repetition-removal rules (Rae et al. 2021, "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", Table A1):
per-document n-gram repetition metrics and the published keep/drop
thresholds — the standard quality gate every large-scale training-data
pipeline applies before mixing.

Metrics (token-based; the corpus documents are single-line token
streams, so the paper's duplicate line/paragraph rules are vacuous
here and scoped out — the n-gram family is the load-bearing set):

- ``top_{2,3,4}gram_frac`` — fraction of document characters covered
  by the single most frequent n-gram (count x n-gram characters /
  total token characters).
- ``dup_{5..10}gram_frac`` — fraction of characters covered by ALL
  n-grams occurring more than once (sum of count x chars over
  duplicated n-grams; overlap makes this an upper bound, exactly as
  the paper notes).
- ``pass_repetition`` — the conjunction of the published thresholds:
  top 2/3/4-gram <= 0.20/0.18/0.16, dup 5..10-gram <=
  0.15/0.14/0.13/0.12/0.11/0.10.

Exactness contract (the driver's cross-engine hash gate): n-gram
identity is the certified rolling-polynomial hash over token hashes
(the same fold as ``span_hashes_sql`` — within-doc hash ties would be
resolved identically by both engines, the precedent set by the
substring-dedup family); every numerator is an exact integer (token
character counts); ties for "most frequent" break by (count DESC,
gram chars DESC) on both engines; one double division per metric at
the end, ROUND(.., 4) like the substring family.

Scale posture (100 TB): per-document metrics need no cross-document
data, so the whole operator is ZERO-shuffle — scan -> one
Arrow-batched UDF pass (prefix-sum char windows, dict counting; O(n x
9) per doc) -> projection. The relational formulation (explode every
n-gram for nine n's) would shuffle 9x the token volume for no reason;
it survives only as the DuckDB oracle, where it certifies the values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from cloud_dataflow_batch_processing_spark.extensions.dedup import token_hashes_sql
from cloud_dataflow_batch_processing_spark.functions.text import (
    HASH_MOD,
    HASH_MULT,
    tokens_sql,
)
from cloud_dataflow_batch_processing_spark.extensions.substring import span_hashes_sql

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)
# Rae et al. 2021 Table A1 (public).
TOP_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}

_NUM_FIELDS = (
    ["n_tokens", "total_chars"]
    + [f"top_{n}gram_chars" for n in TOP_NS]
    + [f"dup_{n}gram_chars" for n in DUP_NS]
)
_NUM_SCHEMA = T.StructType([T.StructField(f, T.LongType()) for f in _NUM_FIELDS])


def _gopher_numerators_series(col):
    """Arrow-batched per-doc integer numerators. Executor-side import
    of the tokenizer twin keeps the fold bit-identical to tokens() /
    token_hashes() (the certified polynomial)."""
    import numpy as np
    import pandas as pd

    from cloud_dataflow_batch_processing_spark.functions.text_fast import (
        _hash_str,
        _toks,
    )

    memo: dict[str, int] = {}

    def per_doc(s):
        if s is None:
            return {f: None for f in _NUM_FIELDS}
        toks = _toks(s)
        m = len(toks)
        th = np.fromiter(
            (_hash_str(t, memo) for t in toks), dtype=np.int64, count=m
        )
        # prefix sums of token char lengths: window chars in O(1)
        pl = np.zeros(m + 1, dtype=np.int64)
        if m:
            np.cumsum(np.fromiter((len(t) for t in toks), np.int64, m), out=pl[1:])
        out = {"n_tokens": m, "total_chars": int(pl[m])}
        for n in TOP_NS + DUP_NS:
            key = (
                f"top_{n}gram_chars" if n in TOP_NS else f"dup_{n}gram_chars"
            )
            w = m - n + 1
            if w <= 0:
                out[key] = 0
                continue
            # Vectorized rolling fold — the same per-step
            # (acc*MULT + th) % MOD arithmetic as the certified scalar
            # fold (HASH_MOD < 2^30, so acc*31 + th < 2^35 fits int64
            # exactly; r11 guide §4 — the per-position Python inner
            # loop was ~10x this cost at identical values).
            acc = th[:w].copy()
            for off in range(1, n):
                acc *= HASH_MULT
                acc += th[off : off + w]
                acc %= HASH_MOD
            gchars = pl[n : n + w] - pl[:w]
            uniq, inv = np.unique(acc, return_inverse=True)
            counts = np.bincount(inv, minlength=len(uniq))
            # hash-tied grams: keep MAX chars (mirrors the oracle's
            # MAX(gchars) GROUP BY)
            gmax = np.zeros(len(uniq), dtype=np.int64)
            np.maximum.at(gmax, inv, gchars)
            if n in TOP_NS:
                mx = counts.max()
                out[key] = int(mx) * int(gmax[counts == mx].max())
            else:
                dup = counts >= 2
                out[key] = int((counts[dup] * gmax[dup]).sum())
        return out

    # explicit column order + empty-batch shape (a bare DataFrame of an
    # empty list has NO columns and fails the Arrow struct conversion)
    return pd.DataFrame(list(col.map(per_doc)), columns=_NUM_FIELDS)


def gopher_repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Gopher repetition report:
    (doc_id, n_tokens, total_chars, top_{2,3,4}gram_frac,
    dup_{5..10}gram_frac, pass_repetition). Zero shuffles at real
    scale; see the fan-out note below."""
    from cloud_dataflow_batch_processing_spark.plans.inspect import fan_out_scan

    # The Arrow pass runs where the scan runs: a corpus read from fewer
    # splits than cores (ONE single-row-group file at bench scale)
    # computes every document on one task. Fan out scan-shaped inputs
    # first — a narrow exchange of raw text that is a no-op at real
    # scale where input splits exceed the core count (the exact
    # substring.py::substring span-stage pattern, incl. the
    # hash-not-round-robin and scan-shaped-only rationale). r11: warm
    # 2.0s single-task -> measured below with 32-way spread (guide §2).
    df = fan_out_scan(df, id_col)
    stats = pandas_udf(_gopher_numerators_series, _NUM_SCHEMA)(F.col(text_col))
    flat = df.select(F.col(id_col).alias("doc_id"), stats.alias("__g")).select(
        "doc_id", "__g.*"
    )
    den = F.nullif(F.col("total_chars"), F.lit(0))
    fracs = flat.select(
        "doc_id",
        "n_tokens",
        "total_chars",
        *[
            F.round(F.col(f"top_{n}gram_chars") / den, 4).alias(f"top_{n}gram_frac")
            for n in TOP_NS
        ],
        *[
            F.round(F.col(f"dup_{n}gram_chars") / den, 4).alias(f"dup_{n}gram_frac")
            for n in DUP_NS
        ],
    )
    passing = None
    for n in TOP_NS:
        c = F.coalesce(F.col(f"top_{n}gram_frac"), F.lit(0)) <= F.lit(
            TOP_THRESHOLDS[n]
        )
        passing = c if passing is None else (passing & c)
    for n in DUP_NS:
        c = F.coalesce(F.col(f"dup_{n}gram_frac"), F.lit(0)) <= F.lit(
            DUP_THRESHOLDS[n]
        )
        passing = passing & c
    return fracs.withColumn("pass_repetition", passing)


def gopher_repetition_sql(source: str = "documents") -> str:
    """DuckDB twin: the relational formulation (explode n-grams per n,
    GROUP BY hash, top-1 / duplicated-sum per doc). Slow by design —
    it exists to certify the Arrow path's values, not to run at scale."""
    gram_ctes = []
    joins = []
    frac_cols = []
    pass_terms = []
    for n in TOP_NS + DUP_NS:
        gram_ctes.append(
            f"""g{n} AS (
      SELECT doc_id,
             unnest({span_hashes_sql(n)}) AS h,
             unnest(list_transform(range(1, len(th) - {n - 1} + 1),
                    i -> list_sum(list_slice(ln, i, i + {n - 1})))) AS gchars
      FROM th_ln WHERE len(th) >= {n}
    ),
    c{n} AS (
      SELECT doc_id, h, COUNT(*) AS cnt, MAX(gchars) AS gchars
      FROM g{n} GROUP BY doc_id, h
    )"""
        )
        if n in TOP_NS:
            gram_ctes.append(
                f"""a{n} AS (
      SELECT doc_id, cnt * gchars AS chars FROM (
        SELECT doc_id, cnt, gchars,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY cnt DESC, gchars DESC, h) AS rn
        FROM c{n}) WHERE rn = 1
    )"""
            )
            col = f"top_{n}gram_frac"
            thr = TOP_THRESHOLDS[n]
        else:
            gram_ctes.append(
                f"""a{n} AS (
      SELECT doc_id, SUM(cnt * gchars) AS chars
      FROM c{n} WHERE cnt >= 2 GROUP BY doc_id
    )"""
            )
            col = f"dup_{n}gram_frac"
            thr = DUP_THRESHOLDS[n]
        joins.append(f"LEFT JOIN a{n} ON b.doc_id = a{n}.doc_id")
        frac_cols.append(
            f"ROUND(CAST(COALESCE(a{n}.chars, 0) AS DOUBLE) / "
            f"nullif(b.total_chars, 0), 4) AS {col}"
        )
        pass_terms.append(f"COALESCE({col}, 0) <= {thr}")
    nl = ",\n    "
    return f"""
    WITH th_ln AS (
      SELECT doc_id, {token_hashes_sql('text')} AS th,
             list_transform({tokens_sql('text')}, x -> length(x)) AS ln
      FROM {source}
    ),
    {nl.join(gram_ctes)},
    b AS (
      -- NULL text propagates NULL (the UDF returns a NULL struct);
      -- an EMPTY token list must be 0, and DuckDB's list_sum([]) is
      -- NULL while the translated aggregate() fold is 0 — the CASE +
      -- COALESCE pins both engines to the UDF's semantics.
      SELECT doc_id, CAST(len(th) AS BIGINT) AS n_tokens,
             CASE WHEN th IS NULL THEN NULL
                  ELSE CAST(COALESCE(list_sum(ln), 0) AS BIGINT) END
               AS total_chars
      FROM th_ln
    )
    SELECT * , ({' AND '.join(pass_terms)}) AS pass_repetition FROM (
      SELECT b.doc_id, b.n_tokens, b.total_chars,
             {nl.join(frac_cols)}
      FROM b {' '.join(joins)}
    )
    """
