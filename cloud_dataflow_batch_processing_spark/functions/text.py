"""Text-analysis functions: tokenization, language ID, quality scoring,
document fingerprinting (SURVEY.md §2.3 / BASELINE.json north-star).

Design rule: every function here is (a) a JVM-side Column expression —
no Python UDFs in the hot path — and (b) *engine-neutral*: the same
logic is emitted as DuckDB SQL by the ``*_sql`` twins so the driver's
oracle can verify it. That forces deterministic arithmetic (rolling
polynomial hashes mod a prime instead of murmur/xxhash, which differ
across engines).

Scale posture: all expressions are per-row (embarrassingly parallel,
no shuffle); the rolling hash walks each string once via
aggregate(split(...)) inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Rolling-hash modulus (fits in int64 against overflow: acc < 1e9+7,
# acc*31 + 1114111 < 2^63) and multiplier.
HASH_MOD = 1_000_000_007
HASH_MULT = 31

# Small per-language stopword lists for the n-gram/stopword language
# heuristic. Order = precedence on ties.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es": ("el", "los", "las", "y", "es", "un", "una", "en", "por", "para"),
}


# ---------------------------------------------------------------------------
# Tokenization
# ---------------------------------------------------------------------------


def tokens(col: str) -> Column:
    """Whitespace tokens of a trimmed string (empty string → empty array)."""
    return F.when(F.length(F.trim(F.col(col))) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(F.col(col)), r"\s+")
    )


def tokens_sql(col: str) -> str:
    return (
        f"CASE WHEN length(trim({col})) = 0 THEN [] "
        f"ELSE regexp_split_to_array(trim({col}), '\\s+') END"
    )


def token_count(col: str) -> Column:
    return F.size(tokens(col))


def token_count_sql(col: str) -> str:
    return f"len({tokens_sql(col)})"


def bpe_ish_token_count(col: str) -> Column:
    """A BPE-flavored token estimate: word-piece boundaries at
    letter/digit/punct transitions, ~4 chars per piece floor. Stays a
    pure expression: count of regex splits on class transitions plus
    length/4 blend."""
    pieces = F.size(F.split(F.trim(F.col(col)), r"[^A-Za-z0-9]+|(?<=[a-z])(?=[A-Z])"))
    return F.greatest(pieces, (F.length(F.col(col)) / 4).cast("int"))


# ---------------------------------------------------------------------------
# Language ID (stopword-ratio heuristic)
# ---------------------------------------------------------------------------


def _sw_count(toks: Column, words: tuple[str, ...]) -> Column:
    sw = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))


def lang_id(col: str) -> Column:
    """Predicted language = argmax stopword hits with fixed precedence
    (en>de>fr>es), 'und' (undetermined) when no stopwords hit."""
    toks = tokens(col)
    counts = {lang: _sw_count(toks, ws) for lang, ws in STOPWORDS.items()}
    c_en, c_de, c_fr, c_es = (counts[l] for l in ("en", "de", "fr", "es"))
    return (
        F.when((c_en >= c_de) & (c_en >= c_fr) & (c_en >= c_es) & (c_en > 0), "en")
        .when((c_de >= c_fr) & (c_de >= c_es) & (c_de > 0), "de")
        .when((c_fr >= c_es) & (c_fr > 0), "fr")
        .when(c_es > 0, "es")
        .otherwise("und")
    )


def lang_id_sql(col: str) -> str:
    t = tokens_sql(col)

    def cnt(lang: str) -> str:
        words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        return f"len(list_filter({t}, x -> list_contains([{words}], lower(x))))"

    c_en, c_de, c_fr, c_es = cnt("en"), cnt("de"), cnt("fr"), cnt("es")
    return (
        f"CASE WHEN {c_en} >= {c_de} AND {c_en} >= {c_fr} AND {c_en} >= {c_es} AND {c_en} > 0 THEN 'en' "
        f"WHEN {c_de} >= {c_fr} AND {c_de} >= {c_es} AND {c_de} > 0 THEN 'de' "
        f"WHEN {c_fr} >= {c_es} AND {c_fr} > 0 THEN 'fr' "
        f"WHEN {c_es} > 0 THEN 'es' ELSE 'und' END"
    )


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------


def quality_score(col: str) -> Column:
    """Blend of length, punctuation-density, stopword-ratio, and mean
    word length signals in [0,1], rounded to 4 decimals (per-row double
    math — deterministic across engines)."""
    text = F.col(col)
    n = F.length(text).cast("double")
    toks = tokens(col)
    n_tok = F.size(toks).cast("double")
    punct = (n - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))).cast("double")
    sw_hits = _sw_count(toks, STOPWORDS["en"]).cast("double")
    len_score = F.least(n / 500.0, F.lit(1.0))
    punct_ratio = F.when(n > 0, punct / n).otherwise(0.0)
    sw_ratio = F.when(n_tok > 0, sw_hits / n_tok).otherwise(0.0)
    mean_wlen = F.when(n_tok > 0, (n - (n_tok - 1)) / n_tok).otherwise(0.0)
    wlen_score = F.when((mean_wlen >= 3) & (mean_wlen <= 10), 1.0).otherwise(0.5)
    score = (
        0.4 * len_score
        + 0.2 * wlen_score
        + 0.3 * F.least(sw_ratio * 5, F.lit(1.0))
        + 0.1 * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
    )
    # floor(x*1e4 + 0.5)/1e4 instead of round(): Spark's round() rounds
    # the double's shortest decimal repr (BigDecimal.valueOf) while
    # DuckDB rounds the true binary value — they disagree on values
    # like 0.54175. The floor formula is pure IEEE ops, bit-identical
    # in every engine.
    return F.floor(score * 10000 + 0.5) / 10000.0


def quality_score_sql(col: str) -> str:
    t = tokens_sql(col)
    words = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
    FLOOR((
      0.4 * LEAST(length({col}) / 500.0, 1.0)
      + 0.2 * (CASE WHEN len({t}) > 0
                     AND (length({col}) - (len({t}) - 1.0)) / len({t}) >= 3
                     AND (length({col}) - (len({t}) - 1.0)) / len({t}) <= 10
                    THEN 1.0 ELSE 0.5 END)
      + 0.3 * LEAST((CASE WHEN len({t}) > 0
                          THEN len(list_filter({t}, x -> list_contains([{words}], lower(x)))) / CAST(len({t}) AS DOUBLE)
                          ELSE 0.0 END) * 5, 1.0)
      + 0.1 * (1 - LEAST((CASE WHEN length({col}) > 0
                          THEN CAST(length({col}) - length(regexp_replace({col}, '[.,!?;:]', '', 'g')) AS DOUBLE) / length({col})
                          ELSE 0.0 END) * 10, 1.0))
    ) * 10000 + 0.5) / 10000.0
    """.strip()


# ---------------------------------------------------------------------------
# Fingerprinting (rolling polynomial hash)
# ---------------------------------------------------------------------------


def rolling_hash(col_or_expr: Column | str) -> Column:
    """Polynomial rolling hash over UTF-8 code points, mod 1e9+7 —
    deterministic and identical in any engine (unlike murmur3/xxhash64).
    One pass via aggregate(split(...)) in codegen."""
    col = F.col(col_or_expr) if isinstance(col_or_expr, str) else col_or_expr
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * HASH_MULT + F.ascii(ch)) % HASH_MOD,
    )


def rolling_hash_sql(expr: str) -> str:
    # list_reduce starts with the first element; (0*31 + c1) == c1, so a
    # plain reduce equals the 0-seeded fold as long as c1 < MOD.
    return (
        f"CASE WHEN length({expr}) = 0 THEN 0 ELSE list_reduce("
        f"list_transform(range(1, length({expr}) + 1), "
        f"i -> CAST(unicode(substring({expr}, CAST(i AS INT), 1)) AS BIGINT)), "
        f"(acc, c) -> (acc * CAST({HASH_MULT} AS BIGINT) + c) % {HASH_MOD}) END"
    )


def doc_fingerprint(col: str) -> Column:
    """Document fingerprint = rolling hash of the normalized text
    (lowercased, whitespace collapsed)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")
    return rolling_hash(norm)


def doc_fingerprint_sql(col: str) -> str:
    norm = f"regexp_replace(lower(trim({col})), '\\s+', ' ', 'g')"
    return rolling_hash_sql(norm)
