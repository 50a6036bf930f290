"""Arrow-batched fast twins of the engine-neutral hash functions.

The oracle-checked path in ``functions/text.py`` computes rolling
hashes with higher-order-function Column expressions — interpreted
per element, deliberately, so DuckDB can verify every stage
(NOTES.md trade-off). These pandas_udf twins compute the *identical*
values (same polynomial, same modulus — so the same DuckDB oracles
still apply) but execute in Python with Arrow transfer, a per-batch
token memo, and exact int64 arithmetic:

- per Arrow batch, every *distinct* token/string is hashed once
  (natural-language corpora repeat tokens heavily, so the memo removes
  most of the per-character work the HOF path repeats per occurrence);
- values match ``rolling_hash`` / ``token_hashes`` bit for bit, which
  the unit test and the ``dedup_minhash_pairs_fast`` oracle both pin.

Use whichever side of the trade wins on your data: the HOF path keeps
everything JVM-side (no Python workers, no Arrow hop); this path wins
when documents are long and token repetition is high. bench.py carries
both so the decision is measured, not guessed
(VERDICT r1 "Next round" #5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from cloud_dataflow_batch_processing_spark.functions.text import HASH_MOD, HASH_MULT


def _hash_str(s: str, memo: dict[str, int]) -> int:
    h = memo.get(s)
    if h is None:
        h = 0
        for ch in s:
            h = (h * HASH_MULT + ord(ch)) % HASH_MOD
        memo[s] = h
    return h


# NOTE: the UDFs are built lazily by factory functions (not module-level
# @pandas_udf decorations): the decorator needs an active session when
# it resolves a DDL return type, and executors re-import this module
# while deserializing the UDF — a module-level decoration would then
# fail on the worker. DataType objects + call-time construction keep
# both sides happy.


def _rolling_hash_series(col):
    import pandas as pd  # noqa: F401 — executor-side import

    memo: dict[str, int] = {}
    return col.map(lambda s: None if s is None else _hash_str(s, memo))


def _token_hashes_series(col):
    memo: dict[str, int] = {}

    def per_doc(s):
        if s is None:
            return None
        return [_hash_str(t, memo) for t in s.split()]

    return col.map(per_doc)


def rolling_hash_fast(col: Column) -> Column:
    """Value-identical twin of ``text.rolling_hash`` (same polynomial
    over code points mod 1e9+7), batch-memoized."""
    return pandas_udf(_rolling_hash_series, T.LongType())(col)


def token_hashes_fast(col: Column) -> Column:
    """Value-identical twin of ``dedup.token_hashes``: rolling hash of
    each whitespace token (str.split() ≡ trim + split on \\s+, empty
    string → empty list)."""
    return pandas_udf(_token_hashes_series, T.ArrayType(T.LongType()))(col)
