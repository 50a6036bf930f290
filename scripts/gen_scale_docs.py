"""Deterministic sf1-equivalent documents corpus for the scale bench
(VERDICT r3 #4): ~10x the sf0.1 documents table, same distribution
shape (31-word vocab, 10-100 tokens/doc, 5 langs, 20 sources, planted
near-duplicate pairs at ~1% of docs with shingle-Jaccard ~0.95+, plus
a handful of exact duplicates). Written once to
``.bench_data/sf1_docs/documents.parquet`` inside the repo; the
driver's read-only /root/testdata is never touched.

Generation is a seeded ``random.Random`` — bytes are reproducible, so
bench numbers are comparable round over round.
"""

from __future__ import annotations

import os
import random

N_DOCS = 50_000
NEAR_DUP_PAIRS = 250
EXACT_DUP_PAIRS = 40
SEED = 421

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["de", "en", "es", "fr", "zh"]


def _gen_rows(n_docs: int = N_DOCS) -> list[tuple[int, str, str, str, int]]:
    rng = random.Random(SEED)
    # Duplicate counts scale WITH the corpus so a larger n_docs is the
    # same DISTRIBUTION, not a more-dilute one (constant ~0.5% near-dup
    # density — at n_docs=50k these are exactly the historical 250/40,
    # so the default corpus is byte-identical to earlier rounds).
    near_dup_pairs = round(NEAR_DUP_PAIRS * n_docs / N_DOCS)
    exact_dup_pairs = round(EXACT_DUP_PAIRS * n_docs / N_DOCS)
    texts: list[str] = []
    for _ in range(n_docs):
        n_tok = rng.randint(10, 100)
        texts.append(" ".join(rng.choice(VOCAB) for _ in range(n_tok)))
    # Plant near-duplicates: overwrite a later doc with an earlier doc's
    # text mutated in one token (high shingle-Jaccard), and exact dups.
    for i in range(near_dup_pairs):
        src = rng.randrange(0, n_docs // 2)
        dst = rng.randrange(n_docs // 2, n_docs)
        toks = texts[src].split(" ")
        toks[rng.randrange(len(toks))] = rng.choice(VOCAB)
        texts[dst] = " ".join(toks)
    for i in range(exact_dup_pairs):
        src = rng.randrange(0, n_docs // 2)
        dst = rng.randrange(n_docs // 2, n_docs)
        texts[dst] = texts[src]
    return [
        (
            i,
            t,
            LANGS[rng.randrange(len(LANGS))],
            f"src{rng.randrange(20)}",
            len(t),
        )
        for i, t in enumerate(texts)
    ]


def ensure_scale_docs(out_dir: str, n_docs: int = N_DOCS) -> str:
    """Generate the corpus parquet if absent; return the parquet path.
    A cached file is reused only if its row count matches ``n_docs``
    (a stale/partial corpus silently poisoning a measurement is worse
    than a regeneration)."""
    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(path):
        import pyarrow.parquet as pq

        if pq.ParquetFile(path).metadata.num_rows == n_docs:
            return path
        os.remove(path)
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = _gen_rows(n_docs)
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_diverse_docs(
    out_dir: str, n_docs: int, vocab_size: int = 20_000
) -> str:
    """A corpus whose SHINGLE SPACE scales with the vocabulary — for
    corpus-scale tests of stages that are degenerate on the legacy
    31-word corpus. Discovery (r11 certify): with |V|=31 the 3-shingle
    space is 31^3 = 29,791; at 500k docs the 1/97 eval sample already
    emits 29,785 distinct shingles — the ENTIRE space — so
    decontamination's >20%-overlap rule correctly drops every document
    and corpus_build_full returns zero rows. Not an engine bug (the
    DuckDB oracle agrees; parity held) — a corpus-realism bug: real
    corpora grow vocabulary with size (Heaps' law). Here |V|=20k plus
    an 8-word stopword stratum (10% of draws, so the quality filter's
    stopword signal stays realistic); shingle space ~8e12, eval
    coverage ~0. Near/exact duplicates planted at the legacy densities.
    NumPy-vectorized: 5M docs generate in ~2 min instead of ~30."""
    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(path):
        import pyarrow.parquet as pq

        if pq.ParquetFile(path).metadata.num_rows == n_docs:
            return path
        os.remove(path)
    os.makedirs(out_dir, exist_ok=True)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    vocab = np.array([f"w{j}" for j in range(vocab_size)], dtype=object)
    stop = np.array(["the", "a", "of", "and", "to", "in", "is", "it"], dtype=object)
    n_tok = rng.integers(10, 101, size=n_docs)
    total = int(n_tok.sum())
    words = vocab[rng.integers(0, vocab_size, size=total)]
    sw_mask = rng.random(total) < 0.10
    words[sw_mask] = stop[rng.integers(0, len(stop), size=int(sw_mask.sum()))]
    offs = np.concatenate([[0], np.cumsum(n_tok)])
    wl = words.tolist()
    texts = [" ".join(wl[offs[i] : offs[i + 1]]) for i in range(n_docs)]
    py = random.Random(SEED)
    for _ in range(round(NEAR_DUP_PAIRS * n_docs / N_DOCS)):
        src = py.randrange(0, n_docs // 2)
        dst = py.randrange(n_docs // 2, n_docs)
        toks = texts[src].split(" ")
        toks[py.randrange(len(toks))] = f"w{py.randrange(vocab_size)}"
        texts[dst] = " ".join(toks)
    for _ in range(round(EXACT_DUP_PAIRS * n_docs / N_DOCS)):
        src = py.randrange(0, n_docs // 2)
        dst = py.randrange(n_docs // 2, n_docs)
        texts[dst] = texts[src]
    langs = np.array(LANGS, dtype=object)[rng.integers(0, len(LANGS), size=n_docs)]
    sources = np.array(
        [f"src{j}" for j in range(20)], dtype=object
    )[rng.integers(0, 20, size=n_docs)]
    table = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


N_VECS = 50_000
DIM = 64


def ensure_scale_embeddings(out_dir: str) -> str:
    """50k x 64-dim float32 embeddings (25x sf0.1's table) from the
    same LCG family as the repo's hyperplanes — deterministic, mildly
    clustered (8 seed directions + noise) so k-means has structure."""
    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    centers = rng.standard_normal((8, DIM))
    labels = rng.integers(0, 8, size=N_VECS)
    mat = centers[labels] + 0.6 * rng.standard_normal((N_VECS, DIM))
    table = pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(
                [row for row in mat.astype(np.float32).tolist()],
                pa.list_(pa.float32()),
            ),
            "label": pa.array((labels % 8).astype("int32")),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


if __name__ == "__main__":
    p = ensure_scale_docs(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_data", "sf1_docs")
    )
    print(p)
