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


def ensure_scale_tpch(out_dir: str) -> dict[str, str]:
    """Deterministic sf1-equivalent relational tables for the bench's
    ``queries_heavy`` block (VERDICT r11 #2): lineitem (6M rows — 10x
    sf0.1, the real TPC-H sf1 cardinality), orders (1.5M) and events
    (1M), with the same key-space scaling as the driver tables
    (suppliers 10k, customers 150k, parts 2M key space). Only the
    columns the heavy queries touch are generated — load_tables is
    lazy and the registry fns project, so a partial schema is exactly
    what runs. NumPy + seeded Generator: bytes reproducible run over
    run."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import glob as _glob
    import shutil as _shutil

    os.makedirs(out_dir, exist_ok=True)
    n_li, n_ord, n_ev = 6_000_000, 1_500_000, 1_000_000
    paths = {
        "lineitem": os.path.join(out_dir, "lineitem.parquet"),
        "orders": os.path.join(out_dir, "orders.parquet"),
        "events": os.path.join(out_dir, "events.parquet"),
    }
    want_rows = {"lineitem": n_li, "orders": n_ord, "events": n_ev}

    def _rows_of(p: str) -> int:
        files = sorted(_glob.glob(os.path.join(p, "*.parquet")))
        if not files:
            return -1
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    stale = [t for t, p in paths.items() if _rows_of(p) != want_rows[t]]
    if not stale:
        return paths

    # Each "table.parquet" is a DIRECTORY of 16 part files: Spark's
    # scan split is byte-ranged per file (maxPartitionBytes 128 MB), so
    # a single ~60 MB file would scan — and run every map-side partial
    # aggregation — on ONE task. 16 files give the 8-vs-32-core
    # comparison real scan parallelism (the point of the heavy block).
    n_chunks = 16

    def _write(p: str, table: "pa.Table") -> None:
        tmp = p + ".tmp"
        _shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        n = table.num_rows
        step = (n + n_chunks - 1) // n_chunks
        for i in range(n_chunks):
            chunk = table.slice(i * step, step)
            if chunk.num_rows:
                pq.write_table(chunk, os.path.join(tmp, f"part-{i:03d}.parquet"))
        _shutil.rmtree(p, ignore_errors=True)
        os.replace(tmp, p)

    rng = np.random.default_rng(SEED)
    # orders: o_orderkey dense, o_custkey uniform over the sf1 customer
    # key space (150k).
    o_custkey = rng.integers(0, 150_000, size=n_ord, dtype=np.int64)
    _write(
        paths["orders"],
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
                "o_custkey": pa.array(o_custkey),
            }
        ),
    )
    # lineitem: ~4 lines per order (orderkeys drawn uniformly so the
    # join fan-out varies per key), partkey over 2M, suppkey over 10k.
    l_orderkey = rng.integers(0, n_ord, size=n_li, dtype=np.int64)
    _write(
        paths["lineitem"],
        pa.table(
            {
                "l_orderkey": pa.array(np.sort(l_orderkey)),
                "l_partkey": pa.array(rng.integers(0, 2_000_000, size=n_li, dtype=np.int64)),
                "l_suppkey": pa.array(rng.integers(0, 10_000, size=n_li, dtype=np.int64)),
            }
        ),
    )
    # events: the vcf heavy point derives 10x the registry query's
    # record count from event_id < 40_000; null densities mirror the
    # driver table (value/event_type occasionally NULL — the vcf
    # derivation filters them).
    ev_val = rng.uniform(0, 1000, size=n_ev)
    val_null = rng.random(n_ev) < 0.05
    types = np.array(["click", "view", "purchase"])[
        rng.integers(0, 3, size=n_ev)
    ].astype(object)
    type_null = rng.random(n_ev) < 0.02
    types[type_null] = None
    _write(
        paths["events"],
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
                "user_id": pa.array(rng.integers(0, 50_000, size=n_ev, dtype=np.int64)),
                "value": pa.array(
                    [None if m else float(v) for v, m in zip(ev_val, val_null)],
                    pa.float64(),
                ),
                "event_type": pa.array(types, pa.string()),
            }
        ),
    )
    return paths


if __name__ == "__main__":
    p = ensure_scale_docs(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_data", "sf1_docs")
    )
    print(p)
