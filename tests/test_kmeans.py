"""Independent cross-checks for the k-means / SemDeDup family: the
DuckDB oracle certifies engine parity, these certify the MATH — a
straight numpy re-implementation of Lloyd must reproduce the
assignments, and the semantic-dedup rollup must match a brute-force
within-cluster cosine prune."""

from __future__ import annotations

import numpy as np
import pytest

from cloud_dataflow_batch_processing_spark.extensions import similarity as S


@pytest.fixture(scope="module")
def emb(tables):
    rows = tables["embeddings"].select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _numpy_lloyd(ids, mat, k, iters):
    cents = {int(i): mat[ids == i][0] for i in ids if i < k}

    def assign(cents):
        keys = sorted(cents)
        d2 = np.stack([((mat - cents[c]) ** 2).sum(axis=1) for c in keys], axis=1)
        # argmin with lowest-cid tie-break: argmin returns first minimum,
        # and columns are in ascending cid order.
        return np.array(keys)[np.argmin(d2, axis=1)], d2.min(axis=1)

    for _ in range(iters):
        cids, _ = assign(cents)
        cents = {int(c): mat[cids == c].mean(axis=0) for c in np.unique(cids)}
    return assign(cents)


def test_kmeans_matches_numpy_lloyd(spark, sf_dir, tables, emb):
    ids, mat = emb
    got = {
        r["vec_id"]: (r["cid"], r["dist"])
        for r in S.kmeans_assign(tables["embeddings"], k=8, iters=2).collect()
    }
    want_cid, want_d2 = _numpy_lloyd(ids, mat, 8, 2)
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        cid, dist = got[vid]
        assert cid == want_cid[i], (vid, cid, want_cid[i])
        assert dist == pytest.approx(float(np.sqrt(want_d2[i])), rel=1e-6)


def test_semantic_dedup_matches_brute_force(spark, sf_dir, tables, emb):
    ids, mat = emb
    out = {
        r["cid"]: (r["n_members"], r["n_dropped"], r["n_kept"])
        for r in S.semantic_dedup_stats(
            tables["embeddings"], k=8, iters=2, min_cosine=0.9
        ).collect()
    }
    cids, _ = _numpy_lloyd(ids, mat, 8, 2)
    norms = np.linalg.norm(mat, axis=1)
    total_members = sum(m for m, _, _ in out.values())
    assert total_members == len(ids)
    for cid in np.unique(cids):
        sel = cids == cid
        sub, sub_ids, sub_n = mat[sel], ids[sel], norms[sel]
        cos = (sub @ sub.T) / np.outer(sub_n, sub_n)
        dropped = set()
        for i in range(len(sub_ids)):
            for j in range(len(sub_ids)):
                lo, hi = sub_ids[i], sub_ids[j]
                if lo < hi and round(cos[i, j], 6) >= 0.9:
                    dropped.add(int(hi))
        n_members, n_dropped, n_kept = out[int(cid)]
        assert n_members == int(sel.sum())
        assert n_dropped == len(dropped), (cid, n_dropped, len(dropped))
        assert n_kept == n_members - n_dropped
