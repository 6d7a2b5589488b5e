"""Similarity-search tests: brute-force top-k vs a numpy reference,
IVF recall vs the exact answer."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rsmetacheck_ray.functions import similarity as sim


def _corpus(n=200, d=16, seed=3):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, d))
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in mat],
                                  pa.list_(pa.float32())),
        }
    )
    return t, mat


def _reference_topk(mat, queries, k):
    qu = queries / np.linalg.norm(queries, axis=1)[:, None]
    # float32 storage round-trip to match what the Dataset holds
    mu = mat.astype(np.float32).astype(np.float64)
    mu = mu / np.linalg.norm(mu, axis=1)[:, None]
    cos = qu @ mu.T
    out = {}
    for qi in range(len(queries)):
        order = np.lexsort((np.arange(mat.shape[0]), -cos[qi]))[:k]
        out[qi] = list(order)
    return out


def test_knn_bruteforce_matches_reference(ray_session):
    import ray.data as rd

    t, mat = _corpus()
    queries = mat[:3].copy()
    # queries must round-trip float32 like the stored corpus
    queries = queries.astype(np.float32).astype(np.float64)
    res = sim.knn_bruteforce(
        rd.from_arrow(t), queries, np.arange(3), k=5
    ).to_pandas()
    ref = _reference_topk(mat, queries, 5)
    for qi in range(3):
        got = list(res[res["query_id"] == qi]["vec_id"])
        assert set(got) == set(ref[qi]), (qi, got, ref[qi])
        assert got[0] == qi  # self is its own nearest neighbor


def test_knn_merge_is_global(ray_session):
    """Result must be identical regardless of block layout."""
    import ray.data as rd

    t, mat = _corpus()
    q = mat[:2].astype(np.float32).astype(np.float64)
    a = sim.knn_bruteforce(rd.from_arrow(t), q, np.arange(2), k=7).to_pandas()
    b = sim.knn_bruteforce(
        rd.from_arrow(t).repartition(13), q, np.arange(2), k=7
    ).to_pandas()
    key = lambda df: sorted(zip(df["query_id"], df["vec_id"]))
    assert key(a) == key(b)


def test_ivf_recall(ray_session):
    import ray.data as rd

    t, mat = _corpus(n=400)
    q = mat[:5].astype(np.float32).astype(np.float64)
    exact = sim.knn_bruteforce(rd.from_arrow(t), q, np.arange(5), k=10).to_pandas()
    approx = sim.knn_ivf(
        rd.from_arrow(t), q, np.arange(5), k=10, n_cells=8, nprobe=3
    ).to_pandas()
    recalls = []
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls


def test_kmeans_deterministic():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(100, 8))
    x = x / np.linalg.norm(x, axis=1)[:, None]
    c1 = sim.deterministic_kmeans(x, 4)
    c2 = sim.deterministic_kmeans(x, 4)
    assert np.array_equal(c1, c2)


def test_knn_handles_empty_blocks(ray_session):
    """Splits/filters can produce empty blocks; stages must pass them
    through rather than crash np.stack."""
    import ray.data as rd

    t, mat = _corpus(n=20)
    q = mat[:2].astype(np.float32).astype(np.float64)
    ds = rd.from_arrow(t).repartition(40)  # more blocks than rows
    out = sim.knn_bruteforce(ds, q, np.arange(2), k=5).to_pandas()
    assert len(out) == 10


def _labeled_corpus(n=200, d=16, seed=3, n_labels=4):
    t, mat = _corpus(n, d, seed)
    labels = np.arange(n, dtype=np.int64) % n_labels
    return t.append_column("label", pa.array(labels, pa.int32())), mat, labels


def test_hard_negatives_excludes_same_label(ray_session):
    import ray.data as rd

    t, mat, labels = _labeled_corpus()
    qn = 3
    out = sim.knn_hard_negatives(
        rd.from_arrow(t).repartition(5), mat[:qn], np.arange(qn), labels[:qn], k=7
    ).to_pandas()
    assert len(out) == qn * 7
    for qid, grp in out.groupby("query_id"):
        assert (labels[grp["vec_id"].to_numpy()] != labels[qid]).all()
    # parity with a masked brute-force reference
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    cos = unit[:qn] @ unit.T
    for qid in range(qn):
        row = cos[qid].copy()
        row[labels == labels[qid]] = -np.inf
        ref = sorted(np.arange(len(row)), key=lambda i: (-row[i], i))[:7]
        got = out[out["query_id"] == qid]["vec_id"].tolist()
        assert got == ref


def test_hard_negatives_underfull_label(ray_session):
    # only 2 other-label vectors exist: output has 2 rows, never a
    # masked (-inf) filler
    import ray.data as rd

    t, mat = _corpus(n=10)
    labels = np.array([0] * 8 + [1] * 2, np.int64)
    t = t.append_column("label", pa.array(labels, pa.int32()))
    out = sim.knn_hard_negatives(
        rd.from_arrow(t).repartition(3), mat[:1], np.array([0]), labels[:1], k=5
    ).to_pandas()
    assert sorted(out["vec_id"].tolist()) == [8, 9]
