"""Distributed k-means + SemDeDup semantic dedup (functions/clustering.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rsmetacheck_ray.functions.clustering import (
    kmeans_assign,
    kmeans_fit,
    semantic_dedup,
)
from rsmetacheck_ray.functions.hashing import splitmix64_np

SF = "/root/testdata/sf0.001"


def _ds_from(ids: np.ndarray, vecs: np.ndarray, n_blocks: int = 1) -> rd.Dataset:
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(vecs.astype(np.float32))),
        }
    )
    ds = rd.from_arrow(t)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _planted(n_per=40, d=16, k=3, noise=0.02):
    """k well-separated axis directions + small noise."""
    rng = np.random.default_rng(7)
    vecs, labels = [], []
    for c in range(k):
        base = np.zeros(d)
        base[c] = 1.0
        v = base + noise * rng.standard_normal((n_per, d))
        vecs.append(v)
        labels.extend([c] * n_per)
    x = np.concatenate(vecs)
    ids = np.arange(len(x), dtype=np.int64)
    return ids, x, np.array(labels)


def _numpy_lloyd(ids, x, k, iters):
    """Single-process reference with the SAME init rule."""
    u = x / np.linalg.norm(x, axis=1, keepdims=True)
    pick = np.argsort(splitmix64_np(ids.astype(np.uint64)))[:k]
    c = u[pick].copy()
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    for _ in range(iters):
        a = (u @ c.T).argmax(1)
        for j in range(k):
            m = a == j
            if m.any():
                c[j] = u[m].mean(0)
        c = c / np.linalg.norm(c, axis=1, keepdims=True)
    return (u @ c.T).argmax(1)


def test_kmeans_recovers_planted_clusters(ray_session):
    ids, x, labels = _planted()
    ds = _ds_from(ids, x, n_blocks=5)
    cent = kmeans_fit(ds, k=3, n_iters=8)
    a = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
    # each planted cluster maps to exactly one kmeans cluster
    got = a["cluster"].to_numpy()
    for c in range(3):
        assert len(np.unique(got[labels == c])) == 1
    assert len(np.unique(got)) == 3
    assert (a["cos"] > 0.9).all()


def test_kmeans_matches_single_process_reference(ray_session):
    """Distributed partial-sum Lloyd == numpy whole-array Lloyd on real
    driver embeddings (same deterministic init), up to float-order ulp
    noise near boundaries."""
    import pyarrow.parquet as pq

    from rsmetacheck_ray.partitioning import read_pq

    t = pq.read_table(SF + "/embeddings.parquet")
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    x = np.stack([np.asarray(e, np.float64) for e in t.column("embedding").to_pylist()])
    ref = _numpy_lloyd(ids, x, k=5, iters=6)

    ds = read_pq(SF + "/embeddings.parquet")
    cent = kmeans_fit(ds, k=5, n_iters=6)
    a = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
    agree = (a["cluster"].to_numpy() == ref[np.argsort(ids)]).mean()
    assert agree >= 0.99


def test_kmeans_deterministic_same_layout(ray_session):
    ids, x, _ = _planted()
    ds = _ds_from(ids, x, n_blocks=4)
    c1 = kmeans_fit(ds, k=3, n_iters=5)
    c2 = kmeans_fit(ds, k=3, n_iters=5)
    assert (c1 == c2).all()


def test_kmeans_k_exceeds_corpus_raises(ray_session):
    ids, x, _ = _planted(n_per=2, k=2)
    with pytest.raises(ValueError):
        kmeans_fit(_ds_from(ids, x), k=100)


def test_semantic_dedup_drops_planted_near_dups(ray_session):
    ids, x, _ = _planted(n_per=30, k=3)
    # plant near-dup groups: ids 1000/1001 copy doc 0 (+tiny jitter),
    # 2000..2002 a transitive chain copying doc 35
    dup = np.concatenate(
        [
            x[0:1] * 1.0001,
            x[0:1] * 0.9999,
            x[35:36] + 1e-4,
            x[35:36] + 2e-4,
            x[35:36] + 3e-4,
        ]
    )
    all_ids = np.concatenate([ids, [1000, 1001, 2000, 2001, 2002]])
    all_x = np.concatenate([x, dup])
    out = (
        semantic_dedup(_ds_from(all_ids, all_x, n_blocks=3), k=3, threshold=0.999)
        .to_pandas()
        .set_index("vec_id")
    )
    assert len(out) == len(all_ids)
    # doc 0's group: min id (0) survives, copies dropped
    assert bool(out.loc[0, "keep"])
    assert not out.loc[[1000, 1001], "keep"].any()
    # transitive chain: 35 survives, whole chain dropped
    assert bool(out.loc[35, "keep"])
    assert not out.loc[[2000, 2001, 2002], "keep"].any()
    # non-duplicated docs all kept
    others = [i for i in ids if i not in (0, 35)]
    assert out.loc[others, "keep"].all()


def test_semantic_dedup_cap_keeps_tail(ray_session):
    """Docs beyond the max_cluster_docs cap are never compared — they
    stay kept (one-sided: the cap can only under-dedup)."""
    rng = np.random.default_rng(3)
    x = np.tile(np.eye(4)[0], (50, 1)) + 0.001 * rng.standard_normal((50, 4))
    ids = np.arange(50, dtype=np.int64)
    out = (
        semantic_dedup(_ds_from(ids, x), k=1, threshold=0.999, max_cluster_docs=10)
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    head = out.iloc[:10]["keep"].to_numpy()
    tail = out.iloc[10:]["keep"].to_numpy()
    assert head[0] and not head[1:].any()  # near-identical head dedups to 1
    assert tail.all()  # uncompared tail kept


def test_curate_semantic_consistent_with_components(ray_session):
    """The composition equals (gate-kept ids) minus (semantic-dropped
    ids), and the planted template cluster collapses to at most one
    surviving doc."""
    import numpy as np

    from rsmetacheck_ray.pipelines.queries import (
        q_curate_semantic,
        q_gate_decisions,
        registry,
    )

    sf = "/root/testdata/sf0.001"
    curated = set(q_curate_semantic(sf).to_pandas()["doc_id"])

    gate = q_gate_decisions(sf).to_pandas()
    kept = set(gate.loc[gate["keep"], "doc_id"].astype(int))

    # recompute the semantic component exactly as the query does
    import pyarrow as pa

    from rsmetacheck_ray.functions.clustering import semantic_dedup
    from rsmetacheck_ray.partitioning import read_pq

    emb = read_pq(sf + "/embeddings.parquet")

    def template(b):
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        vecs = [list(e) for e in b.column("embedding").to_pylist()]
        d = len(vecs[0]) if vecs else 0
        for i in np.flatnonzero(ids % 10 == 5):
            v = [0.0] * d
            v[0] = 1.0
            v[1] = 1e-4 * float(ids[i] % 97)
            vecs[i] = v
        return pa.table(
            {
                "vec_id": b.column("vec_id"),
                "embedding": pa.array(vecs, b.column("embedding").type),
            }
        )

    surv = semantic_dedup(
        emb.map_batches(template, batch_format="pyarrow"),
        k=8,
        threshold=0.999,
    ).to_pandas()
    dropped = set(surv.loc[~surv["keep"], "vec_id"].astype(int))

    assert curated == kept - dropped
    # template docs (id % 10 == 5) collapse to at most one survivor
    template_in_curated = {i for i in curated if i % 10 == 5}
    assert len(template_in_curated) <= 1
    # and the corpus genuinely shrank vs the gate alone
    assert len(curated) < len(kept)


def test_kmeans_margin_nonnegative_and_boundary(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from rsmetacheck_ray.functions.clustering import kmeans_margin

    cent = np.array([[1.0, 0.0], [0.0, 1.0]])
    vecs = [
        (0, [1.0, 0.0]),    # dead center of cluster 0: margin = 1.0
        (1, [1.0, 1.0]),    # exactly on the boundary: margin = 0.0
        (2, [0.1, 0.9]),    # cluster 1, clear margin
    ]
    t = pa.table({
        "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
        "embedding": pa.array(
            [v[1] for v in vecs], pa.list_(pa.float32())
        ),
    })
    got = {r["vec_id"]: r for r in kmeans_margin(rd.from_arrow(t), cent).take_all()}
    assert got[0]["cluster"] == 0 and got[0]["margin"] == 1.0
    assert got[1]["margin"] == 0.0  # tie -> argmax picks cluster 0
    assert got[1]["cluster"] == 0
    assert got[2]["cluster"] == 1 and got[2]["margin"] > 0.5
    assert all(r["margin"] >= 0.0 for r in got.values())
