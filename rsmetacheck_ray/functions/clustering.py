"""Distributed k-means over an embedding column + SemDeDup-style
semantic near-dedup (Abbas et al. 2023: cluster the corpus, then drop
all-but-one of each near-duplicate group *within* a cluster).

Recasts the reference's single-list "latest release wins" selection
(``p001.py:54``) into the operator a 100 TB training-data pipeline
actually needs: an iterative algorithm expressed as repeated streaming
passes over a Dataset.

Scale plan:
 - **fit** (Lloyd iterations): the embeddings are projected once to
   (id, unit-vector) and materialized so the n_iters passes re-read
   blocks from the object store (spilling, not recomputing parquet
   decode per pass). Each pass is a ``map_batches`` that emits ONE
   tiny partial row per batch — the (k × d) cluster-sum matrix plus
   counts — so the driver reduce is O(k·d·n_batches) bytes and the
   data never shuffles. Centroids are broadcast per iteration via
   ``ray.put`` (read zero-copy in every task), never shipped per
   batch.
 - **assign**: one more pass, (id, cluster, cos) out.
 - **semantic dedup**: assignment + unit vectors shuffle ONCE on the
   cluster id (clusters are the partition key); each cluster resolves
   its near-dup groups locally — cosine similarity matrix, threshold
   edges, union-find components, min-id survivor — under a hard
   ``max_cluster_docs`` cap with logged truncation (the same bounded-
   bucket discipline as MinHash/SimHash buckets in functions/dedup.py).
   Like SemDeDup itself, duplicates that land in different clusters
   are not compared — the documented recall trade for never running
   an all-pairs pass.

Determinism: init picks the k ids with the smallest
``splitmix64(vec_id)`` (machine-independent), iterations are a fixed
count, and every reduce sorts its partials before summing, so refit on
the SAME block layout is bit-identical; across layouts only float
summation order differs (assignments are stable for any non-degenerate
clustering — pinned by the purity/layout tests, not bit-equality).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .hashing import splitmix64_np
from .similarity import _batch_matrix, _unit

MAX_CLUSTER_DOCS = 4096


def _project_unit(ds: rd.Dataset, id_col: str) -> rd.Dataset:
    """(id, unit embedding) projection — the only columns k-means
    touches; materialized by the caller for repeated passes."""

    def proj(b: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(b, id_col)
        if len(ids) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "unit": pa.array([], pa.list_(pa.float64())),
                }
            )
        u = _unit(mat)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "unit": pa.array(list(u), pa.list_(pa.float64())),
            }
        )

    return ds.select_columns([id_col, "embedding"]).map_batches(
        proj, batch_format="pyarrow"
    )


def _unit_matrix(b: pa.Table, id_col: str) -> tuple[np.ndarray, np.ndarray]:
    ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = b.column("unit").combine_chunks()
    d = len(flat[0]) if len(flat) else 0
    mat = np.asarray(flat.flatten()).reshape(len(ids), d) if len(ids) else (
        np.zeros((0, 0))
    )
    return ids, mat


def kmeans_fit(
    ds: rd.Dataset,
    k: int = 8,
    n_iters: int = 10,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Lloyd's k-means on unit vectors (cosine geometry) over a
    Dataset; returns the (k, d) unit centroid matrix."""
    unit_ds = _project_unit(ds, id_col).materialize()

    # --- deterministic distributed init: k smallest splitmix64(id) ---
    def seed_candidates(b: pa.Table) -> pa.Table:
        ids, mat = _unit_matrix(b, id_col)
        if len(ids) == 0:
            return pa.table(
                {
                    "h": pa.array([], pa.uint64()),
                    "unit": pa.array([], pa.list_(pa.float64())),
                }
            )
        h = splitmix64_np(ids.astype(np.uint64))
        take = np.argsort(h)[:k]
        return pa.table(
            {
                "h": pa.array(h[take], pa.uint64()),
                "unit": pa.array(list(mat[take]), pa.list_(pa.float64())),
            }
        )

    def seed_combine(b: pa.Table) -> pa.Table:
        """Fan-in: keep only the k smallest hashes of a candidate
        bundle, bounding the driver pull to k × #blocks/512 rows (the
        CMS two-level discipline)."""
        if b.num_rows <= k:
            return b
        h = b.column("h").to_numpy(zero_copy_only=False)
        take = pa.array(np.argsort(h)[:k], pa.int64())
        return b.take(take)

    cand = (
        unit_ds.map_batches(seed_candidates, batch_format="pyarrow")
        .map_batches(seed_combine, batch_format="pyarrow", batch_size=512)
        .take_all()
    )
    cand.sort(key=lambda r: r["h"])
    if len(cand) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(cand)}")
    cent = _unit(np.stack([np.asarray(r["unit"], np.float64) for r in cand[:k]]))

    # --- Lloyd iterations: per-batch partial sums, driver reduce ---
    for _ in range(n_iters):
        cent_ref = ray.put(cent)

        def partial(b: pa.Table, ref=cent_ref) -> pa.Table:
            c = ray.get(ref)
            ids, mat = _unit_matrix(b, id_col)
            kk, d = c.shape
            if len(ids) == 0:
                return pa.table(
                    {
                        "ord": pa.array([], pa.int64()),
                        "sums": pa.array([], pa.list_(pa.float64())),
                        "counts": pa.array([], pa.list_(pa.int64())),
                    }
                )
            assign = (mat @ c.T).argmax(axis=1)
            acc = np.zeros((kk, d), np.float64)
            np.add.at(acc, assign, mat)
            counts = np.bincount(assign, minlength=kk).astype(np.int64)
            return pa.table(
                {
                    "ord": pa.array([int(ids.min())], pa.int64()),
                    "sums": pa.array([acc.ravel()], pa.list_(pa.float64())),
                    "counts": pa.array([counts], pa.list_(pa.int64())),
                }
            )

        def partial_combine(b: pa.Table) -> pa.Table:
            """Fan-in: element-wise sum of a bundle of partial rows —
            the driver merges #blocks/256 rows, not #blocks (a (k, d)
            float partial per block is GBs at 10⁶ blocks)."""
            if b.num_rows <= 1:
                return b
            sums = np.zeros(len(b.column("sums")[0]), np.float64)
            counts = np.zeros(len(b.column("counts")[0]), np.int64)
            for rs, rc in zip(
                b.column("sums").to_pylist(), b.column("counts").to_pylist()
            ):
                sums += np.asarray(rs, np.float64)
                counts += np.asarray(rc, np.int64)
            return pa.table(
                {
                    "ord": pa.array(
                        [min(b.column("ord").to_pylist())], pa.int64()
                    ),
                    "sums": pa.array([sums], pa.list_(pa.float64())),
                    "counts": pa.array([counts], pa.list_(pa.int64())),
                }
            )

        parts = (
            unit_ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(partial_combine, batch_format="pyarrow", batch_size=256)
            .take_all()
        )
        # fixed merge order (min id per bundle) -> deterministic refit
        parts.sort(key=lambda r: r["ord"])
        kk, d = cent.shape
        acc = np.zeros((kk, d), np.float64)
        counts = np.zeros(kk, np.int64)
        for r in parts:
            acc += np.asarray(r["sums"], np.float64).reshape(kk, d)
            counts += np.asarray(r["counts"], np.int64)
        nonempty = counts > 0
        cent = cent.copy()
        cent[nonempty] = acc[nonempty] / counts[nonempty, None]
        cent = _unit(cent)  # empty clusters keep their old centroid
    return cent


def kmeans_assign(
    ds: rd.Dataset, centroids: np.ndarray, id_col: str = "vec_id"
) -> rd.Dataset:
    """(id, cluster, cos): nearest-centroid assignment, one pass.

    The float math is deliberately SEQUENTIAL (cumsum folds, not BLAS
    matmul) so a SQL oracle can reproduce every cos bit-for-bit from
    the exported centroids with DuckDB's ``list_sum`` left fold — the
    ``embedding_norms`` cumsum ≙ list_sum pattern. Ties break to the
    lowest cluster index on both sides (np.argmax first-max ≙
    ROW_NUMBER ORDER BY cos DESC, cluster)."""
    cent_ref = ray.put(np.ascontiguousarray(centroids, np.float64))

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids, mat = _batch_matrix(b, id_col)
        if len(ids) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        # sequential norm: cumsum(x²)[-1] ≙ list_sum(x²)
        norms = np.sqrt(np.cumsum(mat * mat, axis=1)[:, -1])
        u = mat / np.maximum(norms, 1e-300)[:, None]
        # sequential dot per (vec, centroid): cumsum over dims
        prods = u[:, None, :] * c[None, :, :]
        sims = np.cumsum(prods, axis=2)[:, :, -1]
        a = sims.argmax(axis=1)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "cos": pa.array(sims[np.arange(len(a)), a], pa.float64()),
            }
        )

    return ds.select_columns([id_col, "embedding"]).map_batches(
        assign, batch_format="pyarrow"
    )


def semantic_dedup(
    ds: rd.Dataset,
    k: int = 8,
    n_iters: int = 10,
    threshold: float = 0.97,
    id_col: str = "vec_id",
    max_cluster_docs: int = MAX_CLUSTER_DOCS,
    centroids: np.ndarray | None = None,
) -> rd.Dataset:
    """(id, cluster, keep): SemDeDup — within each k-means cluster,
    connected components of the cos>threshold graph keep only their
    min-id member. ONE shuffle, keyed directly on the cluster id.

    Partitioning assumption (explicit): a cluster is the unit of
    worker memory — each map_groups call materializes one cluster's
    (id, unit-vector) rows, so ``k`` must be sized to keep n/k × d
    float64s inside the worker budget (k IS the scale knob, exactly as
    in SemDeDup, which runs k ≈ √n-scale clusterings).
    ``max_cluster_docs`` separately bounds the O(c²) similarity
    compare; docs beyond it stay uncompared and KEPT (one-sided: the
    cap can only under-dedup, never false-drop)."""
    if centroids is None:
        centroids = kmeans_fit(ds, k=k, n_iters=n_iters, id_col=id_col)
    cent_ref = ray.put(centroids)

    def tag(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids, mat = _batch_matrix(b, id_col)
        if len(ids) == 0:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "unit": pa.array([], pa.list_(pa.float64())),
                }
            )
        # same sequential-fold assignment math as kmeans_assign, so
        # the SQL oracle's re-assignment is bit-identical
        norms = np.sqrt(np.cumsum(mat * mat, axis=1)[:, -1])
        u = mat / np.maximum(norms, 1e-300)[:, None]
        sims = np.cumsum(u[:, None, :] * c[None, :, :], axis=2)[:, :, -1]
        a = sims.argmax(axis=1).astype(np.int64)
        return pa.table(
            {
                "cluster": pa.array(a, pa.int64()),
                id_col: pa.array(ids, pa.int64()),
                "unit": pa.array(list(u), pa.list_(pa.float64())),
            }
        )

    def resolve(g: pa.Table) -> pa.Table:
        ids, mat = _unit_matrix(g, id_col)
        cluster = int(g.column("cluster")[0].as_py()) if len(ids) else 0
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        if len(ids) > max_cluster_docs:
            import sys

            print(
                f"[semantic_dedup] cluster {cluster}: comparing only the "
                f"first {max_cluster_docs} of {len(ids)} docs (cap)",
                file=sys.stderr,
            )
        head = min(len(ids), max_cluster_docs)
        keep = np.ones(len(ids), dtype=bool)
        if head > 1:
            sims = mat[:head] @ mat[:head].T
            ii, jj = np.nonzero(np.triu(sims > threshold, k=1))
            # union-find over threshold edges (min-id root)
            parent = np.arange(head)

            def find(x: int) -> int:
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a_, b_ in zip(ii, jj):
                ra, rb = find(int(a_)), find(int(b_))
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            roots = np.array([find(i) for i in range(head)])
            keep[:head] = roots == np.arange(head)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster": pa.array(
                    np.full(len(ids), cluster, np.int64), pa.int64()
                ),
                "keep": pa.array(keep),
            }
        )

    return (
        ds.select_columns([id_col, "embedding"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(resolve, batch_format="pyarrow")
    )


def kmeans_margin(
    ds: rd.Dataset, centroids: np.ndarray, id_col: str = "vec_id"
) -> rd.Dataset:
    """(id, cluster, margin): per-vector cluster-separation margin —
    cos to the assigned (nearest) centroid minus cos to the nearest
    OTHER centroid: the simplified (centroid-based) silhouette signal.
    margin ≈ 0 flags points sitting on a cluster boundary (SemDeDup's
    failure mode: near-boundary duplicates land in different cells).

    Same deliberately-SEQUENTIAL float math as :func:`kmeans_assign`
    (cumsum folds ≙ DuckDB list_sum), so both cosines — and therefore
    their difference — are bit-identical to the exported-centroid SQL
    oracle; the runner-up is an order-free MAX over the remaining
    clusters."""
    cent_ref = ray.put(np.ascontiguousarray(centroids, np.float64))

    def margin(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids, mat = _batch_matrix(b, id_col)
        if len(ids) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "margin": pa.array([], pa.float64()),
                }
            )
        norms = np.sqrt(np.cumsum(mat * mat, axis=1)[:, -1])
        u = mat / np.maximum(norms, 1e-300)[:, None]
        prods = u[:, None, :] * c[None, :, :]
        sims = np.cumsum(prods, axis=2)[:, :, -1]
        a = sims.argmax(axis=1)
        best = sims[np.arange(len(a)), a]
        masked = sims.copy()
        masked[np.arange(len(a)), a] = -np.inf
        second = masked.max(axis=1)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "margin": pa.array(best - second, pa.float64()),
            }
        )

    return ds.select_columns([id_col, "embedding"]).map_batches(
        margin, batch_format="pyarrow"
    )
