"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix (a handful of
vectors) is broadcast once with ``ray.put``; every batch does one
double-precision matmul and emits its LOCAL top-k per query; a final
tiny ``groupby(query_id).map_groups`` merges local winners into the
global top-k. Only O(#queries × k) rows shuffle — never the corpus.

Scale path: IVF — deterministic k-means (fixed seed, fixed iteration
count) trains a small centroid codebook on a sample; each batch
assigns its vectors to the nearest centroid and only the ``nprobe``
closest cells per query are searched. Same merge; recall traded for
a ~ncells/nprobe compute cut. Codebook is per-actor state loaded once
in ``__init__`` (the ActorPoolStrategy pattern, SURVEY §2.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1), 1e-300)[:, None]


def _batch_matrix(batch: pa.Table, id_col: str) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
    if len(ids) == 0:  # empty blocks occur after splits/filters
        return ids, np.zeros((0, 1), dtype=np.float64)
    mat = np.stack(
        [np.asarray(e, dtype=np.float64) for e in batch.column("embedding").to_pylist()]
    )
    return ids, mat


def _topk_table(
    qids: np.ndarray, vids: np.ndarray, cos: np.ndarray, k: int
) -> pa.Table:
    """cos: (nq, nb) scores → long-format local top-k per query."""
    out_q, out_v, out_c = [], [], []
    for qi in range(cos.shape[0]):
        row = cos[qi]
        if len(row) > k:
            # widen the selection to ALL boundary ties before the
            # deterministic sort — a bare argpartition cut can keep an
            # arbitrary tied vector and diverge from the oracle's
            # (score DESC, vec_id ASC) tie-break on duplicate vectors
            part = np.argpartition(-row, k - 1)
            kth = row[part[k - 1]]
            cand = np.nonzero(row >= kth)[0]
        else:
            cand = np.arange(len(row))
        # deterministic order: score desc, then vec_id asc
        idx = cand[np.lexsort((vids[cand], -row[cand]))][:k]
        out_q.extend([int(qids[qi])] * len(idx))
        out_v.extend(vids[idx].tolist())
        out_c.extend(row[idx].tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cos": pa.array(out_c, pa.float64()),
        }
    )


def _merge_topk(group: pa.Table, k: int) -> pa.Table:
    q = group.column("query_id").to_pylist()
    v = np.asarray(group.column("vec_id").to_pylist(), dtype=np.int64)
    c = np.asarray(group.column("cos").to_pylist(), dtype=np.float64)
    order = np.lexsort((v, -c))[:k]
    return pa.table(
        {
            "query_id": pa.array([q[0]] * len(order), pa.int64()),
            "vec_id": pa.array(v[order], pa.int64()),
        }
    )


def knn_bruteforce(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Global cosine top-k per query vector → (query_id, vec_id)."""
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), _unit(np.asarray(queries, dtype=np.float64))))

    def local(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch, id_col)
        qids, qunit = ray.get(qref)
        if len(ids) == 0:
            cos = np.zeros((len(qids), 0))
        else:
            cos = qunit @ _unit(mat).T
        return _topk_table(qids, ids, cos, k)

    local_ds = ds.map_batches(local, batch_format="pyarrow")
    return local_ds.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pyarrow"
    )


def knn_hard_negatives(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    query_labels: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> rd.Dataset:
    """Contrastive hard-negative mining: per query, the global cosine
    top-k among vectors whose LABEL DIFFERS from the query's (the
    same-label set is the positive class — the nearest other-label
    vectors are the negatives a contrastive loss learns most from).
    Same plan as knn_bruteforce (per-block local top-k prune, tiny
    per-query merge); the label mask is applied to the score matrix
    before the prune, so same-label vectors never enter the shuffle."""
    qref = ray.put(
        (
            np.asarray(query_ids, dtype=np.int64),
            _unit(np.asarray(queries, dtype=np.float64)),
            np.asarray(query_labels, dtype=np.int64),
        )
    )

    def local(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch, id_col)
        qids, qunit, qlabs = ray.get(qref)
        if len(ids) == 0:
            cos = np.zeros((len(qids), 0))
            t = _topk_table(qids, ids, cos, k)
        else:
            labs = (
                batch.column(label_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            cos = qunit @ _unit(mat).T
            cos[qlabs[:, None] == labs[None, :]] = -np.inf
            t = _topk_table(qids, ids, cos, k)
            # drop masked entries that survived an under-full top-k
            t = t.filter(pc.greater(t.column("cos"), float("-inf")))
        return t

    local_ds = ds.map_batches(local, batch_format="pyarrow")
    return local_ds.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------

def deterministic_kmeans(
    x: np.ndarray, n_cells: int, n_iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Fixed-seed, fixed-iteration k-means on unit vectors (cosine)."""
    from .hashing import splitmix64_np

    n = len(x)
    pick = splitmix64_np(np.arange(n, dtype=np.uint64) ^ np.uint64(seed)).argsort()[
        :n_cells
    ]
    cent = _unit(x[pick].copy())
    for _ in range(n_iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
        cent = _unit(cent)
    return cent


class IVFSearcher:
    """Actor-pool stage: codebook + queries built once per actor."""

    def __init__(self, centroids: np.ndarray, query_ids: np.ndarray, queries: np.ndarray, k: int, nprobe: int, id_col: str = "vec_id"):
        self.cent = centroids
        self.qids = np.asarray(query_ids, dtype=np.int64)
        self.qunit = _unit(np.asarray(queries, dtype=np.float64))
        self.k = k
        self.id_col = id_col
        # cells each query probes (precomputed once per actor);
        # STABLE sort so sim ties break to the lowest cell index —
        # the same (sim DESC, cell ASC) order the SQL oracle ranks by
        sims = self.qunit @ centroids.T
        self.probe = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch, self.id_col)
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        unit = _unit(mat)
        assign = (unit @ self.cent.T).argmax(axis=1)
        tables = []
        for qi in range(len(self.qids)):
            m = np.isin(assign, self.probe[qi])
            if not m.any():
                continue
            cos = (self.qunit[qi : qi + 1] @ unit[m].T)
            tables.append(_topk_table(self.qids[qi : qi + 1], ids[m], cos, self.k))
        if not tables:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        return pa.concat_tables(tables)


def knn_ivf(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_cells: int | None = None,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    train_sample: int = 2048,
    centroids_out: list | None = None,
) -> rd.Dataset:
    """Approximate cosine top-k: train codebook on a bounded SYSTEMATIC
    sample drawn across the whole corpus (id % stride == 0 — the
    orders_systematic_sample pattern), search only ``nprobe`` cells per
    query. A limit(n) sample would see only the first fragment's
    distribution and bias the codebook at scale.

    ``n_cells``/``nprobe`` default from the corpus size — the standard
    IVF heuristic ``n_cells ≈ √n`` (clamped) with ``nprobe`` = a
    quarter of the cells, trading ~4× compute cut for recall; the
    recall-vs-exact bound is pinned in tests/test_similarity.py."""
    # row count from parquet footers when the dataset has file lineage
    # (free); only transformed/in-memory inputs pay a count() pass
    from ..partitioning import parquet_rows_hint

    n_total = parquet_rows_hint(ds) or ds.count()
    if n_cells is None:
        n_cells = int(min(4096, max(16, round(n_total ** 0.5))))
    if nprobe is None:
        nprobe = max(2, n_cells // 4)
    stride = max(1, n_total // train_sample)

    def pick(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % stride == 0))

    sample = (
        ds.select_columns([id_col, "embedding"])
        .map_batches(pick, batch_format="pyarrow")
        .limit(train_sample)
        .take_all()
    )
    if not sample:
        # sparse/offset id spaces can miss the stride entirely — fall
        # back to the first rows rather than crash (biased but valid)
        sample = ds.select_columns([id_col, "embedding"]).limit(train_sample).take_all()
    x = _unit(np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in sample]))
    cent = deterministic_kmeans(x, min(n_cells, len(x)))
    if centroids_out is not None:
        centroids_out.append((cent, nprobe))  # oracle parameter export
    local = ds.map_batches(
        IVFSearcher,
        fn_constructor_args=(cent, query_ids, queries, k, nprobe, id_col),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return local.groupby("query_id").map_groups(
        lambda g: _merge_topk(g, k), batch_format="pyarrow"
    )
