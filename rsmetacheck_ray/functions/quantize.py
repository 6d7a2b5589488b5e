"""Int8 embedding quantization + quantized kNN — the memory lever of
large-scale similarity search: symmetric per-vector scalar
quantization cuts the embedding corpus (and every ANN shuffle) 4×
versus float32, 8× versus the float64 testdata, at a small recall
cost (pinned ≥0.9 recall@10 vs the exact float kNN in pytest).

Quantization is symmetric per vector: ``scale = max|x| / 127``,
``q = round(x / scale)`` in int8. For COSINE search the scales cancel
(``cos(s·q) = cos(q)``), so the quantized searcher needs no
dequantization at all: one int8→int32 matmul per (query block ×
corpus batch), normalized by integer norms — the arithmetic a real
int8 ANN kernel does.

Scale shape: the quantized corpus is a per-batch transform (no
shuffle); search is the ``knn_bruteforce`` pattern — broadcast
quantized queries, per-batch local top-k, ONE small
``groupby(query_id)`` merge of (num_blocks × k) candidate rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .similarity import _batch_matrix, _merge_topk, _topk_table


def quantize_vec(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, d) float → (int8 (n, d), float64 scale (n,)). Zero vectors
    get scale 1.0 (quantize to all-zero). Rounding is half-up
    ``floor(x + 0.5)`` — exactly mirrorable by the SQL oracle's
    FLOOR(v + 0.5) (np.round's half-even has no SQL analog)."""
    absmax = np.abs(mat).max(axis=1)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0)
    q = np.clip(
        np.floor(mat / scale[:, None] + 0.5), -127, 127
    ).astype(np.int8)
    return q, scale


def quantize_embeddings(
    ds: rd.Dataset, id_col: str = "vec_id"
) -> rd.Dataset:
    """(vec_id, qvec: fixed-width int8 bytes, scale, dim) — the 4×
    smaller ANN corpus representation."""

    def stage(b: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(b, id_col)
        if len(ids) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "qvec": pa.array([], pa.binary()),
                    "scale": pa.array([], pa.float64()),
                    "dim": pa.array([], pa.int64()),
                }
            )
        q, scale = quantize_vec(mat)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "qvec": pa.array([r.tobytes() for r in q], pa.binary()),
                "scale": pa.array(scale, pa.float64()),
                "dim": pa.array(
                    np.full(len(ids), mat.shape[1]), pa.int64()
                ),
            }
        )

    return ds.map_batches(stage, batch_format="pyarrow")


def _parse_qvecs(batch: pa.Table, id_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Quantized rows → (ids, int8 (n, d)) — one zero-copy frombuffer
    over the binary column's data buffer (rows are fixed-width)."""
    ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
    if len(ids) == 0:
        return ids, np.zeros((0, 1), dtype=np.int8)
    dim = int(batch.column("dim")[0].as_py())
    col = batch.column("qvec")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    from .arrowbuf import varwidth_bytes

    raw, _ = varwidth_bytes(col)
    return ids, raw.view(np.int8).reshape(len(ids), dim)


def knn_quantized(
    qds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Cosine top-k per query over a ``quantize_embeddings`` corpus —
    (query_id, vec_id). Queries quantize with the same spec; scales
    cancel in cosine, so scoring is ONE integer matmul per batch over
    the stored int8 rows (no dequantization)."""
    qq, _ = quantize_vec(np.asarray(queries, dtype=np.float64))
    qi = np.asarray(query_ids, dtype=np.int64)
    qint0 = qq.astype(np.int32)
    # query norms are constant: compute once at dispatch, not per batch
    qn0 = np.maximum(np.linalg.norm(qint0, axis=1), 1e-300)
    qref = ray.put((qi, qint0, qn0))

    def local(batch: pa.Table) -> pa.Table:
        ids, bq = _parse_qvecs(batch, id_col)
        qids, qint, qn = ray.get(qref)
        if len(ids) == 0:
            return _topk_table(qids, ids, np.zeros((len(qids), 0)), k)
        bi = bq.astype(np.int32)
        dots = qint @ bi.T  # exact int32 arithmetic
        bn = np.maximum(np.linalg.norm(bi, axis=1), 1e-300)
        cos = dots / (qn[:, None] * bn[None, :])
        return _topk_table(qids, ids, cos, k)

    return (
        qds.map_batches(local, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(lambda g: _merge_topk(g, k), batch_format="pyarrow")
    )
