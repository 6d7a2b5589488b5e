"""Int8 embedding quantization + quantized kNN (functions/quantize.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from rsmetacheck_ray.functions.quantize import (
    knn_quantized,
    quantize_embeddings,
    quantize_vec,
)
from rsmetacheck_ray.functions.similarity import knn_bruteforce


def test_quantize_vec_error_bound_and_zero():
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(50, 16)) * rng.uniform(0.1, 10, (50, 1))
    mat[7] = 0.0  # zero vector
    q, scale = quantize_vec(mat)
    assert q.dtype == np.int8
    recon = q.astype(np.float64) * scale[:, None]
    # symmetric round quantization: per-element error <= scale/2
    assert (np.abs(recon - mat) <= scale[:, None] / 2 + 1e-12).all()
    assert scale[7] == 1.0 and (q[7] == 0).all()
    assert np.abs(q).max() == 127  # full range used


def _emb_ds(mat):
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(mat)), pa.int64()),
                "embedding": pa.array(
                    [r.tolist() for r in mat], pa.list_(pa.float64())
                ),
            }
        )
    )


def test_quantized_corpus_schema_and_size(ray_session):
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(20, 8))
    qt = quantize_embeddings(_emb_ds(mat)).to_pandas()
    assert list(qt.columns) == ["vec_id", "qvec", "scale", "dim"]
    assert all(len(b) == 8 for b in qt["qvec"])  # 1 byte/dim: 8x vs f64
    assert (qt["dim"] == 8).all()


def test_quantized_knn_recall_vs_exact(ray_session):
    rng = np.random.default_rng(23)
    mat = rng.normal(size=(400, 32))
    ds = _emb_ds(mat)
    qids = np.arange(5, dtype=np.int64)
    qvecs = mat[:5]
    exact = knn_bruteforce(ds, qvecs, qids, k=10).to_pandas()
    quant = knn_quantized(
        quantize_embeddings(ds), qvecs, qids, k=10
    ).to_pandas()
    recalls = []
    for q in qids:
        e = set(exact[exact.query_id == q]["vec_id"])
        g = set(quant[quant.query_id == q]["vec_id"])
        recalls.append(len(e & g) / len(e))
        # a query's own vector must survive quantization as top-1
        assert q in g
    assert np.mean(recalls) >= 0.9
