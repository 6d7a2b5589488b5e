"""Distributed PCA over an embedding column — the dimensionality-
reduction step before large-scale ANN / clustering (reduce d, keep the
variance), expressed as the canonical two-pass Dataset linear algebra:

 1. **moments pass** — each batch emits ONE tiny partial row: the
    (d,) coordinate sum, the (d, d) Gram matrix X^T X (flattened), and
    the row count. The driver merges partials in a FIXED order (sorted
    by each batch's min id) and eigendecomposes the (d, d) covariance —
    O(d²) bytes per batch and O(d³) driver work, independent of corpus
    size. The data itself never shuffles.
 2. **projection pass** — components are broadcast once via
    ``ray.put``; each batch is one centered matmul.

Sign convention: each component is flipped so its largest-|coefficient|
coordinate is positive (eigenvectors are sign-ambiguous; the convention
makes results comparable across runs and to the numpy reference in
tests). Iterative linear algebra ⇒ rows-only in the registry; exact
parity with single-process ``numpy.linalg.eigh`` PCA is pinned in
pytest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from .arrowmat import matrix_list_array
from .similarity import _batch_matrix

MAX_MOMENT_DIM = 4096  # d beyond this makes the (d,d) Gram partial too big


def pca_fit(
    ds: rd.Dataset, n_components: int = 8, id_col: str = "vec_id"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (mean (d,), components (q, d), explained_var (q,)) —
    eigenvectors of the sample covariance, descending eigenvalue."""

    def moments(b: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(b, id_col)
        if len(ids) == 0:
            return pa.table(
                {
                    "ord": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.list_(pa.float64())),
                    "g": pa.array([], pa.list_(pa.float64())),
                }
            )
        d = mat.shape[1]
        if d > MAX_MOMENT_DIM:
            raise ValueError(
                f"embedding dim {d} > {MAX_MOMENT_DIM}: the (d,d) Gram "
                f"partial would be {8 * d * d >> 20} MiB per batch"
            )
        return pa.table(
            {
                "ord": pa.array([int(ids.min())], pa.int64()),
                "n": pa.array([len(ids)], pa.int64()),
                "s": pa.array([mat.sum(axis=0)], pa.list_(pa.float64())),
                "g": pa.array([(mat.T @ mat).ravel()], pa.list_(pa.float64())),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        """Fan-in level: sum a bundle of moment rows into one row, so
        the driver pull is #blocks/256 rows, not #blocks (at 10⁶
        blocks the un-fanned (d,d) partials would be GBs on the
        driver — the CMS two-level discipline, functions/sketch.py)."""
        if b.num_rows <= 1:
            return b
        n = int(sum(b.column("n").to_pylist()))
        d = len(b.column("s")[0])
        s = np.zeros(d, np.float64)
        g = np.zeros(d * d, np.float64)
        for row_s, row_g in zip(b.column("s").to_pylist(), b.column("g").to_pylist()):
            s += np.asarray(row_s, np.float64)
            g += np.asarray(row_g, np.float64)
        return pa.table(
            {
                "ord": pa.array([min(b.column("ord").to_pylist())], pa.int64()),
                "n": pa.array([n], pa.int64()),
                "s": pa.array([s], pa.list_(pa.float64())),
                "g": pa.array([g], pa.list_(pa.float64())),
            }
        )

    parts = (
        ds.select_columns([id_col, "embedding"])
        .map_batches(moments, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", batch_size=256)
        .take_all()
    )
    if not parts:
        raise ValueError("pca_fit: empty dataset")
    parts.sort(key=lambda r: r["ord"])  # deterministic merge order
    d = len(parts[0]["s"])
    n = 0
    s = np.zeros(d, np.float64)
    g = np.zeros((d, d), np.float64)
    for r in parts:
        n += int(r["n"])
        s += np.asarray(r["s"], np.float64)
        g += np.asarray(r["g"], np.float64).reshape(d, d)
    if n < 2:
        raise ValueError("pca_fit: need at least 2 rows")
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T.copy()
    # sign convention: largest-|coef| coordinate positive
    flip = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps *= flip[:, None]
    return mean, comps, np.maximum(evals[order], 0.0)


def pca_project(
    ds: rd.Dataset,
    mean: np.ndarray,
    components: np.ndarray,
    id_col: str = "vec_id",
) -> rd.Dataset:
    """(id, pc: list<double>): centered projection onto the fitted
    components — one broadcast, one vectorized fold per batch. The
    per-component dot is deliberately SEQUENTIAL over dimensions
    (cumsum fold, not BLAS matmul — BLAS blocks/SIMDs the accumulation
    in an implementation-defined order): the clustering.py cumsum ≙
    DuckDB list_sum pattern, which is what lets the pca_embeddings
    oracle re-derive every projected float bit-for-bit from the
    exported (mean, components)."""
    ref = ray.put(
        (
            np.ascontiguousarray(mean, np.float64),
            np.ascontiguousarray(components, np.float64),
        )
    )

    def project(b: pa.Table) -> pa.Table:
        mu, comps = ray.get(ref)
        ids, mat = _batch_matrix(b, id_col)
        if len(ids) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "pc": pa.array([], pa.list_(pa.float64())),
                }
            )
        centered = mat - mu
        # sequential dot per component: cumsum over dims ≙ list_sum
        proj = np.stack(
            [
                np.cumsum(centered * comps[c], axis=1)[:, -1]
                for c in range(len(comps))
            ],
            axis=1,
        )
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "pc": matrix_list_array(proj),
            }
        )

    return ds.select_columns([id_col, "embedding"]).map_batches(
        project, batch_format="pyarrow"
    )
