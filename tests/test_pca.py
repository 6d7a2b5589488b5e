"""Distributed PCA (functions/pca.py) vs single-process numpy."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rsmetacheck_ray.functions.pca import pca_fit, pca_project


def _ds(ids, x, n_blocks=1):
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(x.astype(np.float64))),
        }
    )
    d = rd.from_arrow(t)
    return d.repartition(n_blocks) if n_blocks > 1 else d


def _numpy_pca(x, q):
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:q]
    comps = evecs[:, order].T.copy()
    flip = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps *= flip[:, None]
    return mu, comps, evals[order]


def _anisotropic(n=300, d=12, seed=5):
    rng = np.random.default_rng(seed)
    scales = np.linspace(5.0, 0.1, d)
    return rng.standard_normal((n, d)) * scales + 3.0


def test_pca_matches_numpy(ray_session):
    x = _anisotropic()
    ids = np.arange(len(x), dtype=np.int64)
    mean, comps, ev = pca_fit(_ds(ids, x, n_blocks=7), n_components=4)
    mu_ref, c_ref, ev_ref = _numpy_pca(x, 4)
    np.testing.assert_allclose(mean, mu_ref, rtol=1e-10)
    np.testing.assert_allclose(ev, ev_ref, rtol=1e-8)
    np.testing.assert_allclose(comps, c_ref, rtol=1e-6, atol=1e-9)


def test_pca_projection_and_variance(ray_session):
    x = _anisotropic()
    ids = np.arange(len(x), dtype=np.int64)
    ds = _ds(ids, x, n_blocks=4)
    mean, comps, ev = pca_fit(ds, n_components=3)
    assert ev[0] >= ev[1] >= ev[2] >= 0
    out = pca_project(ds, mean, comps).to_pandas().sort_values("vec_id")
    proj = np.stack(out["pc"].to_numpy())
    ref = (x - mean) @ comps.T
    np.testing.assert_allclose(proj, ref, rtol=1e-9, atol=1e-9)
    # projected coords are uncorrelated with variance == eigenvalues
    np.testing.assert_allclose(
        np.cov(proj, rowvar=False, ddof=1),
        np.diag(ev),
        atol=1e-6 * ev[0],
    )


def test_pca_layout_independent(ray_session):
    x = _anisotropic(n=200)
    ids = np.arange(len(x), dtype=np.int64)
    _, c1, _ = pca_fit(_ds(ids, x, n_blocks=1), n_components=2)
    _, c2, _ = pca_fit(_ds(ids, x, n_blocks=11), n_components=2)
    np.testing.assert_allclose(c1, c2, rtol=1e-8, atol=1e-12)


def test_pca_guards(ray_session):
    ids = np.arange(1, dtype=np.int64)
    with pytest.raises(ValueError):
        pca_fit(_ds(ids, np.ones((1, 4))), n_components=1)
