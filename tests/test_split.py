"""Deterministic train/val/test split (functions/split.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rsmetacheck_ray.functions.split import assign_splits


def _toy(n=4096):
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n), pa.int64())})
    )


def test_split_fractions_near_nominal(ray_session):
    t = assign_splits(_toy()).to_pandas()
    frac = t["split"].value_counts(normalize=True)
    # 1/256-quantized targets: 205/25/26 buckets
    assert abs(frac["train"] - 205 / 256) < 0.03
    assert abs(frac["val"] - 25 / 256) < 0.02
    assert abs(frac["test"] - 26 / 256) < 0.02


def test_split_stable_under_block_layout(ray_session):
    a = assign_splits(_toy(1000)).to_pandas().sort_values("doc_id")
    b = (
        assign_splits(_toy(1000).repartition(7))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert (a["split"].to_numpy() == b["split"].to_numpy()).all()
    assert (a["bucket"].to_numpy() == b["bucket"].to_numpy()).all()


def test_split_bucket_consistent_with_split(ray_session):
    t = assign_splits(_toy(2048)).to_pandas()
    assert (t.loc[t["bucket"] < 205, "split"] == "train").all()
    assert (
        t.loc[(t["bucket"] >= 205) & (t["bucket"] < 230), "split"] == "val"
    ).all()
    assert (t.loc[t["bucket"] >= 230, "split"] == "test").all()


def test_split_rejects_bad_fractions(ray_session):
    with pytest.raises(ValueError):
        assign_splits(_toy(8), train_buckets=250, val_buckets=50)
