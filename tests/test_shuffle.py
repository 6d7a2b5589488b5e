"""Deterministic corpus shuffle (functions/shuffle.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from rsmetacheck_ray.functions.shuffle import shuffle_to_shards


def _ds(n, parallelism=None):
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64())})
    )
    return ds.repartition(parallelism) if parallelism else ds


def test_total_dense_addressing(ray_session):
    df = shuffle_to_shards(_ds(400), n_shards=8).to_pandas()
    assert len(df) == 400
    assert sorted(df["doc_id"]) == list(range(400))  # every doc exactly once
    assert df["shard"].between(0, 7).all()
    for s, grp in df.groupby("shard"):
        # pos is a dense 0..k-1 range within the shard
        assert sorted(grp["pos"]) == list(range(len(grp)))
        # and ordered by the rank permutation
        g = grp.sort_values("pos")
        assert g["shuffle_rank"].is_monotonic_increasing


def test_shuffle_actually_permutes(ray_session):
    df = (
        shuffle_to_shards(_ds(200), n_shards=4)
        .to_pandas()
        .sort_values(["shard", "pos"])
    )
    # the within-shard order must not be doc_id order (md5 permutation)
    first_shard = df[df["shard"] == df["shard"].iloc[0]]["doc_id"].tolist()
    assert first_shard != sorted(first_shard)
    assert len(first_shard) > 10  # 200/4 expected ~50, uniform-ish


def test_deterministic_across_partitionings(ray_session):
    import pandas as pd

    def run(p):
        return (
            shuffle_to_shards(_ds(300, parallelism=p), n_shards=16)
            .to_pandas()
            .sort_values(["shard", "pos"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(1), run(7))


def test_shard_bound_validated(ray_session):
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_to_shards(_ds(10), n_shards=257)
