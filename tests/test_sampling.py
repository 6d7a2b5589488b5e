"""Stratified quota sampling: deterministic rank semantics, per-key
quota overrides, mega-key pruning (the partial-combine shape)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

from rsmetacheck_ray.functions.sampling import stratified_sample


def _corpus(sizes: dict[str, int]) -> rd.Dataset:
    ids, keys = [], []
    nxt = 0
    for key, n in sizes.items():
        for _ in range(n):
            ids.append(nxt)
            keys.append(key)
            nxt += 1
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "host": pa.array(keys, pa.string()),
            }
        )
    )


def _expected(sizes: dict[str, int], k: int, quotas=None) -> set[int]:
    """Reference semantics: per key, the quota smallest md5(str(id))."""
    out = set()
    nxt = 0
    per = {}
    for key, n in sizes.items():
        per[key] = list(range(nxt, nxt + n))
        nxt += n
    for key, ids in per.items():
        q = (quotas or {}).get(key, k)
        ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        out |= set(ranked[:q])
    return out


def test_quota_and_determinism(ray_session):
    sizes = {"a.com": 10, "b.com": 2, "c.com": 1}
    out1 = stratified_sample(_corpus(sizes), "host", k=3).to_pandas()
    out2 = stratified_sample(_corpus(sizes), "host", k=3).to_pandas()
    assert set(out1["doc_id"]) == _expected(sizes, 3)
    assert set(out1["doc_id"]) == set(out2["doc_id"])  # run-to-run
    counts = out1.groupby("host")["doc_id"].count().to_dict()
    assert counts == {"a.com": 3, "b.com": 2, "c.com": 1}


def test_weighted_quotas(ray_session):
    sizes = {"en.site": 50, "de.site": 50}
    quotas = {"en.site": 7, "de.site": 2}
    out = stratified_sample(
        _corpus(sizes), "host", k=3, quotas=quotas
    ).to_pandas()
    counts = out.groupby("host")["doc_id"].count().to_dict()
    assert counts == {"en.site": 7, "de.site": 2}
    assert set(out["doc_id"]) == _expected(sizes, 3, quotas)


def test_megakey_partial_prune(ray_session):
    """A Zipf mega-key: result is exact and identical at any partition
    count (the in-batch prune ships <= k rows per key per block)."""
    sizes = {"mega.com": 5000, "tiny.org": 3}
    ds = _corpus(sizes)
    a = stratified_sample(ds, "host", k=5, num_partitions=2).to_pandas()
    b = stratified_sample(ds, "host", k=5, num_partitions=97).to_pandas()
    assert set(a["doc_id"]) == set(b["doc_id"]) == _expected(sizes, 5)
    assert a.groupby("host")["doc_id"].count().to_dict() == {
        "mega.com": 5, "tiny.org": 3,
    }


def test_null_and_empty(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "host": pa.array(["x", None, None], pa.string()),
        }
    )
    out = stratified_sample(rd.from_arrow(t), "host", k=1).to_pandas()
    # nulls coalesce to "" and compete for one quota slot
    assert len(out) == 2
    assert set(out["host"]) == {"x", ""}
