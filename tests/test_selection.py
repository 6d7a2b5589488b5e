"""Radix-selection exact quantiles (functions/selection.py) vs a
brute-force sorted-array oracle: random data with heavy duplicates,
skew across high buckets, all-equal, single-row, empty, and the
DuckDB quantile_disc rank convention k = max(1, ceil(q*n))."""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pyarrow as pa

import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsmetacheck_ray.functions.selection import radix_quantiles


def _brute(vals: np.ndarray, qs) -> list[int]:
    s = np.sort(vals)
    n = len(s)
    return [int(s[max(1, math.ceil(q * n)) - 1]) for q in qs]


def _ds(vals: np.ndarray, blocks: int = 4) -> rd.Dataset:
    t = pa.table({"cents": pa.array(vals, pa.int64())})
    return rd.from_arrow(t).repartition(blocks)


def test_radix_matches_bruteforce_random(ray_session):
    rng = np.random.default_rng(11)
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    for n, hi in [(1000, 1 << 18), (5000, 1 << 31), (777, 50)]:
        vals = rng.integers(0, hi, size=n)
        # heavy duplicates: fold half the values onto a few points
        vals[: n // 2] = rng.choice([7, hi - 1, hi // 2], size=n // 2)
        got = radix_quantiles(_ds(vals), "cents", qs)
        assert got == _brute(vals, qs), (n, hi)


def test_radix_edge_shapes(ray_session):
    qs = [0.25, 0.5, 1.0]
    # all equal
    assert radix_quantiles(_ds(np.full(100, 42)), "cents", qs) == [42, 42, 42]
    # single row
    assert radix_quantiles(_ds(np.array([9])), "cents", qs) == [9, 9, 9]
    # empty
    assert radix_quantiles(_ds(np.array([], np.int64)), "cents", qs) is None
    # values straddling the 16-bit boundary exactly
    vals = np.array([0xFFFF, 0x10000, 0x10001, 0xFFFE])
    assert radix_quantiles(_ds(vals), "cents", [0.5]) == [0xFFFF]


def test_radix_rejects_out_of_domain(ray_session):
    import pytest

    with pytest.raises(Exception):
        radix_quantiles(_ds(np.array([-1, 5])), "cents", [0.5])


def test_radix_by_group_matches_bruteforce(ray_session):
    from rsmetacheck_ray.functions.selection import radix_quantiles_by_group

    rng = np.random.default_rng(23)
    qs = [0.1, 0.5, 0.9, 1.0]
    groups = np.array(["a", "b", "c"])[rng.integers(0, 3, size=3000)]
    vals = rng.integers(0, 1 << 30, size=3000)
    vals[groups == "b"] %= 50  # one group entirely in bucket 0
    t = pa.table(
        {
            "g": pa.array(groups, pa.string()),
            "cents": pa.array(vals, pa.int64()),
        }
    )
    got = radix_quantiles_by_group(
        rd.from_arrow(t).repartition(5), "g", "cents", qs
    )
    rows = got.to_pylist()
    i = 0
    for grp in ["a", "b", "c"]:
        exp = _brute(vals[groups == grp], qs)
        for q, e in zip(qs, exp):
            r = rows[i]; i += 1
            assert r == {"grp": grp, "q": q, "value": e}, (r, grp, q, e)
    assert i == len(rows)


def test_radix_by_group_empty_and_single(ray_session):
    from rsmetacheck_ray.functions.selection import radix_quantiles_by_group

    t = pa.table(
        {"g": pa.array([], pa.string()), "cents": pa.array([], pa.int64())}
    )
    assert radix_quantiles_by_group(rd.from_arrow(t), "g", "cents", [0.5]) is None
    t = pa.table({"g": pa.array(["x"]), "cents": pa.array([7], pa.int64())})
    got = radix_quantiles_by_group(rd.from_arrow(t), "g", "cents", [0.5])
    assert got.to_pylist() == [{"grp": "x", "q": 0.5, "value": 7}]


# ---------------------------------------------------------------------------
# radix_weighted_quantiles
# ---------------------------------------------------------------------------

from rsmetacheck_ray.functions.selection import radix_weighted_quantiles


def _wbrute(vals: np.ndarray, ws: np.ndarray, qs) -> list[int]:
    """Weighted quantile_disc oracle: repeat each value by its weight,
    then the unweighted rank convention."""
    rep = np.repeat(vals, ws)
    return _brute(rep, qs)


def _wds(vals, ws, blocks: int = 4) -> rd.Dataset:
    t = pa.table({
        "cents": pa.array(np.asarray(vals, np.int64)),
        "w": pa.array(np.asarray(ws, np.int64)),
    })
    return rd.from_arrow(t).repartition(blocks)


def test_weighted_matches_expansion_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 22, size=5000)
    ws = rng.integers(0, 6, size=5000)  # zeros included
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    got = radix_weighted_quantiles(_wds(vals, ws), "cents", "w", qs)
    sel = ws > 0
    assert got == _wbrute(vals[sel], ws[sel], qs)


def test_weighted_hand_values_and_zero_weight(ray_session):
    # 10 w=1, 20 w=3: W=4 -> q=.25 k=1 -> 10; q=.5 k=2 -> 20.
    # A zero-weight 15 must never carry a quantile.
    got = radix_weighted_quantiles(
        _wds([10, 15, 20], [1, 0, 3], blocks=2), "cents", "w",
        [0.25, 0.5, 1.0],
    )
    assert got == [10, 20, 20]


def test_weighted_unit_weights_match_unweighted(ray_session):
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 1 << 20, size=2000)
    qs = [0.1, 0.5, 0.9]
    ones = np.ones(len(vals), np.int64)
    assert radix_weighted_quantiles(
        _wds(vals, ones), "cents", "w", qs
    ) == radix_quantiles(_ds(vals), "cents", qs)


def test_weighted_empty_and_all_zero(ray_session):
    assert radix_weighted_quantiles(
        _wds([], [], blocks=1), "cents", "w", [0.5]
    ) is None
    assert radix_weighted_quantiles(
        _wds([5, 6], [0, 0], blocks=1), "cents", "w", [0.5]
    ) is None


# ---------------------------------------------------------------------------
# radix_heavy_hitters
# ---------------------------------------------------------------------------

from rsmetacheck_ray.functions.selection import radix_heavy_hitters


def test_heavy_hitters_exact_threshold_boundary(ray_session):
    # N = 100: 40x a, 30x b, 29 distinct fillers, 1x c. phi=0.3 ->
    # thr = 30: a and b survive (b EXACTLY at the threshold), c and
    # fillers don't. Values span multiple high buckets.
    vals = (
        [70_000] * 40 + [5] * 30 + [1_000_000 + i for i in range(29)] + [9]
    )
    t = radix_heavy_hitters(_ds(np.array(vals)), "cents", 0.3)
    assert t.to_pydict() == {"value": [70_000, 5], "n": [40, 30]}


def test_heavy_hitters_tie_order_and_none(ray_session):
    # equal counts order by value ascending
    t = radix_heavy_hitters(_ds(np.array([7, 7, 3, 3])), "cents", 0.5)
    assert t.to_pydict() == {"value": [3, 7], "n": [2, 2]}
    assert radix_heavy_hitters(
        _ds(np.array([], np.int64), blocks=1), "cents", 0.5
    ) is None


def test_heavy_hitters_no_survivors(ray_session):
    t = radix_heavy_hitters(
        _ds(np.arange(100, dtype=np.int64)), "cents", 0.5
    )
    assert t.num_rows == 0
