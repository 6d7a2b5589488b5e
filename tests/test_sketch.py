"""HyperLogLog sketch tests: accuracy vs the exact distinct across
cardinality ranges, order-independent merging, and the Ray partial-
combine pipeline over the driver tables."""

from __future__ import annotations

import numpy as np

from rsmetacheck_ray.functions import sketch as sk


def test_accuracy_across_ranges():
    for n in (50, 1_000, 50_000, 500_000):
        vals = np.arange(n, dtype=np.int64) * 7919 + 13
        est = sk.hll_estimate(sk.hll_registers(vals))
        assert abs(est - n) / n < 0.05, (n, est)


def test_merge_is_order_independent_and_idempotent():
    vals = np.arange(10_000, dtype=np.int64) * 31 + 7
    shards = np.array_split(vals, 13)
    blobs = [sk.hll_registers(s).tobytes() for s in shards]
    a = sk.hll_estimate(sk.hll_merge(blobs))
    b = sk.hll_estimate(sk.hll_merge(list(reversed(blobs))))
    c = sk.hll_estimate(sk.hll_merge(blobs + blobs))  # re-merge = no-op
    assert a == b == c
    # merged shards == single-pass sketch
    single = sk.hll_estimate(sk.hll_registers(vals))
    assert a == single


def test_approx_distinct_pipeline(ray_session):
    import pyarrow as pa
    import ray.data as rd

    n, dups = 20_000, 3
    vals = np.repeat(np.arange(n, dtype=np.int64) * 101 + 5, dups)
    ds = rd.from_arrow(pa.table({"user_id": pa.array(vals, pa.int64())})).repartition(8)
    est = sk.approx_distinct(ds, "user_id")
    assert abs(est - n) / n < 0.05, est
