"""Mergeable cardinality sketch — HyperLogLog distinct counting for
the wide aggregations an exact distributed distinct cannot afford at
10¹² rows (distinct hosts / users / content hashes).

Design (Flajolet et al. 2007, with the standard small-range linear
counting correction): 2^P registers; each value hashes to a register
(top P bits) and a rank (leading-zero count of the remaining bits + 1);
a partial sketch per batch is the elementwise register MAX, which is
associative and commutative — so partials merge in any order, making
the operator a textbook Ray Data partial-combine: ``map_batches``
emits ONE 2^P-byte row per block, and the final merge touches
#blocks rows, never the data.

Deterministic: value hashing is splitmix64 (functions/hashing.py), so
the estimate is a pure function of the value multiset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from .hashing import splitmix64_np

P_BITS = 12
N_REGS = 1 << P_BITS
# alpha_m for m >= 128 (standard HLL constant)
_ALPHA = 0.7213 / (1.0 + 1.079 / N_REGS)


def hll_registers(values: np.ndarray) -> np.ndarray:
    """Register array (uint8, len 2^P) for one batch of int64 values."""
    regs = np.zeros(N_REGS, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = splitmix64_np(values.astype(np.uint64))
    idx = (h >> np.uint64(64 - P_BITS)).astype(np.int64)
    w = h & np.uint64((1 << (64 - P_BITS)) - 1)
    # bit_length via frexp: w < 2^52 is exact in float64
    wf = w.astype(np.float64)
    _, exp = np.frexp(wf)
    rank = np.where(w == 0, (64 - P_BITS) + 1, (64 - P_BITS) - exp + 1).astype(
        np.uint8
    )
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(blobs: list[bytes]) -> np.ndarray:
    regs = np.zeros(N_REGS, dtype=np.uint8)
    for b in blobs:
        regs = np.maximum(regs, np.frombuffer(b, dtype=np.uint8))
    return regs


def hll_estimate(regs: np.ndarray) -> int:
    m = float(N_REGS)
    est = _ALPHA * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting (small range)
    return int(round(est))


def approx_distinct(ds: rd.Dataset, col: str) -> int:
    """Approximate distinct count of an int64 column.

    One 4 KiB partial per block; the driver merges #blocks partials —
    bounded by block count, never by row count (the documented
    exception to no-driver-materialization: the materialized set IS
    the sketch, constant-size per block)."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        return pa.table(
            {"regs": pa.array([hll_registers(vals).tobytes()], pa.binary())}
        )

    blobs = [
        r["regs"]
        for r in ds.select_columns([col]).map_batches(
            partial, batch_format="pyarrow"
        ).take_all()
    ]
    return hll_estimate(hll_merge(blobs))


def approx_distinct_table(ds: rd.Dataset, col: str) -> pa.Table:
    """Driver-contract-friendly wrapper: one-row result table."""
    return pa.table(
        {"approx_distinct": pa.array([approx_distinct(ds, col)], pa.int64())}
    )
