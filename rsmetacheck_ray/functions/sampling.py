"""Stratified (per-key quota) sampling — the corpus-balancing step a
training-data pipeline runs after the quality gate: cap every host /
language / source at ``k`` documents so mega-hosts don't dominate the
kept corpus (the same Zipf skew stages/skew.py aggregates over).

Deterministic rank-based quota, NOT a reservoir: each row's rank is
``md5(str(id))`` — a seed-free pseudo-random permutation that is (a)
identical on every machine and at every parallelism, and (b)
SQL-expressible (``md5(CAST(doc_id AS VARCHAR))``), so the whole
operator sits behind a DuckDB ``QUALIFY row_number() OVER (PARTITION
BY key ORDER BY rank, id) <= k`` oracle. A ``limit``-style first-k
would bias the sample toward whatever ordered the input; a random
reservoir would not be reproducible across runs or cluster layouts.

Scale shape (100 TB discipline):

 - stage 1 (``map_batches``): rank + IN-BATCH prune to ≤ k rows per
   key per batch — the partial-combine pattern; a host with 10⁹ pages
   ships k rows per block, not 10⁹, into the shuffle;
 - stage 2: ONE shuffle on the hashed key partition
   (``groupby(part).map_groups``, partition count size-adaptive via
   ``partitioning.adaptive_partitions``), a vectorized per-partition
   lexsort + segment-boundary first-k — one Python call per
   PARTITION, not per key.

Per-key quota overrides (``quotas``) ride along as a small broadcast
dict for the weighted variant (e.g. lang-proportional targets).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

from .hashing import hash_bytes_u64


def _md5_ranks(ids: np.ndarray) -> np.ndarray:
    """Rank strings ``md5(str(id))`` — one C call per row; kept md5
    (not a vectorized hash) so DuckDB reproduces the permutation."""
    return np.array(
        [hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids],
        dtype=object,
    )


def _first_k_per_key(
    keys: np.ndarray, ranks: np.ndarray, ids: np.ndarray, k: int, quotas: dict | None
) -> np.ndarray:
    """Indices of the ≤ quota smallest (rank, id) rows per key."""
    order = np.lexsort((ids, ranks, keys))
    sk = keys[order]
    # segment boundaries of equal keys in sorted order
    starts = np.flatnonzero(np.concatenate(([True], sk[1:] != sk[:-1])))
    ends = np.concatenate((starts[1:], [len(sk)]))
    take = []
    for s, e in zip(starts, ends):
        quota = quotas.get(sk[s], k) if quotas else k
        take.append(order[s : s + min(quota, e - s)])
    if not take:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(take)


def stratified_sample(
    ds: rd.Dataset,
    key_col: str,
    k: int,
    id_col: str = "doc_id",
    quotas: dict | None = None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """≤ ``k`` deterministically-sampled rows per distinct ``key_col``
    value (``quotas`` overrides k per key). Output columns:
    ``(id_col, key_col, sample_rank)``, ``sample_rank`` = the row's
    md5 rank string (1-based order within the key is implied by it)."""
    from ..partitioning import adaptive_partitions, parquet_rows_hint

    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(ds), row_bytes=64
    )

    def prune(batch: pa.Table) -> pa.Table:
        keys = np.asarray(
            [s if s is not None else "" for s in batch.column(key_col).to_pylist()],
            dtype=object,
        )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ranks = _md5_ranks(ids)
        idx = _first_k_per_key(keys, ranks, ids, k, quotas)
        # partition hash must be DETERMINISTIC across worker processes
        # (builtin hash() is seed-randomized) — blake2b per UNIQUE key
        uk, inv = np.unique(keys[idx], return_inverse=True)
        uh = np.array(
            [hash_bytes_u64(s.encode("utf-8")) for s in uk], dtype=np.uint64
        )
        part = (uh[inv] % np.uint64(n_parts)).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(part),
                id_col: pa.array(ids[idx], pa.int64()),
                key_col: pa.array(keys[idx], pa.string()),
                "sample_rank": pa.array(ranks[idx], pa.string()),
            }
        )

    pruned = ds.map_batches(prune, batch_format="pyarrow")

    def finish(group: pa.Table) -> pa.Table:
        keys = np.asarray(group.column(key_col).to_pylist(), dtype=object)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        ranks = np.asarray(group.column("sample_rank").to_pylist(), dtype=object)
        idx = _first_k_per_key(keys, ranks, ids, k, quotas)
        return pa.table(
            {
                id_col: pa.array(ids[idx], pa.int64()),
                key_col: pa.array(keys[idx], pa.string()),
                "sample_rank": pa.array(ranks[idx], pa.string()),
            }
        )

    return pruned.groupby("part").map_groups(finish, batch_format="pyarrow")
