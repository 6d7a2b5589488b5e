"""Deterministic corpus shuffle into training shards — the global
pseudo-random permutation every pretraining job applies before writing
shards, WITHOUT ``Dataset.random_shuffle()``'s full all-to-all of the
document payloads (and with a reproducible, seed-free order).

Plan (the stratified-sample rank discipline, functions/sampling.py):

 - every document gets rank ``md5(str(doc_id))`` — a machine- and
   parallelism-independent pseudo-random permutation that DuckDB
   reproduces verbatim, so the whole operator sits behind a SQL
   ``row_number() OVER (PARTITION BY shard ORDER BY rank, id)`` oracle;
 - its SHARD is the first two hex digits of that rank folded modulo
   ``n_shards`` (uniform for n_shards ≤ 256; shards are the unit a
   trainer streams, so 256 is plenty per writer — nest another level
   for more);
 - ONE shuffle moves only the 80-byte ``(id, rank, shard)`` projection
   onto the hashed shard partition; each ``map_groups`` call orders
   every shard of its partition in one lexsort and emits the 0-based
   ``pos`` — the (shard, pos) address a writer uses to lay files out.
   Documents themselves never shuffle: the trainer-side writer joins
   the address back by id or streams per shard with a pushed-down
   filter.

A shard must fit one worker for the per-partition lexsort — the same
contract as sequence packing (functions/packing.py); size ``n_shards``
so corpus_bytes / n_shards stays inside the worker budget.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from .sampling import _md5_ranks

DEFAULT_N_SHARDS = 16

_HEX = "0123456789abcdef"


def _ranks_and_shards(
    ids: np.ndarray, n_shards: int
) -> tuple[np.ndarray, np.ndarray]:
    # the SAME md5 rank permutation as stratified sampling (one
    # definition, functions/sampling.py — oracle-critical)
    ranks = _md5_ranks(ids)
    # first two hex digits -> 0..255, folded (matches the oracle's
    # strpos digit arithmetic)
    shards = np.array(
        [int(r[:2], 16) % n_shards for r in ranks], dtype=np.int64
    )
    return ranks, shards


def shuffle_to_shards(
    ds: rd.Dataset,
    n_shards: int = DEFAULT_N_SHARDS,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(doc_id, shard, pos, shuffle_rank): a deterministic global
    pseudo-random shuffle address for every document. ``pos`` is the
    0-based position within the shard under the (rank, id) total
    order."""
    if not 1 <= n_shards <= 256:
        raise ValueError("n_shards must be in [1, 256] (two hex digits)")
    from ..partitioning import adaptive_partitions, parquet_rows_hint

    n_parts = min(
        n_shards,
        num_partitions
        or adaptive_partitions(parquet_rows_hint(ds), row_bytes=80),
    )

    def project(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ranks, shards = _ranks_and_shards(ids, n_shards)
        return pa.table(
            {
                "part": pa.array(shards % n_parts, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "shard": pa.array(shards, pa.int64()),
                "shuffle_rank": pa.array(ranks, pa.string()),
            }
        )

    def order_partition(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        shards = group.column("shard").to_numpy(zero_copy_only=False)
        ranks = np.asarray(group.column("shuffle_rank").to_pylist(), dtype=object)
        order = np.lexsort((ids, ranks, shards))
        s_sorted = shards[order]
        # 0-based position within each shard segment of the lexsort
        starts = np.concatenate(([True], s_sorted[1:] != s_sorted[:-1]))
        seg_id = np.cumsum(starts) - 1
        seg_first = np.flatnonzero(starts)
        pos = np.arange(len(s_sorted)) - seg_first[seg_id]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "shard": pa.array(s_sorted, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "shuffle_rank": pa.array(ranks[order], pa.string()),
            }
        )

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("part")
        .map_groups(order_partition, batch_format="pyarrow")
    )


def sql_shard_expr(id_expr: str = "doc_id", n_shards: int = DEFAULT_N_SHARDS) -> str:
    """The shard derivation as DuckDB SQL — the oracle side."""
    c1 = f"strpos('{_HEX}', substr(md5(CAST({id_expr} AS VARCHAR)), 1, 1)) - 1"
    c2 = f"strpos('{_HEX}', substr(md5(CAST({id_expr} AS VARCHAR)), 2, 1)) - 1"
    return f"(({c1}) * 16 + ({c2})) % {n_shards}"
