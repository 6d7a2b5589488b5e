"""Size-adaptive partition counts for hashed-partition shuffles.

Every keyed shuffle in the engine (as-of join, range join,
sessionization, anti-join, the LSH/chunk pair stages) groups on a
HASHED KEY PARTITION so Python is invoked once per partition, not once
per key. Each ``groupby(part).map_groups`` call materializes ONE
partition in one worker's memory — so the partition count must grow
with the input: a fixed 64 puts 1/64 of a 10¹²-row projection
(~250 GB) in a single worker at 100 TB scale.

This module derives the count from the input size instead:

 - ``parquet_rows_hint`` / ``parquet_bytes_hint`` read ONLY parquet
   footers of the dataset's input files (no data pass, the
   ``nation_order_stats`` metadata pattern);
 - ``adaptive_partitions`` sizes the count so one partition's rows ×
   bytes-per-row fits a worker-memory budget, with a parallelism floor
   and a sanity ceiling.

Every operator that hash-partitions exposes ``num_partitions=None``
and falls back to the floor when no metadata hint exists (non-parquet
sources) — correct at any count, memory-safe when sized.
"""

from __future__ import annotations

# One partition is one in-worker lexsort: budget ~256 MB of row payload
# per partition so partition × concurrency fits a worker heap with room
# for the sort's transient copies.
TARGET_PARTITION_BYTES = 256 << 20
MIN_PARTITIONS = 64        # parallelism floor; costs ~nothing when small
MAX_PARTITIONS = 1 << 20   # sanity ceiling (10¹² rows × 32 B ⇒ ~131k parts)


def adaptive_partitions(
    n_rows: int | None,
    row_bytes: int = 32,
    target_partition_bytes: int = TARGET_PARTITION_BYTES,
    min_partitions: int = MIN_PARTITIONS,
    max_partitions: int = MAX_PARTITIONS,
) -> int:
    """Partition count such that the EXPECTED per-partition payload
    (hash-uniform keys) stays under ``target_partition_bytes``.

    ``n_rows`` is the number of rows entering the shuffle (after any
    per-row fan-out, e.g. ×N_BANDS for LSH band rows); ``row_bytes``
    the approximate shuffled row width. ``None`` (no metadata hint)
    falls back to the floor — correct, not memory-sized.
    """
    if not n_rows or n_rows <= 0:
        return min_partitions
    rows_per_part = max(1, target_partition_bytes // max(1, row_bytes))
    need = -(-n_rows // rows_per_part)  # ceil
    return max(min_partitions, min(max_partitions, need))


def parquet_rows_hint(ds) -> int | None:
    """Total row count of the dataset's parquet input files, from
    footers only (free — no data pass). ``None`` when the dataset has
    no resolvable parquet inputs (e.g. ``from_arrow`` branches).

    NB: for a dataset with row-expanding/filtering transforms this is
    the SOURCE row count — an order-of-magnitude hint for partition
    sizing, which is all the policy needs.
    """
    try:
        files = [f for f in (ds.input_files() or []) if f.endswith(".parquet")]
    except Exception:
        return None
    if not files:
        return None
    import pyarrow.parquet as pq

    total = 0
    for f in files:
        try:
            total += pq.ParquetFile(f).metadata.num_rows
        except Exception:
            return None
    return total or None


def parquet_bytes_hint(ds) -> int | None:
    """Total UNCOMPRESSED byte size of the dataset's parquet inputs
    (sum of row-group ``total_byte_size`` footers). ``None`` when not
    resolvable."""
    try:
        files = [f for f in (ds.input_files() or []) if f.endswith(".parquet")]
    except Exception:
        return None
    if not files:
        return None
    import pyarrow.parquet as pq

    total = 0
    for f in files:
        try:
            md = pq.ParquetFile(f).metadata
            total += sum(
                md.row_group(i).total_byte_size for i in range(md.num_row_groups)
            )
        except Exception:
            return None
    return total or None


def small_read_blocks(path) -> int | None:
    """Block-count override for SMALL parquet reads. Ray's default
    splitting targets ~2×CPU blocks regardless of input size, so a
    small table enters every downstream shuffle as dozens of
    micro-blocks and the sort machinery's per-block fixed cost — not
    data volume — dominates wall time (measured: collapsing a 500-row
    read from 64 to 16 blocks cut the gram-shuffle query 8.8 s →
    1.8 s at identical output). Small inputs read as ceil(rows/4096)
    blocks (floor 4 for parallelism); inputs ≥ 2¹⁸ rows return None —
    Ray's auto policy is right at scale and the override never
    triggers there."""
    try:
        import pyarrow.parquet as pq

        rows = pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None
    if rows >= (1 << 18):
        return None
    return max(4, -(-rows // 4096))


def read_pq(path, **kw):
    """``ray.data.read_parquet`` with the small-input block override
    applied — the one place the policy lives."""
    import ray.data as rd

    return rd.read_parquet(
        path, override_num_blocks=small_read_blocks(path), **kw
    )
