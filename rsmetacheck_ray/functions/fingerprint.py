"""Content-defined document fingerprinting — the rolling-hash chunker
(Rabin-Karp / FastCDC family) the training-data pipeline uses for
PARTIAL-overlap dedup: two documents sharing a long span share the
chunk hashes inside that span even when offsets differ, which exact
content hashing (functions/dedup._hash_stage) cannot see.

Math is wraparound uint64 (exact, deterministic): with an odd
multiplier P the window hash

    H(i) = Σ_{j<w} b[i+j] · P^(w-1-j)   (mod 2^64)

is computed for EVERY position in one vectorized pass via the
prefix-sum trick  H(i) = (S[i+w] − S[i]) · P^(i+w−1)  where
S[k] = Σ_{j<k} b[j] · P^(−j)  and P^(−1) is the modular inverse of P
mod 2^64 (P odd ⇒ invertible). Chunk boundaries fall where
``H(i) % 2^mask_bits == 0`` subject to (min, max) chunk bounds, so the
expected chunk length is ``2^mask_bits`` bytes. Chunk content hashes
are C-speed blake2b.

All constants are module-level so the chunking is stable across runs,
machines and parallelism (the FIXTURES.md determinism rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from .hashing import hash_bytes_u64

_P = np.uint64(0x100000001B3)  # FNV-1a prime (odd -> invertible mod 2^64)
_WINDOW = 48
_MASK_BITS = 9        # expected chunk ~512 bytes
_MIN_CHUNK = 128
_MAX_CHUNK = 4096


def _modinv_u64(a: int) -> int:
    """Inverse of odd a mod 2^64 (Newton iteration doubles precision)."""
    x = a  # 3 correct bits
    for _ in range(6):
        x = (x * (2 - a * x)) % (1 << 64)
    return x


_P_INV = np.uint64(_modinv_u64(int(_P)))
_MASK = np.uint64((1 << _MASK_BITS) - 1)


def _rolling_hashes(b: np.ndarray) -> np.ndarray:
    """H(i) for every window start i (len(b) - _WINDOW + 1 values)."""
    n = len(b)
    with np.errstate(over="ignore"):
        idx = np.arange(n, dtype=np.uint64)
        # P^(-i) and P^(i) via wrapping cumulative products
        pinv_pows = np.concatenate(
            [[np.uint64(1)], np.multiply.accumulate(np.full(n - 1, _P_INV, np.uint64))]
        ) if n > 1 else np.array([1], np.uint64)
        p_pows = np.concatenate(
            [[np.uint64(1)], np.multiply.accumulate(np.full(n - 1, _P, np.uint64))]
        ) if n > 1 else np.array([1], np.uint64)
        a = b.astype(np.uint64) * pinv_pows
        prefix = np.concatenate([[np.uint64(0)], np.add.accumulate(a)])
        w = _WINDOW
        span = prefix[w:] - prefix[: n - w + 1]
        return span * p_pows[w - 1 :]


def chunk_boundaries(data: bytes) -> list[int]:
    """Chunk end offsets (exclusive) for one document's bytes."""
    n = len(data)
    if n <= _MIN_CHUNK:
        return [n] if n else []
    b = np.frombuffer(data, dtype=np.uint8)
    h = _rolling_hashes(b)
    # candidate cut positions: window END offsets where the hash lands
    # on the boundary pattern
    cand = np.nonzero((h & _MASK) == 0)[0] + _WINDOW
    out: list[int] = []
    last = 0
    for c in cand:
        if c - last < _MIN_CHUNK:
            continue
        while c - last > _MAX_CHUNK:
            last += _MAX_CHUNK
            out.append(last)
        # a forced max-split may leave less than a minimum chunk before
        # this candidate — skip the candidate rather than emit a runt
        if c - last < _MIN_CHUNK:
            continue
        out.append(int(c))
        last = int(c)
    while n - last > _MAX_CHUNK:
        last += _MAX_CHUNK
        out.append(last)
    if n > last:
        out.append(n)
    return out


def doc_chunks(doc_id: int, text: str) -> list[tuple[int, int, int, int]]:
    """(doc_id, chunk_idx, chunk_hash, chunk_len) rows for one doc."""
    data = (text or "").encode("utf-8")
    rows = []
    start = 0
    for idx, end in enumerate(chunk_boundaries(data)):
        ch = hash_bytes_u64(data[start:end])
        rows.append((doc_id, idx, ch - (1 << 63), end - start))
        start = end
    return rows


def chunk_fingerprints(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """One row per (doc, chunk): content-defined chunk fingerprints.
    Downstream partial-dup detection is ONE groupby(chunk_hash) over
    this tiny projection (hash + ids), the same shuffle discipline as
    exact dedup — the text never shuffles."""

    def stage(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_d, out_i, out_h, out_l = [], [], [], []
        for d, t in zip(ids, texts):
            for row in doc_chunks(d, t):
                out_d.append(row[0])
                out_i.append(row[1])
                out_h.append(row[2])
                out_l.append(row[3])
        return pa.table(
            {
                id_col: pa.array(out_d, pa.int64()),
                "chunk_idx": pa.array(out_i, pa.int64()),
                "chunk_hash": pa.array(out_h, pa.int64()),
                "chunk_len": pa.array(out_l, pa.int64()),
            }
        )

    return ds.map_batches(stage, batch_format="pyarrow")


# A chunk shared by more than this many documents is boilerplate (a
# common header/footer) and carries ~no overlap signal; cap its pair
# expansion like an LSH hot bucket and log the truncation.
MAX_CHUNK_GROUP_DOCS = 256


def _chunk_partitions(ds, num_partitions: int | None) -> int:
    """Partition count for the (chunk_hash, id) shuffle, sized from the
    input's parquet footers: expected chunk rows ≈ uncompressed bytes /
    2^mask_bits (the expected chunk length). Falls back to the floor
    when the dataset has no parquet lineage (union corpora) — callers
    that know the corpus size pass ``num_partitions``."""
    from ..partitioning import adaptive_partitions, parquet_bytes_hint

    if num_partitions:
        return num_partitions
    nbytes = parquet_bytes_hint(ds)
    est_rows = nbytes // (1 << _MASK_BITS) if nbytes else None
    return adaptive_partitions(est_rows, row_bytes=24)  # (id, hash, part)


def partial_overlap_pairs(
    ds: rd.Dataset,
    min_shared_chunks: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_group_docs: int = MAX_CHUNK_GROUP_DOCS,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """ALL document pairs sharing ≥ ``min_shared_chunks`` content-
    defined chunks — including pairs where neither member is the
    group's min id (a star construction would silently miss those).
    Per-chunk pair expansion is quadratic in group size, so hot
    boilerplate chunks are capped at ``max_group_docs`` members with a
    logged truncation; only (hash, id) 16-byte rows ever shuffle, on a
    64-way hashed partition of the chunk hash (one Python call per
    partition, not per chunk)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    from .hashing import splitmix64_np

    chunks = chunk_fingerprints(ds, text_col, id_col).select_columns(
        [id_col, "chunk_hash"]
    )

    n_parts = _chunk_partitions(ds, num_partitions)

    def with_part(b: pa.Table) -> pa.Table:
        k = b.column("chunk_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (splitmix64_np(k) % n_parts).astype(np.int64)
        return b.append_column("cpart", pa.array(part, pa.int64()))

    def group_pairs_part(group: pa.Table) -> pa.Table:
        keys = group.column("chunk_hash").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys))
        keys, ids = keys[order], ids[order]
        n = len(keys)
        seg_starts = (
            np.nonzero(np.concatenate([[True], keys[1:] != keys[:-1]]))[0]
            if n
            else np.array([], np.int64)
        )
        seg_ends = np.append(seg_starts[1:], n)
        a_out, b_out = [], []
        for s, e in zip(seg_starts, seg_ends):
            # all rows of a chunk_hash land in this segment, so a local
            # unique IS the global distinct-(doc, chunk) dedup — no
            # extra shuffle needed for repeated chunks within one doc
            u = np.unique(ids[s:e])
            m = len(u)
            if m < 2:
                continue
            if m > max_group_docs:
                print(
                    f"[partial_overlap] boilerplate chunk truncated: {m} -> "
                    f"{max_group_docs} docs"
                )
                u = u[:max_group_docs]
                m = max_group_docs
            ai, bj = np.triu_indices(m, 1)
            a_out.append(u[ai])
            b_out.append(u[bj])
        if not a_out:
            return pa.table(
                {
                    "doc_id_a": pa.array([], pa.int64()),
                    "doc_id_b": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id_a": pa.array(np.concatenate(a_out), pa.int64()),
                "doc_id_b": pa.array(np.concatenate(b_out), pa.int64()),
            }
        )

    pairs = (
        chunks.map_batches(with_part, batch_format="pyarrow")
        .groupby("cpart")
        .map_groups(group_pairs_part, batch_format="pyarrow")
    )
    counted = pairs.groupby(["doc_id_a", "doc_id_b"]).aggregate(
        Count(alias_name="shared_chunks")
    )

    def thresh(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.greater_equal(b.column("shared_chunks"), min_shared_chunks)
        )

    return counted.map_batches(thresh, batch_format="pyarrow")
