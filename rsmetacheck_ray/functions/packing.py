"""Sequence packing — map each document onto the fixed-length training
sequences it will occupy (the concat-then-chunk batching step every
pretraining pipeline runs after the quality gate and dedup: documents
in a shard are concatenated in doc-id order and the token stream is
cut into ``seq_len``-token sequences).

The reference has no analog (SURVEY §2 ends at per-document scoring);
this completes the engine's gate → dedup → balance → PACK chain.

Semantics (oracle-checked in SQL): within each shard
(``doc_id // shard_size`` — the unit a trainer reads), documents are
ordered by doc id; a document whose span of the concatenated token
stream is [start, start+n) occupies sequences ``start // seq_len``
through ``(start+n-1) // seq_len``. Zero-token documents occupy no
sequence and are omitted.

Scale plan: the only shuffle is the 32-byte (doc_id, n_tokens, shard,
part)
projection onto a size-adaptive HASHED SHARD PARTITION; each
``map_groups`` call computes every shard of its partition in one
lexsort + segment-reset cumulative sum (the sessionize discipline —
Python-call count is O(#partitions), not O(#shards)). Token counting
is the vectorized RE2 pass of functions/tokenize.py; the text never
shuffles. Packing is shard-local by construction, exactly like the
training shards it models, so a 100 TB corpus packs embarrassingly
parallel."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .hashing import splitmix64_np
from .tokenize import count_ws_tokens

DEFAULT_SEQ_LEN = 1024
DEFAULT_SHARD_SIZE = 4096


def pack_sequences(
    ds: rd.Dataset,
    seq_len: int = DEFAULT_SEQ_LEN,
    shard_size: int = DEFAULT_SHARD_SIZE,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(id, shard, n_tokens, seq_first, seq_last) per non-empty doc."""
    from ..partitioning import adaptive_partitions, parquet_rows_hint

    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(ds), row_bytes=32
    )

    def tag(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        text = b.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        nt = count_ws_tokens(pc.fill_null(text, "")).to_numpy(
            zero_copy_only=False
        )
        shard = ids // shard_size
        part = (splitmix64_np(shard.astype(np.uint64)) % n_parts).astype(
            np.int64
        )
        keep = nt > 0
        return pa.table(
            {
                "part": pa.array(part[keep]),
                id_col: pa.array(ids[keep]),
                "shard": pa.array(shard[keep]),
                "n_tokens": pa.array(nt[keep]),
            }
        )

    def pack_part(g: pa.Table) -> pa.Table:
        n = len(g)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "shard": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "seq_first": pa.array([], pa.int64()),
                    "seq_last": pa.array([], pa.int64()),
                }
            )
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        shard = g.column("shard").to_numpy(zero_copy_only=False)
        nt = g.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, shard))
        ids, shard, nt = ids[order], shard[order], nt[order]
        # per-shard exclusive cumsum via one global cumsum with a
        # segment reset at every shard boundary
        csum = np.concatenate([[0], np.cumsum(nt)[:-1]])
        new_shard = np.empty(n, dtype=bool)
        new_shard[0] = True
        new_shard[1:] = shard[1:] != shard[:-1]
        seg_base = csum[new_shard][np.cumsum(new_shard) - 1]
        start = csum - seg_base
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "shard": pa.array(shard, pa.int64()),
                "n_tokens": pa.array(nt.astype(np.int64), pa.int64()),
                "seq_first": pa.array(start // seq_len, pa.int64()),
                "seq_last": pa.array((start + nt - 1) // seq_len, pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pack_part, batch_format="pyarrow")
    )
