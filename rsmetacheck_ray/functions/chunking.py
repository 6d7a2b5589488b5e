"""Fixed-size token chunking — the context-window splitter every
training-data / retrieval pipeline runs (long document → ≤ C-token
chunks with stable per-document ordinals).

Row-EXPANDING text operator (the flat_map shape): one input document
becomes ``ceil(n_tokens / C)`` chunk rows. Semantics (frozen, SQL
oracle ``chunk_tokens``):

 - tokens    = canonical whitespace split (``tokenize.WS_TOKEN_RE``)
 - chunk i   = tokens [i·C, (i+1)·C), in order; last chunk ragged
 - chunk_text = the chunk's tokens joined with single spaces (the
   canonical whitespace form — byte-identical to DuckDB's
   ``string_agg(w, ' ' ORDER BY i)``)
 - empty / whitespace-only documents emit no rows

Fully vectorized, and shuffle-FREE: a document is one row of one
batch, so its chunks are batch-local — token positions, chunk
boundaries and the joined text all come from one pass of Arrow/numpy
kernels (``ListArray`` offsets + ``pc.binary_join``), zero
Python-per-row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .tokenize import tokens_with_doc_index

DEFAULT_CHUNK_TOKENS = 64

_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("chunk_idx", pa.int64()),
        ("chunk_text", pa.string()),
        ("n_tokens", pa.int64()),
    ]
)


def chunk_tokens(
    ds: rd.Dataset,
    chunk_size: int = DEFAULT_CHUNK_TOKENS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """(doc_id, chunk_idx, chunk_text, n_tokens) — every document
    split into consecutive ``chunk_size``-token windows."""
    if chunk_size < 1:
        raise ValueError("chunk_size must be >= 1")

    def stage(b: pa.Table) -> pa.Table:
        ids = pc.cast(b.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        doc_idx, denc = tokens_with_doc_index(b.column(text_col))
        if denc is None:
            return _OUT_SCHEMA.empty_table()
        flat = pc.take(denc.dictionary, denc.indices)  # token strings
        n = len(doc_idx)
        # position of each token within its document
        doc_starts = np.flatnonzero(
            np.concatenate(([True], doc_idx[1:] != doc_idx[:-1]))
        )
        pos = np.arange(n, dtype=np.int64) - np.repeat(
            doc_starts, np.diff(np.append(doc_starts, n))
        )
        chunk_id = pos // chunk_size
        # chunk boundaries: a new doc or a new chunk ordinal
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = (doc_idx[1:] != doc_idx[:-1]) | (
            chunk_id[1:] != chunk_id[:-1]
        )
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, n))
        offsets = pa.array(
            np.concatenate((starts, [n])).astype(np.int32), pa.int32()
        )
        texts = pc.binary_join(
            pa.ListArray.from_arrays(offsets, flat), " "
        )
        return pa.table(
            {
                "doc_id": pa.array(ids[doc_idx[starts]], pa.int64()),
                "chunk_idx": pa.array(chunk_id[starts], pa.int64()),
                "chunk_text": texts,
                "n_tokens": pa.array(lens, pa.int64()),
            }
        )

    return ds.map_batches(stage, batch_format="pyarrow")
