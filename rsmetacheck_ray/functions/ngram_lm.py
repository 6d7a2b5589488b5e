"""Distributed n-gram language-model estimation — corpus-wide word
bigram counts and conditional probabilities p(w2 | w1).

The perplexity gate stage (stages/perplexity.py) SCORES documents with
a model trained once per actor on a fixed synthetic corpus; this
operator is the TRAINING side at corpus scale — the "build the LM from
your own data" pass of a KenLM-style pipeline (count collection; the
reference has no analog, its checks are per-document).

ONE shuffle, partial-combined, context-complete by construction:

 - per batch: ONE canonical ``\\S+`` split (``tokens_with_doc_index``),
   bigrams formed positionally WITHIN each document (no cross-document
   bigrams), combined in-batch over the batch's unique (w1, w2)
   vocabulary (Zipf ⇒ partials ≪ token count);
 - partials are keyed by ``hash(w1) % n_parts`` — every bigram of a
   given CONTEXT word lands in one partition, so the per-partition
   pass computes exact context totals and ``p = n / total(w1)`` with
   no second shuffle and no broadcast. The division is one float64 op
   on exact int64 counts — bit-identical to the SQL oracle's.
 - ``min_count`` prunes the long tail AFTER totals are taken (the
   probabilities stay exact conditionals of the full distribution).

Python-call count is O(#partitions); everything per-partition is
Arrow ``group_by`` + numpy ``bincount`` over dictionary codes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .hashing import hash_str_arrow_u128
from .tokenize import tokens_with_doc_index

_LM_SCHEMA = pa.schema(
    [
        ("w1", pa.string()),
        ("w2", pa.string()),
        ("n", pa.int64()),
        ("p", pa.float64()),
    ]
)


def _batch_bigram_partials(
    arr: pa.Array | pa.ChunkedArray, n_parts: int
) -> pa.Table:
    """Per-batch (wpart, w1, w2, n) partial counts over the batch's
    unique bigram vocabulary."""
    empty = pa.table(
        {
            "wpart": pa.array([], pa.int64()),
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )
    doc_idx, denc = tokens_with_doc_index(arr)
    if denc is None or len(doc_idx) < 2:
        return empty
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    within = doc_idx[:-1] == doc_idx[1:]
    if not within.any():
        return empty
    c1, c2 = codes[:-1][within], codes[1:][within]
    v = len(denc.dictionary)
    pair, counts = np.unique(c1 * v + c2, return_counts=True)
    w1 = denc.dictionary.take(pa.array(pair // v, pa.int64()))
    w2 = denc.dictionary.take(pa.array(pair % v, pa.int64()))
    h, _ = hash_str_arrow_u128(w1)
    return pa.table(
        {
            "wpart": pa.array((h % np.uint64(n_parts)).astype(np.int64)),
            "w1": w1,
            "w2": w2,
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def _partition_lm(group: pa.Table, min_count: int) -> pa.Table:
    """One context partition: merge partials, take exact per-context
    totals, emit conditional probabilities, THEN prune."""
    if group.num_rows == 0:
        return _LM_SCHEMA.empty_table()
    g = group.group_by(["w1", "w2"]).aggregate([("n", "sum")])
    n = g.column("n_sum").to_numpy(zero_copy_only=False).astype(np.int64)
    w1 = g.column("w1")
    if isinstance(w1, pa.ChunkedArray):
        w1 = w1.combine_chunks()
    codes = w1.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    # exact int64 context totals (float bincount weights would round
    # past 2^53; the oracle's SUM is exact), then ONE float64 division
    totals = np.zeros(int(codes.max()) + 1, np.int64)
    np.add.at(totals, codes, n)
    p = n.astype(np.float64) / totals[codes].astype(np.float64)
    keep = n >= min_count
    return pa.table(
        {
            "w1": g.column("w1").filter(pa.array(keep)),
            "w2": g.column("w2").filter(pa.array(keep)),
            "n": pa.array(n[keep], pa.int64()),
            "p": pa.array(p[keep], pa.float64()),
        }
    )


def train_bigram_lm(
    ds: rd.Dataset,
    text_col: str = "text",
    min_count: int = 1,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(w1, w2, n, p) — corpus bigram counts and exact conditional
    probabilities, pruned to ``n >= min_count`` after totalling."""
    from ..partitioning import adaptive_partitions, parquet_rows_hint

    hint = parquet_rows_hint(ds)
    # partial rows are bounded by per-batch bigram vocabulary; ~40 B
    # per shuffled row (two short words + two ints)
    n_parts = num_partitions or adaptive_partitions(
        hint * 64 if hint else None, row_bytes=40
    )

    def partial(b: pa.Table) -> pa.Table:
        return _batch_bigram_partials(b.column(text_col), n_parts)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("wpart")
        .map_groups(
            lambda g: _partition_lm(g, min_count), batch_format="pyarrow"
        )
    )
