"""Corpus-wide first-occurrence line dedup — remove every line
instance whose exact line text appeared EARLIER in the corpus
(document order, then position), keeping the first. The C4-lineage
span-dedup shape: unlike the df-threshold boilerplate scrub
(functions/boilerplate.py, which removes ALL instances of hot lines),
this keeps one canonical copy of every line, so unique content
survives while template/duplicated spans are stripped from every
later document.

Scale design — two hashed-partition shuffles, no broadcast, no
driver-side state:

 1. **decide** — explode documents into (line_hash-partition, hash128,
    packed-order, line, doc, pos) instance rows; all instances of a
    line land in ONE partition, so "is this the corpus-first
    instance?" is partition-local: one lexsort by (hash, packed) per
    partition, boundary test marks firsts. `packed = doc_id * 2^20 +
    pos` gives the (doc, pos) lexicographic order in one int64
    (documented bound: pos < 2^20 lines/doc, doc_id < 2^43).
 2. **rebuild** — shuffle the flagged instances by doc-partition;
    per partition one lexsort by (doc, pos), then per-doc
    reassembly of kept lines via Arrow list offsets + binary_join.

Both partition counts come from `partitioning.adaptive_partitions`
(input-sized, not fixed). Line equality is 128-bit-hash equality —
the exact-dedup family's collision bound; the SQL oracle groups on
the line STRINGS, so the differential would surface a collision.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .hashing import hash_str_arrow_u128, splitmix64_np

# packed = doc_id << POS_BITS | pos: position bits per document
POS_BITS = 20
_DECIDED_SCHEMA = pa.schema(
    [
        ("doc_part", pa.int64()),
        ("doc_id", pa.int64()),
        ("pos", pa.int64()),
        ("line", pa.string()),
        ("kept", pa.bool_()),
    ]
)
_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("dedup_text", pa.string()),
        ("n_lines", pa.int64()),
        ("kept_lines", pa.int64()),
    ]
)


def _explode(batch: pa.Table, text_col: str, id_col: str, n_parts: int) -> pa.Table:
    if batch.num_rows == 0:
        return pa.schema(
            [
                ("part", pa.int64()),
                ("h_lo", pa.int64()),
                ("h_hi", pa.int64()),
                ("packed", pa.int64()),
                ("doc_id", pa.int64()),
                ("pos", pa.int64()),
                ("line", pa.string()),
            ]
        ).empty_table()
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lines = pc.split_pattern(pc.fill_null(text, ""), pattern="\n")
    off = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lines.flatten()
    counts = np.diff(off)
    ids = (
        pc.cast(batch.column(id_col), pa.int64())
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    doc = np.repeat(ids, counts)
    # position within the doc, 1-based (matches SQL generate_series)
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(off[:-1], counts) + 1
    # enforce the packed-order bound instead of silently corrupting:
    # pos >= 2^POS_BITS would OR into doc-id bits without carrying
    if len(counts) and counts.max() >= (1 << POS_BITS):
        raise ValueError(
            f"document with {int(counts.max())} lines exceeds the "
            f"2^{POS_BITS} packed-position bound; raise POS_BITS"
        )
    # same discipline for the id half of the packed key: a silent
    # wrap past 2^(63-POS_BITS) would misroute kept-line decisions
    if len(ids) and (ids.min() < 0 or ids.max() >= (1 << (63 - POS_BITS))):
        raise ValueError(
            f"doc_id outside [0, 2^{63 - POS_BITS}) packed-order range"
        )
    lo, hi = hash_str_arrow_u128(flat)
    part = (splitmix64_np(lo) % n_parts).astype(np.int64)
    return pa.table(
        {
            "part": pa.array(part),
            "h_lo": pa.array(lo.view(np.int64)),
            "h_hi": pa.array(hi.view(np.int64)),
            "packed": pa.array((doc << POS_BITS) | pos, pa.int64()),
            "doc_id": pa.array(doc),
            "pos": pa.array(pos),
            "line": flat,
        }
    )


def dedup_lines(
    corpus: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(doc_id, dedup_text, n_lines, kept_lines) per document, with
    every non-first instance of every line removed corpus-wide."""
    from ..partitioning import adaptive_partitions, parquet_rows_hint

    hint = parquet_rows_hint(corpus)
    # ~8 line instances per doc, ~120 B per shuffled instance row
    n_parts = num_partitions or adaptive_partitions(
        (hint or 0) * 8 or None, row_bytes=120
    )

    def decide(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _DECIDED_SCHEMA.empty_table()
        lo = g.column("h_lo").to_numpy(zero_copy_only=False)
        hi = g.column("h_hi").to_numpy(zero_copy_only=False)
        packed = g.column("packed").to_numpy(zero_copy_only=False)
        order = np.lexsort((packed, hi, lo))
        first = np.empty(len(order), dtype=bool)
        first[0] = True
        lo_s, hi_s = lo[order], hi[order]
        first[1:] = (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])
        kept = np.empty(len(order), dtype=bool)
        kept[order] = first
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        dpart = (splitmix64_np(doc.astype(np.uint64)) % n_parts).astype(
            np.int64
        )
        return pa.table(
            {
                "doc_part": pa.array(dpart),
                "doc_id": g.column("doc_id"),
                "pos": g.column("pos"),
                "line": g.column("line"),
                "kept": pa.array(kept),
            }
        )

    def rebuild(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        pos = g.column("pos").to_numpy(zero_copy_only=False)
        kept = g.column("kept").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, doc))
        doc_s, kept_s = doc[order], kept[order]
        line_s = g.column("line").combine_chunks().take(
            pa.array(order, pa.int64())
        )
        # doc boundaries in the sorted instance stream
        starts = np.nonzero(
            np.concatenate([[True], doc_s[1:] != doc_s[:-1]])
        )[0]
        sizes = np.diff(np.append(starts, len(doc_s)))
        doc_ids = doc_s[starts]
        n_docs = len(doc_ids)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), sizes)
        kept_per_doc = np.bincount(doc_idx[kept_s], minlength=n_docs)
        # int64 offsets: one doc-PARTITION (unlike boilerplate.py's
        # per-batch lists) can legitimately hold >= 2^31 line items
        # when num_partitions is forced low or doc keys are skewed
        offsets = np.concatenate(
            [np.zeros(1, np.int64), np.cumsum(kept_per_doc, dtype=np.int64)]
        )
        kept_list = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), line_s.filter(pa.array(kept_s))
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "dedup_text": pc.binary_join(kept_list, "\n"),
                "n_lines": pa.array(sizes.astype(np.int64), pa.int64()),
                "kept_lines": pa.array(
                    kept_per_doc.astype(np.int64), pa.int64()
                ),
            }
        )

    exploded = corpus.map_batches(
        lambda b: _explode(b, text_col, id_col, n_parts),
        batch_format="pyarrow",
    )
    decided = exploded.groupby("part").map_groups(
        decide, batch_format="pyarrow"
    )
    return decided.groupby("doc_part").map_groups(
        rebuild, batch_format="pyarrow"
    )
