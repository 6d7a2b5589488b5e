"""Corpus-wide duplicated-span removal over W-word grams — the
ExactSubstr dedup shape (Lee et al. 2021, "Deduplicating Training
Data Makes Language Models Better"), word-gram approximation: every
word position covered by a NON-FIRST occurrence of any corpus-
duplicated W-gram is removed; the corpus-first occurrence (smallest
(doc_id, pos)) survives. Unlike line dedup (functions/linededup.py),
which needs duplication to align on newline boundaries, this strips
repeated PHRASES anywhere inside a line — the cross-document
boilerplate/quotation case line-level dedup cannot see.

Scale design — the gram stream is ~1 row per corpus word (32 B:
partition, 128-bit gram hash, packed order), ONE hashed-partition
shuffle; the removal stream out of `decide` holds only duplicated
occurrences (1 row per removed gram START, expanded to W positions
partition-locally in `rebuild`); document text is shipped ONCE into
the doc-partition rebuild via a schema-aligned union with the
removal rows. No broadcast, no driver-side state; both partition
counts come from `partitioning.adaptive_partitions`.

Gram equality is 128-bit-hash equality (two independently-seeded
splitmix chains over the per-word 128-bit hashes — positional, so
word order matters); the SQL oracle groups on the gram STRINGS, so
the differential would surface a collision. Word split is single
space (`' '`), matching DuckDB `string_split(text, ' ')` exactly
(consecutive spaces yield empty words on both sides).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .hashing import hash_str_arrow_u128, splitmix64_np

# packed = doc_id << POS_BITS | pos: word positions per document.
# 2^24 = 16.7M words/doc (a ~100 MB text), doc_id < 2^39.
POS_BITS = 24
DEFAULT_W = 5

_GRAM_SCHEMA = pa.schema(
    [
        ("part", pa.int64()),
        ("g_lo", pa.int64()),
        ("g_hi", pa.int64()),
        ("packed", pa.int64()),
    ]
)
_UNION_SCHEMA = pa.schema(
    [
        ("doc_part", pa.int64()),
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("rm_start", pa.int64()),
    ]
)
_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("clean_text", pa.string()),
        ("n_words", pa.int64()),
        ("kept_words", pa.int64()),
    ]
)


def _split_words(text: pa.ChunkedArray | pa.Array):
    """Single-space split → (flat words, int64 offsets, per-doc counts).
    `''` and null both split to one empty word — DuckDB parity."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern(pc.fill_null(text, ""), pattern=" ")
    off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return words.flatten(), off, np.diff(off)


def _explode_grams(
    batch: pa.Table, text_col: str, id_col: str, w: int, n_parts: int
) -> pa.Table:
    if batch.num_rows == 0:
        return _GRAM_SCHEMA.empty_table()
    flat, off, counts = _split_words(batch.column(text_col))
    ids = (
        pc.cast(batch.column(id_col), pa.int64())
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    if len(counts) and counts.max() >= (1 << POS_BITS):
        raise ValueError(
            f"document with {int(counts.max())} words exceeds the "
            f"2^{POS_BITS} packed-position bound; raise POS_BITS"
        )
    # doc << POS_BITS would wrap SILENTLY past 2^(63-POS_BITS) and
    # route removals to the wrong documents — validate like the pos
    # bound above (e.g. hash-derived 64-bit ids are out of range)
    if len(ids) and (ids.min() < 0 or ids.max() >= (1 << (63 - POS_BITS))):
        raise ValueError(
            f"doc_id outside [0, 2^{63 - POS_BITS}) packed-order range"
        )
    t = len(flat)
    if t < w:
        return _GRAM_SCHEMA.empty_table()
    doc = np.repeat(ids, counts)
    pos = np.arange(t, dtype=np.int64) - np.repeat(off[:-1], counts) + 1
    lo, hi = hash_str_arrow_u128(flat)
    # window starts: global index i holds words i..i+w-1 of the FLAT
    # stream; valid iff the whole window stays inside one document,
    # i.e. pos[i] + w - 1 <= n_words(doc)  (pos is 1-based)
    nw = np.repeat(counts, counts)
    valid = (pos + w - 1 <= nw)[: t - w + 1]
    n_win = t - w + 1
    # two independently-seeded positional splitmix chains over the
    # word hashes — vectorized, one pass per gram slot, no gram strings
    g_lo = np.full(n_win, np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64)
    g_hi = np.full(n_win, np.uint64(0xC2B2AE3D27D4EB4F), dtype=np.uint64)
    for j in range(w):
        g_lo = splitmix64_np(g_lo ^ lo[j : n_win + j])
        g_hi = splitmix64_np(g_hi ^ hi[j : n_win + j])
    g_lo, g_hi = g_lo[valid], g_hi[valid]
    packed = ((doc << POS_BITS) | pos)[: n_win][valid]
    part = (splitmix64_np(g_lo) % np.uint64(n_parts)).astype(np.int64)
    return pa.table(
        {
            "part": pa.array(part),
            "g_lo": pa.array(g_lo.view(np.int64)),
            "g_hi": pa.array(g_hi.view(np.int64)),
            "packed": pa.array(packed, pa.int64()),
        }
    )


def dedup_spans(
    corpus: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = DEFAULT_W,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(doc_id, clean_text, n_words, kept_words) per document, with
    every word position covered by a non-first occurrence of a
    corpus-duplicated ``w``-gram removed and the survivors rejoined
    with single spaces."""
    from ..partitioning import adaptive_partitions, parquet_rows_hint

    hint = parquet_rows_hint(corpus)
    # ~1 gram row per corpus word; sf docs average ~55 words
    n_parts = num_partitions or adaptive_partitions(
        (hint or 0) * 55 or None, row_bytes=32
    )
    n_doc_parts = num_partitions or adaptive_partitions(hint, row_bytes=400)

    def decide(g: pa.Table) -> pa.Table:
        """One gram-hash partition: occurrences of the same gram are
        contiguous after one lexsort; every non-first one is removed."""
        if g.num_rows == 0:
            return _UNION_SCHEMA.empty_table()
        lo = g.column("g_lo").to_numpy(zero_copy_only=False)
        hi = g.column("g_hi").to_numpy(zero_copy_only=False)
        packed = g.column("packed").to_numpy(zero_copy_only=False)
        order = np.lexsort((packed, hi, lo))
        lo_s, hi_s = lo[order], hi[order]
        first = np.empty(len(order), dtype=bool)
        first[0] = True
        first[1:] = (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])
        removed = packed[order][~first]
        doc = removed >> POS_BITS
        dpart = (splitmix64_np(doc.astype(np.uint64)) % np.uint64(n_doc_parts)).astype(
            np.int64
        )
        return pa.table(
            {
                "doc_part": pa.array(dpart),
                "doc_id": pa.array(doc, pa.int64()),
                "text": pa.nulls(len(removed), pa.string()),
                "rm_start": pa.array(removed & ((1 << POS_BITS) - 1), pa.int64()),
            }
        )

    def to_doc_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _UNION_SCHEMA.empty_table()
        ids = (
            pc.cast(batch.column(id_col), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        dpart = (splitmix64_np(ids.astype(np.uint64)) % np.uint64(n_doc_parts)).astype(
            np.int64
        )
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        return pa.table(
            {
                "doc_part": pa.array(dpart),
                "doc_id": pa.array(ids),
                "text": pc.cast(pc.fill_null(text, ""), pa.string()),
                "rm_start": pa.nulls(batch.num_rows, pa.int64()),
            }
        )

    def rebuild(g: pa.Table) -> pa.Table:
        """One doc partition of the union: doc rows (text set) plus
        removal rows (rm_start set). Expand removal starts to w
        positions, mask the flat word stream, rejoin per doc."""
        if g.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        is_doc = pc.is_valid(g.column("text")).to_numpy(zero_copy_only=False)
        docs = g.filter(pa.array(is_doc))
        if docs.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        ids = docs.column("doc_id").to_numpy(zero_copy_only=False)
        id_order = np.argsort(ids, kind="stable")
        ids_s = ids[id_order]
        text_sorted = docs.column("text").combine_chunks().take(
            pa.array(id_order, pa.int64())
        )
        flat, off, counts = _split_words(text_sorted)
        keep = np.ones(len(flat), dtype=bool)
        rms = g.filter(pa.array(~is_doc))
        if rms.num_rows:
            rm_doc = rms.column("doc_id").to_numpy(zero_copy_only=False)
            rm_start = rms.column("rm_start").to_numpy(zero_copy_only=False)
            di = np.searchsorted(ids_s, rm_doc)
            # flat index of the span start (pos is 1-based), expanded
            # to the w covered positions; duplicates collapse via the
            # boolean mask (no unique pass needed)
            base = off[di] + rm_start - 1
            covered = (base[:, None] + np.arange(w, dtype=np.int64)).ravel()
            keep[covered] = False
        kept_per_doc = np.bincount(
            np.repeat(np.arange(len(ids_s), dtype=np.int64), counts)[keep],
            minlength=len(ids_s),
        )
        offsets = np.concatenate(
            [np.zeros(1, np.int64), np.cumsum(kept_per_doc, dtype=np.int64)]
        )
        kept_list = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), flat.filter(pa.array(keep))
        )
        return pa.table(
            {
                "doc_id": pa.array(ids_s, pa.int64()),
                "clean_text": pc.binary_join(kept_list, " "),
                "n_words": pa.array(counts, pa.int64()),
                "kept_words": pa.array(kept_per_doc.astype(np.int64), pa.int64()),
            }
        )

    grams = corpus.map_batches(
        lambda b: _explode_grams(b, text_col, id_col, w, n_parts),
        batch_format="pyarrow",
    )
    removals = grams.groupby("part").map_groups(decide, batch_format="pyarrow")
    doc_rows = corpus.map_batches(to_doc_rows, batch_format="pyarrow")
    return (
        doc_rows.union(removals)
        .groupby("doc_part")
        .map_groups(rebuild, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Duplication-fraction score (Lee et al. 2021's diagnostic): per
# document, the fraction of its w-gram instances whose gram occurs
# ≥ 2 times corpus-wide — the "how much of this doc is boilerplate"
# number a curation pass thresholds on BEFORE deciding to run the
# destructive span removal. Same gram explosion and hashed-gram
# shuffle as dedup_spans, but the decide stage emits per-doc COUNT
# partials (24 B rows) instead of removal positions — the text never
# travels twice.
# ---------------------------------------------------------------------------

def dup_gram_fractions(
    corpus: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = DEFAULT_W,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(doc_id, n_grams, n_dup_grams, dup_fraction) per document with
    at least one w-gram."""
    from ..partitioning import adaptive_partitions, parquet_rows_hint

    hint = parquet_rows_hint(corpus)
    n_parts = num_partitions or adaptive_partitions(
        (hint or 0) * 55 or None, row_bytes=32
    )
    n_doc_parts = num_partitions or adaptive_partitions(hint, row_bytes=24)

    def decide(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "doc_part": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "n_inst": pa.array([], pa.int64()),
                    "n_dup": pa.array([], pa.int64()),
                }
            )
        lo = g.column("g_lo").to_numpy(zero_copy_only=False)
        hi = g.column("g_hi").to_numpy(zero_copy_only=False)
        packed = g.column("packed").to_numpy(zero_copy_only=False)
        order = np.lexsort((hi, lo))
        lo_s, hi_s = lo[order], hi[order]
        new = np.empty(len(order), dtype=bool)
        new[0] = True
        new[1:] = (lo_s[1:] != lo_s[:-1]) | (hi_s[1:] != hi_s[:-1])
        gid = np.cumsum(new) - 1
        gsize = np.bincount(gid)
        dup_sorted = gsize[gid] >= 2
        dup = np.empty(len(order), dtype=bool)
        dup[order] = dup_sorted
        doc = packed >> POS_BITS
        udoc, inv = np.unique(doc, return_inverse=True)
        n_inst = np.bincount(inv, minlength=len(udoc))
        n_dup = np.bincount(inv[dup], minlength=len(udoc))
        dpart = (
            splitmix64_np(udoc.astype(np.uint64)) % np.uint64(n_doc_parts)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_part": pa.array(dpart),
                "doc_id": pa.array(udoc, pa.int64()),
                "n_inst": pa.array(n_inst.astype(np.int64), pa.int64()),
                "n_dup": pa.array(n_dup.astype(np.int64), pa.int64()),
            }
        )

    def fractions(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_grams": pa.array([], pa.int64()),
                "n_dup_grams": pa.array([], pa.int64()),
                "dup_fraction": pa.array([], pa.float64()),
            }
        )
        if g.num_rows == 0:
            return empty
        m = (
            g.select(["doc_id", "n_inst", "n_dup"])
            .group_by(["doc_id"])
            .aggregate([("n_inst", "sum"), ("n_dup", "sum")])
            .rename_columns(["doc_id", "n_grams", "n_dup_grams"])
        )
        ni = m.column("n_grams").to_numpy(zero_copy_only=False)
        nd = m.column("n_dup_grams").to_numpy(zero_copy_only=False)
        return m.append_column(
            "dup_fraction",
            pa.array(nd.astype(np.float64) / ni.astype(np.float64),
                     pa.float64()),
        )

    exploded = corpus.map_batches(
        lambda b: _explode_grams(b, text_col, id_col, w, n_parts),
        batch_format="pyarrow",
    )
    return (
        exploded.groupby("part")
        .map_groups(decide, batch_format="pyarrow")
        .groupby("doc_part")
        .map_groups(fractions, batch_format="pyarrow")
    )
