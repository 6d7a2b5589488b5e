"""Within-document repetition signals (Gopher-style quality filters):
duplicate-line fraction, duplicate-line *character* fraction, and the
multiplicity of the most repeated line — the signals that catch
boilerplate/templated webtext that per-token stats miss.

Fully vectorized: one Arrow ``split_pattern`` per batch, then a single
lexsort over (doc, line-hash) of the flattened lines; per-doc tallies
are ``bincount`` reductions. Zero per-row Python. Lines are compared
by their 128-bit content hash (``hashing.hash_str_arrow_u128``) — the
same collision bound the exact-dedup family documents, negligible at
any realistic lines-per-document.

Complements ``functions/boilerplate.py`` (CORPUS-level line document
frequency); this is the per-document projection, SQL-expressible and
oracle-checked (split → group → count in DuckDB).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash_str_arrow_u128


def repetition_stage(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """map_batches fn → one row per input row:

    n_lines              total lines after splitting on ``\\n``
    n_distinct_lines     distinct line values (empties count too)
    dup_line_frac        (n_lines - n_distinct) / n_lines
    dup_line_char_frac   chars in repeat instances / total line chars
    top_line_count       multiplicity of the most repeated line

    Both fractions are one division of exact integer tallies, so the
    DuckDB oracle reproduces the doubles bit-for-bit.
    """
    n = batch.num_rows
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")
    lines = pc.split_pattern(text, pattern="\n")
    flat = pc.list_flatten(lines)
    doc = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    lens = pc.cast(pc.utf8_length(flat), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    lo, hi = hash_str_arrow_u128(flat)
    lo = lo.view(np.int64)
    hi = hi.view(np.int64)

    order = np.lexsort((hi, lo, doc))
    so_doc, so_lo, so_hi = doc[order], lo[order], hi[order]
    so_len = lens[order]
    first = np.empty(len(so_doc), dtype=bool)
    if len(first):
        first[0] = True
        first[1:] = (
            (so_doc[1:] != so_doc[:-1])
            | (so_lo[1:] != so_lo[:-1])
            | (so_hi[1:] != so_hi[:-1])
        )

    n_lines = np.bincount(doc, minlength=n).astype(np.int64)
    n_distinct = np.bincount(so_doc[first], minlength=n).astype(np.int64)
    total_chars = np.bincount(doc, weights=lens, minlength=n)
    dup_chars = np.bincount(
        so_doc[~first], weights=so_len[~first], minlength=n
    )
    # per-(doc, line) group sizes from the run boundaries, then a
    # per-doc max — `maximum.at` is the scatter-max over group starts
    starts = np.nonzero(first)[0]
    sizes = np.diff(np.append(starts, len(so_doc)))
    top = np.zeros(n, dtype=np.int64)
    if len(starts):
        np.maximum.at(top, so_doc[starts], sizes)

    # split("") yields [""] — every doc has ≥1 line, but guard anyway
    nl_safe = np.maximum(n_lines, 1).astype(np.float64)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_distinct_lines": pa.array(n_distinct, pa.int64()),
            "dup_line_frac": pa.array(
                (n_lines - n_distinct) / nl_safe, pa.float64()
            ),
            "dup_line_char_frac": pa.array(
                dup_chars / np.maximum(total_chars, 1.0), pa.float64()
            ),
            "top_line_count": pa.array(top, pa.int64()),
        }
    )
