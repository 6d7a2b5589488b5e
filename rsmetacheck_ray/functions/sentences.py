"""Vectorized sentence splitting — the flat-map (one row → many rows)
text shape (recasts the reference's per-line description scans,
``p007.py:20-31``, as a corpus-wide operator; a training pipeline uses
it for sentence-level dedup/packing).

One ``map_batches`` pass, zero per-row Python: the split is a single
RE2 kernel producing a ListArray, the parent doc of every piece comes
from ``pc.list_parent_indices``, and the per-doc sentence index is
segment arithmetic over the (non-decreasing) parent ids. Empty pieces
(leading/trailing delimiters) are dropped AFTER whitespace trim, and
``sent_idx`` numbers the kept pieces — the exact semantics of the SQL
oracle's ``row_number() OVER (PARTITION BY doc ORDER BY piece)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

# split AFTER sentence-final punctuation followed by whitespace (RE2 —
# no lookbehind — so the delimiter punctuation ends the LEFT piece's
# source but is not kept; identical semantics in DuckDB's
# regexp_split_to_array, which uses RE2 too)
SENT_SPLIT_RE = r"[.!?]\s+|\n+"
_TRIM = " \t\n\r"


def split_sentences(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """(id, sent_idx, sentence, n_chars): one row per non-empty
    trimmed sentence, 0-indexed within its document."""

    def split(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        txt = pc.cast(b.column(text_col), pa.string()).combine_chunks()
        lists = pc.split_pattern_regex(txt, pattern=SENT_SPLIT_RE)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lists)
        trimmed = pc.utf8_trim(flat, characters=_TRIM)
        keep = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)
        parents = parents[keep]
        kept = trimmed.filter(pa.array(keep))
        # 0-based index within each (non-decreasing) parent segment
        n = len(parents)
        if n:
            new = np.empty(n, dtype=bool)
            new[0] = True
            new[1:] = parents[1:] != parents[:-1]
            seg_first = np.flatnonzero(new)
            seg_id = np.cumsum(new) - 1
            sent_idx = np.arange(n, dtype=np.int64) - seg_first[seg_id]
        else:
            sent_idx = np.array([], dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids[parents], pa.int64()),
                "sent_idx": pa.array(sent_idx, pa.int64()),
                "sentence": kept,
                "n_chars": pc.cast(pc.utf8_length(kept), pa.int64()),
            }
        )

    return ds.map_batches(split, batch_format="pyarrow")


def sql_sentences(
    from_clause: str, id_expr: str = "doc_id", prefix_ctes: str = ""
) -> str:
    """The identical split as DuckDB SQL (oracle side).
    ``prefix_ctes`` (e.g. ``"pages AS ({pages}), "``) lets the caller
    chain the corpus-synthesis CTE in front."""
    return f"""
WITH {prefix_ctes}pieces AS (
  SELECT {id_expr} AS doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS raw
  FROM (SELECT {id_expr}, regexp_split_to_array(text, '[.!?]\\s+|\\n+') AS l
        FROM {from_clause})
), trimmed AS (
  SELECT doc_id, i,
         trim(raw, ' ' || chr(9) || chr(10) || chr(13)) AS sentence
  FROM pieces
)
SELECT doc_id,
  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS BIGINT)
    AS sent_idx,
  sentence, CAST(length(sentence) AS BIGINT) AS n_chars
FROM trimmed WHERE sentence <> ''
"""
