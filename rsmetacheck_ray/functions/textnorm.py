"""Unicode NFC text normalization — the canonical-form pass a webtext
pipeline runs before hashing/dedup/tokenization (the same logical text
arrives from crawls in composed AND decomposed forms; un-normalized,
exact dedup misses byte-different equal strings and token counts
drift).

pyarrow's ``utf8_normalize`` does NOT compose (decomposition+reorder
only, measured on pyarrow 16: ``e +  ̀`` stays two codepoints), so it
cannot produce true NFC. Instead: a vectorized ASCII fast path —
``utf8_length == binary_length`` ⇔ every codepoint < 0x80 ⇔ the string
is NFC-invariant — and only the non-ASCII minority takes a per-row
``unicodedata.normalize`` (a CPython C call). On lang-filtered webtext
the non-ASCII fraction is small; on the driver corpus it is exactly
the injected rows.

CPython's normalize and DuckDB's ``nfc_normalize`` (utf8proc) agree on
composition (probed: combining acute/ring, angstrom sign, canonical
reordering of multiple marks) — the oracle relies on that agreement;
exotic codepoints newer than either library's Unicode tables could
diverge, which the differential would surface, not hide.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa
import pyarrow.compute as pc


def nfc_normalize_array(text: pa.Array | pa.ChunkedArray):
    """(normalized string array, changed bool array).

    One vectorized ASCII screen; only non-ASCII rows are materialized
    and normalized (scattered back with ``replace_with_mask``).
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    s = pc.fill_null(text, "")
    non_ascii = pc.not_equal(pc.utf8_length(s), pc.binary_length(s))
    if not pc.any(non_ascii).as_py():
        return s, pa.array([False] * len(s), pa.bool_())
    sub = s.filter(non_ascii)
    norm = pa.array(
        [unicodedata.normalize("NFC", v) for v in sub.to_pylist()],
        pa.string(),
    )
    out = pc.replace_with_mask(s, non_ascii, norm)
    return out, pc.not_equal(out, s)


def nfc_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """map_batches fn: replaces ``text_col`` with its NFC form and
    appends a ``changed`` flag."""
    out, changed = nfc_normalize_array(batch.column(text_col))
    i = batch.schema.get_field_index(text_col)
    return batch.set_column(i, text_col, out).append_column(
        "changed", changed
    )
