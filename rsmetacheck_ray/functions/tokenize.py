"""Token counting — whitespace and BPE-style pretokenization.

The training-data-pipeline analog of the reference's per-doc ratio
counters (``w001.py:114-115``): token counts feed length gates and
cost estimation. Two counters, both ONE vectorized RE2 pass:

 - :func:`count_ws_tokens`: ``\\S+`` runs (the gate's ``n_tokens``).
 - :func:`count_bpe_tokens`: a GPT-2-style pretokenizer alternation —
   letter runs, digit runs, punctuation runs, each with an optional
   leading space, plus whitespace runs. RE2 has no lookahead, so the
   canonical GPT-2 ``\\s+(?!\\S)`` branch is simplified to ``\\s+``;
   counts are within ~1% of a real BPE pretokenizer on web text and
   exactly reproducible in DuckDB (same RE2 pattern).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

WS_TOKEN_RE = r"\S+"
# RE2's \s is exactly [\t\n\f\r ] (ASCII, no \v) — this split class is
# the complement of WS_TOKEN_RE's \S, so splitting here and counting
# with count_ws_tokens always agree, and both agree with the DuckDB
# oracles' regexp_extract_all(text, '\S+'). pc.utf8_split_whitespace
# is NOT equivalent: it splits on Unicode whitespace (U+00A0, U+2028,
# U+3000, …), silently diverging from every SQL oracle on non-ASCII
# web text.
_WS_SPLIT_RE = r"[\t\n\f\r ]+"


def split_ws_tokens(arr: pa.Array | pa.ChunkedArray) -> pa.ListArray:
    """Per-string token lists under the engine's canonical ``\\S+``
    semantics — the splitter dual of :func:`count_ws_tokens`
    (``len(tokens) == n_tokens`` for every document). Boundary empties
    (before a leading / after a trailing separator) survive the split;
    callers mask ``""`` tokens exactly as before."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pc.split_pattern_regex(pc.fill_null(arr, ""), pattern=_WS_SPLIT_RE)


def tokens_with_doc_index(
    arr: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, pa.DictionaryArray | None]:
    """The shared ``(doc_idx, dictionary-encoded tokens)`` projection
    every token-level batch stage starts from: ONE canonical-WS split
    for the batch, flatten, per-token document index, empty-token mask,
    dictionary encoding so downstream work (hashing, weight lookup)
    runs over the batch's UNIQUE vocabulary only. Returns
    ``(empty, None)`` when the batch has no tokens."""
    words = split_ws_tokens(arr)
    off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = words.flatten()
    doc_idx = np.repeat(np.arange(len(words), dtype=np.int64), np.diff(off))
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    doc_idx = doc_idx[mask]
    if len(doc_idx) == 0:
        return doc_idx, None
    return doc_idx, flat.filter(pa.array(mask)).dictionary_encode()
# order matters: contraction suffixes first, then spaced runs
BPE_TOKEN_RE = (
    r"'(?:s|d|m|t|ll|ve|re)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    r"| ?[^\s\p{L}\p{N}]+"
    r"|\s+"
)


def count_ws_tokens(arr: pa.Array) -> pa.Array:
    return pc.cast(pc.count_substring_regex(arr, WS_TOKEN_RE), pa.int64())


def count_bpe_tokens(arr: pa.Array) -> pa.Array:
    return pc.cast(pc.count_substring_regex(arr, BPE_TOKEN_RE), pa.int64())
