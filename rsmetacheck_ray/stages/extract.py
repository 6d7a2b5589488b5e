"""HTML → text extraction stage (SURVEY §7.2 step 3).

The analog of the reference's corpus-producing extraction step
(``run_somef.py:5-16`` shells out per repo; here the "extractor" is a
pure, stateless, byte-deterministic transform — the invariant pinned by
``BASELINE.json.input_hint``: byte-identical extracted text per url
across runs and parallelism levels).

Fully vectorized: every pass is a pyarrow.compute (RE2) kernel over the
whole Arrow column — zero Python-per-row work, zero-copy batches.

Spec (frozen):
  1. utf-8 decode of the ``html`` binary column
  2. drop ``<head>…</head>`` and boilerplate blocks
     (``<script>``/``<style>``/``<nav>``/``<header>``/``<footer>``)
  3. block-close tags (``</p> </h1..6> </li> </div> <br>``) → newline
  4. strip all remaining tags
  5. unescape the 6 common entities
  6. whitespace-normalize: collapse runs of spaces/tabs, strip each
     line, drop empty lines

Rows with null ``html`` fall back to the ``text`` column (trusted
pre-extracted text); rows with neither become empty strings.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2 patterns. (?s) = dotall for block removal; (?i) case-insensitive
# tag names. The six boilerplate blocks are removed in ONE alternation
# pass (RE2 has no backreferences, so each tag pair is spelled out) —
# each removal pass costs a full scan of every html byte, and at
# 100 TB the pass count is the extraction budget. Equivalent to the
# sequential per-tag passes for non-pathological nesting: each branch
# is lazy, ending at the first matching closer.
_BLOCK_REMOVALS = [
    r"(?is)(?:<head\b.*?</head>|<script\b.*?</script>|<style\b.*?</style>"
    r"|<nav\b.*?</nav>|<header\b.*?</header>|<footer\b.*?</footer>)",
]
_NEWLINE_TAGS = r"(?i)</(?:p|h[1-6]|li|div|tr|title)>|<br\s*/?>"
_ANY_TAG = r"(?s)<[^>]*>"
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&copy;", "(c)"),
    ("&amp;", "&"),  # must come last
]


def extract_text_array(html: pa.Array) -> pa.Array:
    """Vectorized extraction over a binary/string array → string array."""
    s = pc.cast(html, pa.string()) if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type) else html
    for pat in _BLOCK_REMOVALS:
        s = pc.replace_substring_regex(s, pattern=pat, replacement="")
    s = pc.replace_substring_regex(s, pattern=_NEWLINE_TAGS, replacement="\n")
    s = pc.replace_substring_regex(s, pattern=_ANY_TAG, replacement="")
    for ent, repl in _ENTITIES:
        s = pc.replace_substring(s, pattern=ent, replacement=repl)
    # whitespace normalize: collapse horizontal runs, trim line edges,
    # collapse newline runs, trim document edges
    # match only runs that actually change (≥2 chars, or a lone \t/\r):
    # a plain `[ \t\r]+` also matches every single space, making RE2
    # rewrite the whole column even when output == input (measured as
    # the single most expensive extraction pass)
    s = pc.replace_substring_regex(s, pattern=r"[ \t\r]{2,}|[\t\r]", replacement=" ")
    s = pc.replace_substring_regex(s, pattern=r"(?m)^ +| +$", replacement="")
    s = pc.replace_substring_regex(s, pattern=r"\n{2,}", replacement="\n")
    s = pc.replace_substring_regex(s, pattern=r"^\n|\n$", replacement="")
    return s


def extract_stage(batch: pa.Table) -> pa.Table:
    """map_batches fn: adds ``extracted_text`` and DROPS the wide
    ``html`` column so the heavy binary payload never travels past this
    stage (SURVEY §7.4 "project it away early")."""
    html = batch.column("html")
    extracted = extract_text_array(html.combine_chunks() if isinstance(html, pa.ChunkedArray) else html)
    # null html → fall back to the trusted pre-extracted `text` column
    if batch.column("html").null_count > 0:
        extracted = pc.coalesce(extracted, batch.column("text"))
    extracted = pc.coalesce(extracted, pa.scalar("", pa.string()))
    out = batch.drop_columns(["html"])
    return out.append_column("extracted_text", extracted)
