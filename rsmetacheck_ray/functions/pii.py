"""PII redaction — vectorized regex scrub of emails / IPv4 addresses /
phone numbers, the compliance pass every webtext training-data
pipeline runs before anything leaves the gate. (The reference has no
analog — its inputs are repo-metadata JSON — this extends the engine's
scrub family, ``stages/rules.py`` SCRUBS, to PII kinds.)

Patterns are RE2 (pyarrow.compute's regex engine) and deliberately
written to carry identical semantics in DuckDB's ``regexp_replace`` /
``regexp_extract_all`` (also RE2) — the SQL oracle applies the SAME
pattern strings, making the scrub differential-testable end to end
(same non-overlapping leftmost-match discipline in both engines).

Scrub order is email → ipv4 → phone; each kind is counted on the text
as seen by THAT pass (after earlier replacements), exactly as the
oracle's nested CTEs count. Order matters: an email eats its embedded
digits/dots before the ipv4/phone passes can see them, and the
replacement tokens are letters-only so they never re-trigger a later
pattern.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.rules import EMAIL_RE, IP_RE

# (kind, RE2 pattern, replacement) — applied in order. Keep patterns
# single-quote-free: they are embedded verbatim in SQL string literals.
# email/ipv4 are the gate catalog's own constants (stages/rules.py),
# so the two scrub surfaces cannot drift; phone is DELIBERATELY wider
# than the gate's frozen US-format PHONE_RE — this corpus-wide
# compliance pass also catches bare international numbers (+44207...),
# which the oracle-pinned rule catalog must not silently start
# flagging.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IP_RE, "<IP>"),
    ("phone", r"\+\d[\d\-]{6,14}\d", "<PHONE>"),
)


def scrub_pii_array(text: pa.Array | pa.ChunkedArray):
    """(scrubbed string array, {kind: int64 count array}).

    One ``count_substring_regex`` + one ``replace_substring_regex``
    column pass per kind — 6 RE2 scans total, zero per-row Python.
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    s = pc.fill_null(text, "")
    counts: dict[str, pa.Array] = {}
    for kind, pat, repl in PII_PATTERNS:
        counts[kind] = pc.cast(pc.count_substring_regex(s, pat), pa.int64())
        s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
    return s, counts


def scrub_pii_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """map_batches fn: replaces ``text_col`` with its scrubbed form and
    appends one ``n_<kind>`` count column per pattern."""
    scrubbed, counts = scrub_pii_array(batch.column(text_col))
    out = batch.drop_columns([text_col])
    for kind, arr in counts.items():
        out = out.append_column(f"n_{kind}", arr)
    return out.append_column("scrubbed_text", scrubbed)
