"""URL canonicalization + URL-level dedup — the pre-fetch dedup every
crawl pipeline runs before any byte is downloaded (casing, fragments,
tracking params and default ports make the same resource look like
many URLs; at crawl scale that is wasted fetch + storage).

Canonical form, applied in order:
  1. lowercase the scheme+host prefix (path/query case is preserved —
     paths are case-sensitive, hosts are not)
  2. strip the ``#fragment``
  3. strip ``utm_*`` tracking params (mid-list, first-of-list, lone)
  4. strip default ports (``http://h:80``, ``https://h:443``)

Every step is one RE2 pass (pyarrow.compute), and every pattern +
replacement is valid with identical semantics in DuckDB's RE2
(``regexp_extract`` / ``regexp_replace(…, 'g')``) — the SQL oracle
applies the SAME strings, so canonicalization is differential-testable
byte for byte. No lookarounds anywhere (RE2 has none): the default-port
patterns capture the following delimiter instead.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme://host prefix, OPTIONAL so the pattern matches (empty) on
# schemeless strings — both engines then extract '' and strip nothing,
# instead of diverging on a non-match
SCHEME_HOST = r"^(?:[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)?"

# (name, RE2 pattern, RE2 rewrite) — applied in order after the
# lowercase step. Kept single-quote-free for SQL embedding.
URL_STEPS: tuple[tuple[str, str, str], ...] = (
    ("fragment", r"#.*$", ""),
    # utm params: mid-list (&utm_…), first-of-many (?utm_…&), lone (?utm_…$)
    ("utm_mid", r"&utm_[A-Za-z0-9_]*=[^&]*", ""),
    ("utm_first", r"\?utm_[A-Za-z0-9_]*=[^&]*&", "?"),
    ("utm_only", r"\?utm_[A-Za-z0-9_]*=[^&]*$", ""),
    # default ports; \2 re-emits the captured delimiter (/, ? or end)
    ("port80", r"^(http://[^/:?#]+):80(/|\?|$)", r"\1\2"),
    ("port443", r"^(https://[^/:?#]+):443(/|\?|$)", r"\1\2"),
)


def canonicalize_url_array(url: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized canonical form of a URL string array — 8 RE2 column
    passes (2 for the case split + 6 steps), zero per-row Python."""
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    s = pc.fill_null(url, "")
    # lowercase scheme+host: head = the anchored prefix match (kept via
    # \1 from a whole-string rewrite), tail = the string minus it.
    # (?s): crawl URLs can carry mangled whitespace incl. newlines —
    # without dotall the .*$ rewrite silently no-ops on them and the
    # tail gets duplicated, diverging from the SQL (whose regexp_extract
    # has no .*$ and needs no flag)
    head = pc.replace_substring_regex(
        s, pattern=f"(?s)^({SCHEME_HOST[1:]}).*$", replacement=r"\1"
    )
    tail = pc.replace_substring_regex(s, pattern=SCHEME_HOST, replacement="")
    s = pc.binary_join_element_wise(pc.utf8_lower(head), tail, "")
    for _, pat, repl in URL_STEPS:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
    return s


def canonical_sql_expr(col: str) -> str:
    """The DuckDB expression computing the same canonical form."""
    expr = (
        f"lower(regexp_extract({col}, '{SCHEME_HOST}')) || "
        f"regexp_replace({col}, '{SCHEME_HOST}', '', 'g')"
    )
    for _, pat, repl in URL_STEPS:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr
