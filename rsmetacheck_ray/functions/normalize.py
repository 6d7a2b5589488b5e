"""Vectorized scalar normalizers — the engine's analog of the
reference's scalar function library (SURVEY §2.2):

 - :func:`normalize_version`    ← ``utils/pitfall_utils.py:64-72``
   (strip a leading v/V, trim)
 - :func:`normalize_lang`       ← ``utils/pitfall_utils.py:42-61``
   (canonicalize language names via a frozen lookup)
 - :func:`normalize_url`        ← ``p016.py:4-21`` (lowercase, strip
   ``git+`` / trailing slash / ``.git``, rewrite ``git@host:`` →
   ``https://host/``)
 - :func:`parse_date_multi`     ← ``w002.py:58-92`` (multi-format
   datetime parse with ordered fallbacks)
 - :func:`url_host` / :func:`url_path` ← ``utils/pitfall_utils.py:74-95``
   (source-path → component extraction)

All operate on whole Arrow arrays with pyarrow.compute kernels — one
RE2 pass per rule, no Python row loops — and are usable directly
inside ``map_batches``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# frozen canonical language map (the reference's normalize_language_name
# table, extended with the engine's 2-letter codes)
LANG_CANON: dict[str, str] = {
    "python": "Python", "python3": "Python", "py": "Python",
    "cpp": "C++", "c++": "C++", "cxx": "C++",
    "javascript": "JavaScript", "js": "JavaScript",
    "typescript": "TypeScript", "ts": "TypeScript",
    "java": "Java", "go": "Go", "golang": "Go", "rust": "Rust",
    "r": "R", "julia": "Julia", "ruby": "Ruby", "fortran": "Fortran",
    "en": "en", "fr": "fr", "es": "es", "de": "de", "zh": "zh",
}


def normalize_version(arr: pa.Array) -> pa.Array:
    """Strip a leading ``v``/``V`` and surrounding whitespace."""
    s = pc.utf8_trim_whitespace(arr)
    # strip the v only when a digit follows ("v1.2" → "1.2", but
    # "version-7" stays) — RE2 has no lookahead, so capture the digit
    return pc.replace_substring_regex(s, pattern=r"^[vV](\d)", replacement=r"\1")


def normalize_lang(arr: pa.Array) -> pa.Array:
    """Canonicalize language names through the frozen lookup;
    unknown names pass through trimmed (never an error — the
    reference's tolerance, ``pitfall_utils.py:58-60``)."""
    s = pc.utf8_trim_whitespace(arr)
    lowered = pc.utf8_lower(s)
    out = s
    for raw, canon in LANG_CANON.items():
        out = pc.if_else(pc.equal(lowered, raw), pa.scalar(canon, pa.string()), out)
    return out


def normalize_url(arr: pa.Array) -> pa.Array:
    """Repo-URL canonicalization: lowercase, strip ``git+`` prefix and
    trailing ``/`` / ``.git``, rewrite ``git@host:path`` →
    ``https://host/path``."""
    s = pc.utf8_lower(pc.utf8_trim_whitespace(arr))
    s = pc.replace_substring_regex(s, pattern=r"^git\+", replacement="")
    s = pc.replace_substring_regex(
        s, pattern=r"^git@([^:/]+):", replacement=r"https://\1/"
    )
    s = pc.replace_substring_regex(s, pattern=r"\.git$", replacement="")
    s = pc.replace_substring_regex(s, pattern=r"/+$", replacement="")
    return s


_URL_HOST_RE = r"^(?:[a-z][a-z0-9+.-]*://)?(?P<host>[^/:?#]+)"
_URL_PATH_RE = r"^(?:[a-z][a-z0-9+.-]*://)?[^/]*(?P<path>/[^?#]*)"


def url_host(arr: pa.Array) -> pa.Array:
    return pc.struct_field(pc.extract_regex(pc.utf8_lower(arr), _URL_HOST_RE), "host")


def url_path(arr: pa.Array) -> pa.Array:
    ex = pc.extract_regex(arr, _URL_PATH_RE)
    return pc.struct_field(ex, "path")


# ordered fallback formats, first parse wins (the reference tries five
# formats then a date-prefix, w002.py:64-86)
_DATE_FORMATS = (
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
    "%d/%m/%Y",
    "%Y/%m/%d",
)


_URL_IN_TEXT_RE = r"(?:https?://|www\.)[^\s<>\"')]+"


def extract_urls(arr: pa.Array) -> pa.Array:
    """All http(s)/www URLs per document → ``list<string>`` column,
    trailing punctuation stripped (the reference's URL-findall,
    ``p008.py:58-81``). One RE2 pass for the scan; the per-match strip
    is a tiny Python pass over matches only."""
    # pyarrow has no findall kernel — vectorized RE2 prefilter picks the
    # rows that contain a URL at all; Python re runs only on those
    import re

    pat = re.compile(_URL_IN_TEXT_RE)
    has = pc.match_substring_regex(arr, _URL_IN_TEXT_RE)
    out: list[list[str] | None] = []
    values = arr.to_pylist()
    flags = has.to_pylist()
    for v, f in zip(values, flags):
        if v is None:
            out.append(None)
        elif not f:
            out.append([])
        else:
            out.append([m.rstrip(".,;:!?)") for m in pat.findall(v)])
    return pa.array(out, pa.list_(pa.string()))


_VERSION_IN_URL_RES = (
    r"/releases/tag/v?(?P<ver>\d+(?:\.\d+)*)",
    r"[-_/]v(?P<ver>\d+(?:\.\d+)+)",
    r"[-_](?P<ver>\d+(?:\.\d+)+)(?:\.(?:tar\.gz|tgz|zip|tar\.bz2))?$",
)


def version_from_url(arr: pa.Array) -> pa.Array:
    """Extract an embedded version from a download/release URL (the
    reference's 4-pattern extractor, ``p012.py:5-30``): ordered
    patterns, first match wins, archive extensions stripped."""
    s = pc.replace_substring_regex(
        arr, pattern=r"\.(?:tar\.gz|tgz|zip|tar\.bz2)$", replacement=""
    )
    out = pa.nulls(len(arr), pa.string())
    for pat in _VERSION_IN_URL_RES:
        ex = pc.struct_field(pc.extract_regex(s, pat), "ver")
        out = pc.coalesce(out, ex)
    return out


def parse_date_multi(arr: pa.Array) -> pa.Array:
    """Multi-format timestamp parse: try each format in order, first
    success wins; unparseable → null (rule-skips, never errors)."""
    # strip a trailing Z / timezone offset (the formats are naive)
    s = pc.replace_substring_regex(
        pc.utf8_trim_whitespace(arr), pattern=r"(?:Z|[+-]\d{2}:?\d{2})$", replacement=""
    )
    out = pa.nulls(len(arr), pa.timestamp("us"))
    for fmt in _DATE_FORMATS:
        parsed = pc.strptime(s, format=fmt, unit="us", error_is_null=True)
        out = pc.coalesce(out, parsed)
    # date-prefix fallback: first 10 chars as %Y-%m-%d
    prefix = pc.utf8_slice_codeunits(s, 0, 10)
    out = pc.coalesce(
        out, pc.strptime(prefix, format="%Y-%m-%d", unit="us", error_is_null=True)
    )
    return out
