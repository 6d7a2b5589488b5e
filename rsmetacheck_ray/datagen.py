"""Deterministic synthetic `pages` corpus generator (FIXTURES.md §1-2).

Every cell is a pure function of ``(seed, row_index)`` — the same table
materializes on every machine, at any scale point, independent of
parallelism. Rows are drawn from labeled fixture FAMILIES that mirror
the reference's parametrized trigger / non-trigger unit-test style
(``test_p001.py:13-77``): each family is constructed to fire a specific
rule (or none), and the expectation is defined ANALYTICALLY by the
family — not by running the rules — so the golden test is not
tautological.

The hidden label table carries ``(expected_keep, expected_rules,
expected_scrubbed_text)`` keyed by url (FIXTURES.md §2).
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

from .functions.hashing import row_u64
from .functions.vocab import CONTENT, MARKERS, TOXICITY_WORDS, ZH_CHARS
from .schema import LABELS_SCHEMA, PAGES_SCHEMA

SEED = 42
_EPOCH = datetime(2023, 1, 1)

# (family, weight, expected_rules, expected_keep)
FAMILIES: list[tuple[str, int, list[str], bool]] = [
    ("clean", 35, [], True),
    ("duplicate", 6, [], True),
    ("pii_email", 4, ["pii_email"], True),
    ("pii_phone", 4, ["pii_phone"], True),
    ("pii_ip", 4, ["pii_ip"], True),
    ("toxic", 3, ["toxicity"], True),
    ("template_placeholder", 3, ["template_placeholder"], False),
    ("boilerplate_only", 3, ["boilerplate_only"], False),
    ("lang_mismatch", 4, ["lang_mismatch"], False),
    ("dead_url_pattern", 4, ["dead_url_pattern"], False),
    ("homepage_url", 3, ["homepage_url"], True),
    ("archive_url", 3, ["archive_url"], True),
    ("shorthand_url", 2, ["shorthand_url"], True),
    ("bare_identifier", 3, ["bare_identifier"], True),
    ("stopword_low", 3, ["stopword_ratio_low"], False),
    ("symbol_high", 3, ["symbol_ratio_high"], False),
    ("repetition", 3, ["repetition"], False),
    ("gibberish", 3, ["perplexity_high"], False),
    ("multi_value_lang", 2, ["multi_value_field"], True),
    ("empty_text", 2, ["empty_text"], False),
    ("outdated_ts", 3, ["outdated_ts"], True),
]
_TOTAL_W = sum(w for _, w, _, _ in FAMILIES)

_TEXT_LANGS = ("en", "fr", "es", "de", "zh")
N_HOSTS = 64  # Zipf-ish host pool; a few oversized hosts exercise the salt path


# --------------------------------------------------------------------------
# word/sentence builders (pure functions of (seed, i, stream))
# --------------------------------------------------------------------------

def _u(i: int, stream: int, seed: int = SEED) -> int:
    return row_u64(seed, i, stream)


def _sentence(lang: str, i: int, stream: int, n_words: int, seed: int = SEED) -> str:
    """~1 marker word per 3 words ⇒ marker density ≈ 0.33 in clean text."""
    if lang == "zh":
        chars = [
            ZH_CHARS[_u(i, stream * 1000 + j, seed) % len(ZH_CHARS)]
            for j in range(n_words * 2)
        ]
        return "".join(chars)
    markers, content = MARKERS[lang], CONTENT[lang]
    words = []
    for j in range(n_words):
        r = _u(i, stream * 1000 + j, seed)
        if j % 3 == 1:
            words.append(markers[r % len(markers)])
        else:
            words.append(content[r % len(content)])
    return " ".join(words) + "."


def _title(lang: str, i: int, seed: int = SEED) -> str:
    if lang == "zh":
        return "".join(
            ZH_CHARS[_u(i, 7000 + j, seed) % len(ZH_CHARS)] for j in range(4)
        )
    content = CONTENT[lang]
    n = 3 + _u(i, 7100, seed) % 3
    ws = [content[_u(i, 7200 + j, seed) % len(content)] for j in range(n)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws)


def _paragraphs(lang: str, i: int, seed: int = SEED, base_stream: int = 10) -> list[str]:
    n_paras = 3 + _u(i, 8000, seed) % 4  # 3..6
    paras = []
    for p in range(n_paras):
        n_sents = 2 + _u(i, 8100 + p, seed) % 2
        sents = [
            _sentence(lang, i, base_stream + p * 10 + s, 12 + _u(i, 8200 + p * 10 + s, seed) % 9, seed)
            for s in range(n_sents)
        ]
        paras.append(" ".join(sents))
    return paras


def _content_only_sentence(i: int, stream: int, n_words: int) -> str:
    content = CONTENT["en"]
    return " ".join(content[_u(i, stream * 1000 + j) % len(content)] for j in range(n_words)) + "."


_CONSONANTS = "bcdfghjklmnpqrstvwxz"


def _gibberish_word(i: int, stream: int) -> str:
    n = 5 + _u(i, stream * 31, SEED) % 6
    return "".join(
        _CONSONANTS[_u(i, stream * 31000 + j) % len(_CONSONANTS)] for j in range(n)
    )


# --------------------------------------------------------------------------
# html wrapping (the extraction stage must invert this byte-identically)
# --------------------------------------------------------------------------

def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


_NAV = '<nav><a href="/">Home</a> <a href="/about">About</a></nav>'
_SCRIPT = "<script>var t=1;function f(){return t;}</script>"
_STYLE = "<style>body{color:#222;margin:0}</style>"
_FOOTER = "<footer>&copy; 2024 Example Site</footer>"


def _wrap_html(title: str, paragraphs: list[str], i: int) -> bytes:
    r = _u(i, 9000)
    parts = ["<html><head><title>", _esc(title), '</title><meta charset="utf-8">']
    if r & 1:
        parts.append(_STYLE)
    parts.append("</head><body>")
    if r & 2:
        parts.append(_NAV)
    parts.append(f"<h1>{_esc(title)}</h1>")
    for p in paragraphs:
        parts.append(f"<p>{_esc(p)}</p>")
    if r & 4:
        parts.append(_SCRIPT)
    if r & 8:
        parts.append(_FOOTER)
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


# --------------------------------------------------------------------------
# per-row builder
# --------------------------------------------------------------------------

def _clean_url(i: int) -> str:
    # Zipf-ish: u² concentrates mass on low host indices (oversized hosts)
    u = _u(i, 100) / 2.0**64
    h = int(N_HOSTS * u * u)
    return f"https://site{h}.example.com/articles/page-{i}"


def _pick_lang(i: int) -> str:
    # en-heavy mix like the real web
    r = _u(i, 200) % 100
    if r < 40:
        return "en"
    if r < 55:
        return "fr"
    if r < 70:
        return "es"
    if r < 85:
        return "de"
    return "zh"


_DUP_TEMPLATE_COUNT = 10


def _duplicate_text(k: int) -> tuple[str, list[str]]:
    """k-th canonical duplicate document (index-independent)."""
    pseudo_i = 10_000_000 + k
    title = _title("en", pseudo_i)
    paras = _paragraphs("en", pseudo_i)
    return title, paras


def build_row(i: int, seed: int = SEED) -> tuple[dict, dict]:
    """Build (page_row, label_row) for global row index ``i``. Pure."""
    fr = _u(i, 1, seed) % _TOTAL_W
    acc = 0
    family, exp_rules, exp_keep = "clean", [], True
    for name, w, rules, keep in FAMILIES:
        acc += w
        if fr < acc:
            family, exp_rules, exp_keep = name, list(rules), keep
            break

    lang = _pick_lang(i)
    url = _clean_url(i)
    warc_ts = _EPOCH + timedelta(seconds=137 * i)
    declared_lang: str | None = lang

    title: str = _title(lang, i)
    paras: list[str] = _paragraphs(lang, i)
    scrub_pairs: list[tuple[str, str]] = []  # (injected literal, replacement)

    if family == "duplicate":
        k = _u(i, 300) % _DUP_TEMPLATE_COUNT
        title, paras = _duplicate_text(k)
        declared_lang = "en"
    elif family == "pii_email":
        user = CONTENT["en"][_u(i, 310) % 20]
        email = f"{user}{_u(i, 311) % 97}@mail-{_u(i, 312) % 13}.example.net"
        paras[0] += f" contact {email} for details."
        scrub_pairs.append((email, "<EMAIL>"))
    elif family == "pii_phone":
        phone = f"+1-555-{_u(i, 320) % 900 + 100:03d}-{_u(i, 321) % 9000 + 1000:04d}"
        paras[0] += f" call {phone} now."
        scrub_pairs.append((phone, "<PHONE>"))
    elif family == "pii_ip":
        ip = f"192.168.{_u(i, 330) % 256}.{_u(i, 331) % 254 + 1}"
        paras[0] += f" server at {ip} responded."
        scrub_pairs.append((ip, "<IP>"))
    elif family == "toxic":
        tox = TOXICITY_WORDS[_u(i, 340) % len(TOXICITY_WORDS)]
        paras[0] += f" utterly {tox} behavior."
        scrub_pairs.append((tox, "****"))
    elif family == "template_placeholder":
        ph = ("<year>", "[fullname]", "<name of author>", "{{title}}")[_u(i, 350) % 4]
        paras[-1] += f" copyright {ph} all rights reserved."
    elif family == "boilerplate_only":
        title = "Example Site"
        paras = [
            f"(c) {2015 + _u(i, 360) % 9} ExampleCorp. All rights reserved worldwide notice.",
            "Home | About | Contact | Privacy | Terms",
        ]
        declared_lang = "en"
    elif family == "lang_mismatch":
        actual = _TEXT_LANGS[_u(i, 370) % len(_TEXT_LANGS)]
        declared = _TEXT_LANGS[(_TEXT_LANGS.index(actual) + 1 + _u(i, 371) % 4) % 5]
        title, paras = _title(actual, i), _paragraphs(actual, i)
        declared_lang = declared
    elif family == "dead_url_pattern":
        host = f"site{_u(i, 380) % N_HOSTS}.example.com"
        path = ("/wp-login.php", "/cgi-bin/view.cgi", "/xmlrpc.php", "/wp-admin/index.php")[
            _u(i, 381) % 4
        ]
        url = f"https://{host}{path}?ref={i}"
    elif family == "homepage_url":
        k = _u(i, 390) % 20
        url = (
            f"https://docs.example{k}.org/page-{i}",
            f"https://wiki.example{k}.org/index-{i}",
            f"https://site{k}.example.com/wiki/Main_Page-{i}",
        )[_u(i, 391) % 3]
    elif family == "archive_url":
        n = _u(i, 400) % 1000000
        url = (
            f"https://zenodo.org/record/{n}-{i}",
            f"https://sourceforge.net/projects/proj{n}/files/{i}",
            f"https://site{n % N_HOSTS}.example.com/releases/tag/v1.{n % 10}-{i}",
        )[_u(i, 401) % 3]
    elif family == "shorthand_url":
        url = f"site{_u(i, 410) % N_HOSTS}.example.com:users/repo{_u(i, 411) % 50}-{i}.git"
    elif family == "bare_identifier":
        ident = (
            f"10.5281/zenodo.{_u(i, 420) % 1000000}",
            "swh:1:rev:" + "".join("0123456789abcdef"[_u(i, 421 + j) % 16] for j in range(40)),
        )[_u(i, 422) % 2]
        paras[-1] += f" identifier {ident} cited."
    elif family == "stopword_low":
        declared_lang = "en"
        title = "Keyword listing"
        paras = [
            " ".join(
                _content_only_sentence(i, 430 + p * 10 + s, 14) for s in range(2)
            )
            for p in range(3)
        ]
    elif family == "symbol_high":
        declared_lang = "en"
        base = _paragraphs("en", i)
        paras = []
        for p in base[:3]:
            ws = p.split(" ")
            out = []
            for j, w in enumerate(ws):
                out.append(w)
                out.append("#$%^&*@!" if j % 2 == 0 else "++==~~")
            paras.append(" ".join(out))
    elif family == "repetition":
        declared_lang = "en"
        pair = ("click here", "read more", "buy now")[_u(i, 440) % 3]
        paras = [" ".join([pair] * 30), " ".join([pair] * 25)]
        title = pair.title()
    elif family == "gibberish":
        declared_lang = "en"
        title = _gibberish_word(i, 450).capitalize()
        paras = [
            " ".join(_gibberish_word(i, 460 + p * 40 + j) for j in range(18))
            for p in range(3)
        ]
    elif family == "multi_value_lang":
        second = ("fr", "es", "de")[_u(i, 470) % 3]
        declared_lang = f"en, {second}"
        title, paras = _title("en", i), _paragraphs("en", i)
    elif family == "empty_text":
        title, paras = "", []
    elif family == "outdated_ts":
        delta_days = 5 + _u(i, 480) % 200
        stale = (warc_ts - timedelta(days=delta_days)).date().isoformat()
        paras[-1] += f" Last updated: {stale}."

    if family == "empty_text":
        text = ""
        html = b"<html><head><title></title></head><body></body></html>"
    else:
        text = title + "\n" + "\n".join(paras)
        html = _wrap_html(title, paras, i)

    scrubbed = text
    for literal, repl in scrub_pairs:
        scrubbed = scrubbed.replace(literal, repl)

    page = {
        "url": url,
        "warc_ts": warc_ts,
        "html": html,
        "text": text,
        "lang": declared_lang,
    }
    label = {
        "url": url,
        "family": family,
        "expected_keep": exp_keep,
        "expected_rules": exp_rules,
        "expected_scrubbed_text": scrubbed,
    }
    return page, label


# --------------------------------------------------------------------------
# table / parquet materialization
# --------------------------------------------------------------------------

def generate_tables(n_rows: int, seed: int = SEED, start: int = 0) -> tuple[pa.Table, pa.Table]:
    pages, labels = [], []
    for i in range(start, start + n_rows):
        p, l = build_row(i, seed)
        pages.append(p)
        labels.append(l)
    pt = pa.Table.from_pylist(pages, schema=PAGES_SCHEMA)
    lt = pa.Table.from_pylist(labels, schema=LABELS_SCHEMA)
    return pt, lt


def write_corpus(
    out_dir: str, n_rows: int, seed: int = SEED, n_files: int = 8
) -> tuple[str, str]:
    """Materialize the corpus as ``out_dir/pages/part-*.parquet`` plus
    ``out_dir/labels.parquet``. Idempotent cache: if the marker file
    exists the corpus is reused (content is a pure function of
    ``(seed, n_rows, n_files)``).

    Multiple part files give the read stage file-level parallelism and
    the resume test its input fragments (SURVEY §7.2 step 8).
    """
    pages_dir = os.path.join(out_dir, "pages")
    labels_path = os.path.join(out_dir, "labels.parquet")
    marker = os.path.join(out_dir, f".done-{seed}-{n_rows}-{n_files}")
    if os.path.exists(marker):
        return pages_dir, labels_path
    os.makedirs(pages_dir, exist_ok=True)
    per_file = (n_rows + n_files - 1) // n_files
    label_tables = []
    for f in range(n_files):
        start = f * per_file
        cnt = min(per_file, n_rows - start)
        if cnt <= 0:
            break
        pt, lt = generate_tables(cnt, seed=seed, start=start)
        pq.write_table(pt, os.path.join(pages_dir, f"part-{f:05d}.parquet"))
        label_tables.append(lt)
    pq.write_table(pa.concat_tables(label_tables), labels_path)
    with open(marker, "w") as fh:
        fh.write("ok")
    return pages_dir, labels_path


def corpus_dir(n_rows: int, seed: int = SEED, n_files: int = 8, root: str = "/tmp/rsmc_corpus") -> tuple[str, str]:
    """Cached corpus under /tmp keyed by (seed, n_rows, n_files)."""
    d = os.path.join(root, f"s{seed}_n{n_rows}_f{n_files}")
    return write_corpus(d, n_rows, seed=seed, n_files=n_files)
