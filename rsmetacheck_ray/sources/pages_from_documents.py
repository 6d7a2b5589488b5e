"""Derive the engine's canonical ``pages`` table from the driver's
``documents`` parquet table — deterministically, with BOTH a vectorized
Arrow implementation (the Ray path) and a byte-identical SQL rendering
(the DuckDB oracle path) generated from the same constants.

This is the differential-testing bridge: the driver's correctness gate
runs ``queries()[name](sf_dir)`` (Ray) against ``oracle_sql()[name]``
(DuckDB) on the same parquet; both sides consume *this* synthesis, so
any divergence localizes to the operator under test, not the input.

Synthesis spec (pure function of ``doc_id``):
 - ``url``: six variants selected by ``doc_id % 11`` — a dead-path
   URL, a docs-homepage URL, an archive-host URL, a scheme-less
   shorthand, a versioned ``/vN/`` path (the URL side of the
   version_mismatch two-source compare) and a normal article URL
   (triggering the engine's URL rule family, the offline recast of the
   reference's P004/P005/P008/P009/P011/P015 URL rules,
   ``p005.py:4-29``, ``p009.py:6-65``).
 - ``text``: ``documents.text`` plus an injected trigger suffix chosen
   by ``doc_id % 13`` — residues 0-6: email / phone / IP / placeholder
   / bare DOI / raw SWHID / toxicity (the content rule family,
   ``p002.py:37-59``); residues 7-12: metadata declaration lines
   (License/Cite/Requires/Status/Identifier/Authors — the P006-W009
   recast family). Empty texts receive no suffix.
 - ``warc_ts``: ``2023-01-01T00:00:00Z + 137s * doc_id``.
 - ``html``: NULL (the extraction stage falls back to ``text``).
 - ``lang``: the declared ``documents.lang``.
 - plus the fixed TRIGGER_ROWS union (empty / repetition /
   boilerplate / multi-value / stale-date documents) on both sides of
   the differential.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _mod(arr: pa.Array, m: int) -> pa.Array:
    # pyarrow.compute has no modulo kernel — numpy round-trip (zero-copy in)
    return pa.array(arr.to_numpy(zero_copy_only=False) % m)

EPOCH_US = 1_672_531_200_000_000  # 2023-01-01T00:00:00Z
TS_STEP_S = 137

INJECT_MOD = 13
# residue -> appended trigger suffix (absent residues append nothing).
# 0-6 exercise the content/scrub family; 7-12 exercise the metadata-
# declaration family (P006/P007/P013/P019/W003/W004/W006/W009 recasts).
INJECTIONS: dict[int, str] = {
    0: " contact alice@example.org now.",
    1: " call +1-555-123-4567 now.",
    2: " server 10.0.0.5 up.",
    3: " copyright <year> holder.",
    4: " see 10.5281/zenodo.12345 here.",
    5: " id swh:1:rev:0123456789abcdef0123456789abcdef01234567 ok.",
    6: " utterly hellspawn behavior.",
    7: "\nLicense: ./LICENSE.md",
    8: "\nLicense: GPL\nVersion: 7",
    9: "\nCite: the software paper\nsee 10.5281/zenodo.424242 online.",
    10: "\nthis project is dual licensed\nLicense: MIT",
    11: "\nRequires: numpy\nStatus: https://www.repostatus.org/#active",
    12: "\nIdentifier: my nice package\nAuthors: ann, bob, cid\n"
        "Contributors: dee, eli\nsee https://example.org/pkg now.",
}

URL_MOD = 11
# residue -> url template; "{h}" = doc_id % 50, "{d}" = doc_id,
# "{k}" = doc_id % 20. Residues not listed use the default template.
URL_TEMPLATES: dict[int, str] = {
    0: "https://site{h}.example.com/wp-login.php?ref={d}",
    1: "https://docs.example{k}.org/page-{d}",
    2: "https://zenodo.org/record/{d}",
    3: "site{h}.example.com:users/repo{d}.git",
    # versioned path: the URL-side source for the version_mismatch
    # (P016/P017) two-source compare; text side is injection residue 8
    4: "https://site{h}.example.com/v{k}/docs-{d}",
}
URL_DEFAULT = "https://site{h}.example.com/articles/page-{d}"


# Planted trigger documents, appended to the documents table by BOTH
# sides of the differential (engine union + SQL UNION ALL), so the
# rules with no natural trigger in the driver corpus (empty text,
# repetition, boilerplate, multi-value lang, stale date) are exercised
# non-vacuously by the oracle. doc_ids sit far above any scale
# factor's range; residues mod 13 chosen so the injection suffix stays
# single-line (or, for the empty row, is skipped entirely).
TRIGGER_ROWS: list[tuple[int, str, str]] = [
    (10_000_003, "copyright 2019 example corp all rights reserved", "en"),
    (10_000_004, " ".join(["spam"] * 40), "en"),
    (10_000_005,
     "a perfectly ordinary short sentence with the usual words present",
     "en, fr"),
    (10_000_006,
     "Last updated: 2020-01-01 and the rest of this page has the usual "
     "english words", "en"),
    (10_000_007, "", "en"),
]


def trigger_table() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in TRIGGER_ROWS], pa.int64()),
            "text": pa.array([r[1] for r in TRIGGER_ROWS], pa.string()),
            "lang": pa.array([r[2] for r in TRIGGER_ROWS], pa.string()),
        }
    )


def _url_from_template(tpl: str, d: pa.Array) -> pa.Array:
    """Render one template over the whole doc_id column, vectorized."""
    h = pc.cast(_mod(d, 50), pa.string())
    k = pc.cast(_mod(d, 20), pa.string())
    ds = pc.cast(d, pa.string())
    parts: list = []
    rest = tpl
    while rest:
        nxt = min(
            (rest.find(t) for t in ("{h}", "{d}", "{k}") if rest.find(t) >= 0),
            default=-1,
        )
        if nxt < 0:
            parts.append(rest)
            break
        if nxt > 0:
            parts.append(rest[:nxt])
        parts.append({"{h}": h, "{d}": ds, "{k}": k}[rest[nxt : nxt + 3]])
        rest = rest[nxt + 3 :]
    n = len(d)
    arrays = [
        pa.array([p] * n, pa.string()) if isinstance(p, str) else p for p in parts
    ]
    return pc.binary_join_element_wise(*arrays, "")


def synthesize_pages(batch: pa.Table) -> pa.Table:
    """map_batches fn: documents(doc_id,text,lang,...) → pages schema
    (plus carried ``doc_id`` for joining results back to the oracle)."""
    d = batch.column("doc_id")
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()

    url = _url_from_template(URL_DEFAULT, d)
    res11 = _mod(d, URL_MOD)
    for r, tpl in URL_TEMPLATES.items():
        url = pc.if_else(pc.equal(res11, r), _url_from_template(tpl, d), url)

    res13 = _mod(d, INJECT_MOD)
    empty = pc.equal(text, "")
    for r, suffix in INJECTIONS.items():
        appended = pc.binary_join_element_wise(
            text, pa.array([suffix] * len(batch), pa.string()), ""
        )
        # empty pages stay empty (the empty_text rule must be reachable)
        text = pc.if_else(pc.and_(pc.equal(res13, r), pc.invert(empty)), appended, text)

    warc_us = pc.add(
        pc.multiply(pc.cast(d, pa.int64()), TS_STEP_S * 1_000_000), EPOCH_US
    )
    warc_ts = pc.cast(warc_us, pa.timestamp("us"))

    return pa.table(
        {
            "doc_id": d,
            "url": url,
            "warc_ts": warc_ts,
            "html": pa.nulls(len(batch), pa.binary()),
            "text": text,
            "lang": batch.column("lang"),
        }
    )


def _sql_url_expr() -> str:
    def render(tpl: str) -> str:
        out = []
        rest = tpl
        while rest:
            nxt = min(
                (rest.find(t) for t in ("{h}", "{d}", "{k}") if rest.find(t) >= 0),
                default=-1,
            )
            if nxt < 0:
                out.append(f"'{rest}'")
                break
            if nxt > 0:
                out.append(f"'{rest[:nxt]}'")
            out.append(
                {
                    "{h}": "CAST(doc_id % 50 AS VARCHAR)",
                    "{d}": "CAST(doc_id AS VARCHAR)",
                    "{k}": "CAST(doc_id % 20 AS VARCHAR)",
                }[rest[nxt : nxt + 3]]
            )
            rest = rest[nxt + 3 :]
        return " || ".join(out)

    cases = "\n      ".join(
        f"WHEN doc_id % {URL_MOD} = {r} THEN {render(t)}"
        for r, t in URL_TEMPLATES.items()
    )
    return f"CASE {cases}\n      ELSE {render(URL_DEFAULT)} END"


def _sql_text_expr() -> str:
    cases = "\n      ".join(
        "WHEN doc_id % {m} = {r} THEN text || '{s}'".format(
            m=INJECT_MOD, r=r, s=s.replace("'", "''")
        )
        for r, s in INJECTIONS.items()
    )
    return f"CASE WHEN text = '' THEN text {cases}\n      ELSE text END"


def pages_cte(source: str = "documents") -> str:
    """The synthesis as a DuckDB CTE body over the ``documents`` view —
    byte-identical to :func:`synthesize_pages` by construction. The
    source is ``source`` ∪ TRIGGER_ROWS, matching the engine-side
    :func:`trigger_table` union in the gate queries; pass another
    (doc_id, text, lang) CTE name to synthesize pages from a derived
    corpus (e.g. the duplicate-expanded gate_then_dedup input)."""
    trig = "\n      UNION ALL ".join(
        "SELECT {i} AS doc_id, '{t}' AS text, '{l}' AS lang".format(
            i=i, t=t.replace("'", "''"), l=l.replace("'", "''")
        )
        for i, t, l in TRIGGER_ROWS
    )
    return f"""
    SELECT
      doc_id,
      {_sql_url_expr()} AS url,
      TIMESTAMP '2023-01-01 00:00:00'
        + doc_id * INTERVAL {TS_STEP_S} SECOND AS warc_ts,
      {_sql_text_expr()} AS text,
      lang
    FROM (
      SELECT doc_id, text, lang FROM {source}
      UNION ALL {trig}
    ) documents
    """
