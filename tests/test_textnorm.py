"""Unicode NFC normalization (functions/textnorm.py): composition
cases, the ASCII fast path, and CPython-vs-DuckDB agreement (the
assumption the normalize_text oracle rests on). All non-ASCII input is
spelled with explicit escapes — an editor silently NFC-normalizing
this file must not change what the tests feed in."""

from __future__ import annotations

import unicodedata

import duckdb
import pyarrow as pa

from rsmetacheck_ray.functions.textnorm import nfc_normalize_array, nfc_stage

CASES = [
    "cafe\u0301",        # e + combining acute -> U+00E9
    "caf\u00e9",         # already composed: unchanged
    "\u212b",            # ANGSTROM SIGN -> U+00C5
    "A\u030angstrom",    # A + combining ring -> U+00C5
    "d\u0307\u0323ot",   # canonical reordering of two marks
    "plain ascii only",
    "",
]


def _norm(texts):
    out, changed = nfc_normalize_array(pa.array(texts, pa.string()))
    return out.to_pylist(), changed.to_pylist()


def test_matches_cpython_nfc():
    got, changed = _norm(CASES)
    exp = [unicodedata.normalize("NFC", t) for t in CASES]
    assert got == exp
    assert changed == [g != t for g, t in zip(got, CASES)]


def test_known_compositions():
    got, changed = _norm(CASES[:4])
    assert got == ["caf\u00e9", "caf\u00e9", "\u00c5", "\u00c5ngstrom"]
    assert changed == [True, False, True, True]


def test_ascii_fast_path_all_ascii_batch():
    got, changed = _norm(["abc", "def 123", ""])
    assert got == ["abc", "def 123", ""]
    assert changed == [False, False, False]


def test_null_text():
    out, changed = nfc_normalize_array(
        pa.array([None, "e\u0301"], pa.string())
    )
    assert out.to_pylist()[0] == ""
    assert changed.to_pylist() == [False, True]


def test_duckdb_agreement():
    got, _ = _norm(CASES)
    con = duckdb.connect()
    ph = ",".join(f"({i}, ?)" for i in range(len(CASES)))
    con.execute(
        f"CREATE TABLE t AS SELECT * FROM (VALUES {ph}) v(i, s)", CASES
    )
    exp = [
        r[0]
        for r in con.execute(
            "SELECT nfc_normalize(s) FROM t ORDER BY i"
        ).fetchall()
    ]
    assert got == exp


def test_stage_shape():
    b = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["cafe\u0301"], pa.string()),
        }
    )
    out = nfc_stage(b)
    assert out.column_names == ["doc_id", "text", "changed"]
    assert out.column("text").to_pylist() == ["caf\u00e9"]
    assert out.column("changed").to_pylist() == [True]
