"""Soundex encoder (functions/phonetic.py): the classic NARA vectors,
the H/W-transparency and vowel-separation rules, edge shapes, and
engine agreement (the Arrow chain vs the DuckDB chain — identical by
construction, asserted anyway on a fuzzed corpus)."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsmetacheck_ray.functions.phonetic import soundex_arrow, soundex_sql

_CLASSIC = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",   # H transparent: S-H-C codes once
    "Ashcroft": "A261",
    "Tymczak": "T522",    # CZ same code, adjacent -> once
    "Pfister": "P236",    # P,F same code across the first letter
    "Honeyman": "H555",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "Jackson": "J250",
}


def test_classic_vectors():
    got = soundex_arrow(pa.array(list(_CLASSIC))).to_pylist()
    assert got == list(_CLASSIC.values())


def test_edges():
    got = soundex_arrow(
        pa.array(["a", "B", "12 3", "", None, "  gold widget", "o'brien"])
    ).to_pylist()
    # single letters pad with zeros; no alphabetic run -> null; only
    # the FIRST alphabetic run is coded (the apostrophe ends o'brien's
    # run at "o" — the documented spec both engines share)
    assert got == ["A000", "B000", None, None, None, "G430", "O000"]


def test_vowel_separation_vs_hw_transparency():
    # same-code letters separated by a VOWEL code twice ("pepper":
    # P,P across E -> two 1s survive); separated by H they collapse
    assert soundex_arrow(pa.array(["pepper"])).to_pylist() == ["P160"]
    assert soundex_arrow(pa.array(["bhb"])).to_pylist() == ["B000"]
    assert soundex_arrow(pa.array(["bab"])).to_pylist() == ["B100"]


def test_engine_agreement_fuzzed():
    rng = np.random.default_rng(3)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz '1-"))
    names = [
        "".join(rng.choice(letters, size=rng.integers(0, 14)))
        for _ in range(500)
    ]
    ours = soundex_arrow(pa.array(names)).to_pylist()
    con = duckdb.connect()
    theirs = [
        r[0]
        for r in con.execute(
            f"SELECT {soundex_sql('name')} "
            "FROM (SELECT unnest(?) AS name)", [names]
        ).fetchall()
    ]
    assert ours == theirs
