"""URL canonicalization (functions/urlnorm.py): edge-case behavior and
engine-vs-DuckDB byte parity on inputs the sf corpus can't produce
(schemeless, weird ports, empty, null)."""

from __future__ import annotations

import duckdb
import pyarrow as pa

from rsmetacheck_ray.functions.urlnorm import (
    canonical_sql_expr,
    canonicalize_url_array,
)

EDGE_URLS = [
    "Http://Host3.Example.COM:80/Dir/page7?utm_source=f&utm_medium=r#Sec",
    "HTTPS://WWW.X.IO:443/A?id=7&utm_campaign=x",
    "http://a.com/p?utm_s=1",
    "ftp://Mixed.Case/Path",
    "no-scheme/Path?utm_x=1&id=2",
    "http://h.com:8080/keep:port",  # non-default port survives
    "https://h.com:443",            # default port at end-of-string
    "http://h.com:80?q=1",          # default port before query
    "http://h.com/CaseSensitive/PATH",
    "https://h.com:80/wrong-scheme-port-survives",
    "Http://A.com/x\ny",  # whitespace-mangled crawl URL (newline)
    "",
]


def _canon(urls):
    return canonicalize_url_array(pa.array(urls, pa.string())).to_pylist()


def test_known_values():
    got = _canon(EDGE_URLS[:3])
    assert got == [
        "http://host3.example.com/Dir/page7",
        "https://www.x.io/A?id=7",
        "http://a.com/p",
    ]


def test_path_case_preserved_host_lowered():
    assert _canon(["HTTP://UP.COM/MiXeD"]) == ["http://up.com/MiXeD"]


def test_non_default_port_and_wrong_scheme_port_survive():
    got = _canon(
        ["http://h.com:8080/x", "https://h.com:80/x", "http://h.com:443/x"]
    )
    assert got == [
        "http://h.com:8080/x", "https://h.com:80/x", "http://h.com:443/x",
    ]


def test_null_and_empty():
    assert _canon([None, ""]) == ["", ""]


def test_duckdb_byte_parity():
    got = _canon(EDGE_URLS)
    con = duckdb.connect()
    placeholders = ",".join(f"({i}, ?)" for i in range(len(EDGE_URLS)))
    con.execute(
        f"CREATE TABLE t AS SELECT * FROM (VALUES {placeholders}) v(i, url)",
        EDGE_URLS,
    )
    exp = [
        r[0]
        for r in con.execute(
            f"SELECT {canonical_sql_expr('url')} FROM t ORDER BY i"
        ).fetchall()
    ]
    assert got == exp
