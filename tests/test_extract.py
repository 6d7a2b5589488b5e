"""Extraction invariant: byte-identical text per url
(``BASELINE.json.input_hint``), plus unit cases in the reference's
dict-in/dict-out parametrized style (``test_p001.py:13-77``)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from rsmetacheck_ray.datagen import generate_tables
from rsmetacheck_ray.stages.extract import extract_stage, extract_text_array


def test_extraction_matches_text_column_byte_identical():
    pages, _ = generate_tables(2000)
    out = extract_stage(pages)
    ext = out.column("extracted_text").to_pylist()
    txt = pages.column("text").to_pylist()
    assert ext == txt


def test_extraction_deterministic_across_calls():
    pages, _ = generate_tables(300)
    a = extract_stage(pages).column("extracted_text").to_pylist()
    b = extract_stage(pages).column("extracted_text").to_pylist()
    assert a == b


def test_html_column_dropped():
    pages, _ = generate_tables(10)
    out = extract_stage(pages)
    assert "html" not in out.column_names
    assert "extracted_text" in out.column_names


@pytest.mark.parametrize(
    "html,expected",
    [
        (b"<html><body><p>hello world</p></body></html>", "hello world"),
        (b"<html><head><title>T</title></head><body><h1>A</h1><p>b</p></body></html>", "A\nb"),
        (b"<body><script>var x=1;</script><p>keep</p></body>", "keep"),
        (b"<body><style>p{}</style><p>keep</p></body>", "keep"),
        (b"<body><nav>Home</nav><p>keep</p><footer>foot</footer></body>", "keep"),
        (b"<body><p>a &amp; b &lt;c&gt;</p></body>", "a & b <c>"),
        (b"<body><p>  spaced   out  </p></body>", "spaced out"),
        (b"<body><p>l1</p><p></p><p>l2</p></body>", "l1\nl2"),
        (b"", ""),
        (b"plain text no tags", "plain text no tags"),
    ],
)
def test_extract_unit_cases(html, expected):
    arr = pa.array([html], pa.binary())
    out = extract_text_array(arr)
    assert out.to_pylist() == [expected]


def test_null_html_falls_back_to_text_column():
    t = pa.table(
        {
            "url": ["u1"],
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([None], pa.binary()),
            "text": ["fallback text"],
            "lang": ["en"],
        }
    )
    out = extract_stage(t)
    assert out.column("extracted_text").to_pylist() == ["fallback text"]
