"""JSONL pages source: schema coercion to the fixed Arrow schema and
format equivalence — the SAME corpus through parquet and JSONL inputs
must produce byte-identical gate decisions."""

from __future__ import annotations

import base64
import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _to_jsonl(parquet_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for f in sorted(glob.glob(os.path.join(parquet_dir, "*.parquet"))):
        t = pq.read_table(f)
        rows = t.to_pylist()
        with open(
            os.path.join(out_dir, os.path.basename(f).replace(".parquet", ".jsonl")),
            "w",
        ) as fh:
            for r in rows:
                ts = r["warc_ts"]
                r["warc_ts"] = ts.strftime("%Y-%m-%dT%H:%M:%S") + (
                    f".{ts.microsecond:06d}" if ts.microsecond else ""
                )
                if r.get("html") is not None:
                    r["html"] = base64.b64encode(r["html"]).decode("ascii")
                fh.write(json.dumps(r) + "\n")


def test_coerce_pages_types_and_nulls(ray_session):
    from rsmetacheck_ray.sources.jsonl_pages import coerce_pages

    b = pa.table(
        {
            "url": pa.array(["https://a.example.com/x", None]),
            "warc_ts": pa.array(["2023-01-01T00:02:17.500000", "garbage"]),
            "html": pa.array([base64.b64encode(b"<p>hi</p>").decode(), "!!!notb64"]),
            "text": pa.array(["hello", None]),
            "lang": pa.array(["en", "fr"]),
        }
    )
    out = coerce_pages(b)
    assert out.schema.field("warc_ts").type == pa.timestamp("us")
    assert out.column("warc_ts")[0].as_py().microsecond == 500000
    assert out.column("warc_ts")[1].as_py() is None  # unparseable -> null
    assert out.column("html")[0].as_py() == b"<p>hi</p>"
    assert out.column("html")[1].as_py() is None  # malformed b64 -> null


def test_jsonl_gate_matches_parquet_gate(ray_session, small_corpus, tmp_path):
    from rsmetacheck_ray.pipelines.quality_gate import run_gate

    pages_dir, _ = small_corpus
    jdir = tmp_path / "jsonl"
    _to_jsonl(pages_dir, str(jdir))

    out_p = tmp_path / "out_parquet"
    out_j = tmp_path / "out_jsonl"
    mp = run_gate(pages_dir, str(out_p), n_partitions=2)
    mj = run_gate(str(jdir), str(out_j), n_partitions=2, input_format="jsonl")
    assert mp == mj

    a = (
        pq.read_table(str(out_p / "docs"))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        pq.read_table(str(out_j / "docs"))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_coerce_timestamp_strictness(ray_session):
    """tz offsets and trailing garbage are NOT silently mangled — they
    null out per the null-means-skip discipline (round-3 code review
    found the fraction digits bleeding into the offset)."""
    from rsmetacheck_ray.sources.jsonl_pages import coerce_pages

    b = pa.table(
        {
            "url": pa.array(["u"] * 5),
            "warc_ts": pa.array(
                [
                    "2023-01-01T00:00:00.5+01:00",   # offset -> null
                    "2023-01-01T00:00:00XYZ",        # garbage -> null
                    "2023-01-01T00:00:00.5",         # 500000 us
                    "2023-01-01T00:00:00.123456",    # exact us
                    "2023-01-01T00:00:00",           # whole second
                ]
            ),
            "text": pa.array(["t"] * 5),
            "lang": pa.array(["en"] * 5),
        }
    )
    out = coerce_pages(b).column("warc_ts").to_pylist()
    assert out[0] is None and out[1] is None
    assert out[2].microsecond == 500_000
    assert out[3].microsecond == 123_456
    assert out[4].microsecond == 0


def test_jsonl_corrupt_fragment_skipped(ray_session, small_corpus, tmp_path):
    """A malformed JSONL fragment is skipped and recorded, like the
    parquet path (the reference's policy IS a JSON-input policy)."""
    from rsmetacheck_ray.pipelines.quality_gate import run_gate

    pages_dir, _ = small_corpus
    jdir = tmp_path / "jsonl"
    _to_jsonl(pages_dir, str(jdir))
    bad = jdir / "zz-corrupt.jsonl"
    bad.write_text('{"url": "https://x.example.com", "text": TRUNCAT')

    out = tmp_path / "out"
    metrics = run_gate(str(jdir), str(out), n_partitions=2, input_format="jsonl")
    assert metrics["total_documents"] == 2000
    assert metrics["skipped_fragments"] == [str(bad)]


def test_wrong_input_format_raises(ray_session, small_corpus, tmp_path):
    from rsmetacheck_ray.pipelines.quality_gate import run_gate

    pages_dir, _ = small_corpus
    with pytest.raises(ValueError, match="wrong input_format"):
        run_gate(pages_dir, str(tmp_path / "o"), input_format="jsonl")
