"""zlib compression-ratio quality signal (queries.q_doc_compression):
exactness vs a direct reference, repetition behavior, bounds."""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from rsmetacheck_ray.pipelines.queries import (
    _ZRATIO_SCAN_BYTES,
    q_doc_compression,
)


def _write_documents(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_matches_direct_zlib(ray_session, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog " * 20,
        "spam " * 2000,          # > 4 KiB: prefix-bounded
        "",                       # empty: 0/0 -> 0.0
        "x",
        "tok " + "".join(chr(0x4E00 + i % 50) for i in range(300)),
    ]
    out = (
        q_doc_compression(_write_documents(tmp_path, texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(texts):
        buf = t.encode("utf-8")[:_ZRATIO_SCAN_BYTES]
        assert out.loc[i, "raw_len"] == len(buf)
        exp_comp = len(zlib.compress(buf, 6)) if buf else 0
        assert out.loc[i, "comp_len"] == exp_comp
        exp = exp_comp / len(buf) if buf else 0.0
        assert out.loc[i, "zratio"] == exp


def test_repetitive_text_compresses_below_random(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    rand = "".join(chr(33 + int(c)) for c in rng.integers(0, 90, 3000))
    rep = "boilerplate footer row | " * 120
    out = (
        q_doc_compression(_write_documents(tmp_path, [rep, rand]))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["zratio"].iloc[0] < 0.1      # template: tiny ratio
    assert out["zratio"].iloc[1] > 0.8      # random: near-incompressible
    assert (out["zratio"] <= 1.2).all() and (out["zratio"] >= 0).all()


def test_large_string_text_column(ray_session, tmp_path):
    """Regression: a large_string text column must produce the same
    ratios as plain string (the offsets buffer is int64 there; a
    hardcoded int32 read returned garbage negative lengths)."""
    texts = ["hello world " * 30, "x", ""]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.large_string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = (
        q_doc_compression(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, s in enumerate(texts):
        buf = s.encode("utf-8")[:_ZRATIO_SCAN_BYTES]
        assert out.loc[i, "raw_len"] == len(buf)
        exp = len(zlib.compress(buf, 6)) if buf else 0
        assert out.loc[i, "comp_len"] == exp
