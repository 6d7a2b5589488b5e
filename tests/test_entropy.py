"""Character-entropy (functions/entropy.py) and vocab-coverage edge
cases: empty/NULL text, uniform vs skewed distributions, the non-ASCII
re-encode path vs the ASCII zero-copy fast path, OOV boundary ties."""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_docs(d, texts, langs=None):
    t = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs or ["en"] * len(texts), pa.string()),
            "source": pa.array(["web"] * len(texts), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))


def _entropy(d):
    from rsmetacheck_ray.functions.entropy import char_entropy
    from rsmetacheck_ray.partitioning import read_pq

    return (
        char_entropy(
            read_pq(os.path.join(d, "documents.parquet"),
                    columns=["doc_id", "text"])
        )
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )


def test_entropy_empty_and_null_are_zero(ray_session, tmp_path):
    d = str(tmp_path)
    _write_docs(d, ["", None, "a"])
    out = _entropy(d)
    assert out.loc[1, "n_chars"] == 0 and out.loc[1, "entropy"] == 0.0
    assert out.loc[2, "n_chars"] == 0 and out.loc[2, "entropy"] == 0.0
    # single repeated char: zero entropy, nonzero length
    assert out.loc[3, "n_chars"] == 1 and out.loc[3, "entropy"] == 0.0


def test_entropy_uniform_beats_skewed(ray_session, tmp_path):
    d = str(tmp_path)
    _write_docs(d, ["abcdefgh", "aaaaaaab", "aaaaaaaa"])
    out = _entropy(d)
    # uniform over 8 chars ≈ ln(8); skewed < uniform; constant ≈ 0
    # (constant text keeps the ≤1e-9 nano-log quantization residue —
    # the oracle computes the identical residue, hence hash-green)
    assert abs(out.loc[1, "entropy"] - math.log(8)) < 1e-9
    assert 0 < out.loc[2, "entropy"] < out.loc[1, "entropy"]
    assert 0 <= out.loc[3, "entropy"] < 1e-8


def test_entropy_nonascii_path_matches_ascii_semantics(ray_session, tmp_path):
    """é€ codepoints must count as single characters (the utf-32
    re-encode path), giving the same entropy as an ASCII text with the
    same distribution shape."""
    d = str(tmp_path)
    _write_docs(d, ["ab", "é€", "日本語テキスト"])
    out = _entropy(d)
    assert out.loc[1, "n_chars"] == 2 and out.loc[2, "n_chars"] == 2
    assert out.loc[1, "entropy"] == out.loc[2, "entropy"]  # both 2 distinct
    assert out.loc[3, "n_chars"] == 7


def test_entropy_mixed_batch_exact_vs_numpy(ray_session, tmp_path):
    """Brute-force per-doc reference (collections.Counter) within the
    documented 1e-9 nano-log quantization error."""
    from collections import Counter

    d = str(tmp_path)
    rng = np.random.default_rng(3)
    texts = [
        "".join(rng.choice(list("abcde \n,é"), size=int(n)))
        for n in rng.integers(1, 200, 25)
    ]
    _write_docs(d, texts)
    out = _entropy(d)
    for i, t in enumerate(texts, start=1):
        c = np.array(list(Counter(t).values()), dtype=np.float64)
        n = c.sum()
        ref = math.log(n) - float((c * np.log(c)).sum()) / n
        assert abs(out.loc[i, "entropy"] - ref) < 1e-6, i
        assert out.loc[i, "n_chars"] == len(t)


def test_vocab_coverage_counts_oov(ray_session, tmp_path):
    d = str(tmp_path)
    # "the" dominates the corpus; "zzz" appears once (outside top-1)
    _write_docs(d, ["the the the", "the zzz", "", None])
    from rsmetacheck_ray.pipelines.queries import q_vocab_coverage

    out = (
        q_vocab_coverage(str(d), k=1)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_tokens"] == 3 and out.loc[1, "n_oov"] == 0
    assert out.loc[2, "n_tokens"] == 2 and out.loc[2, "n_oov"] == 1
    assert out.loc[2, "oov_rate"] == 0.5
    assert out.loc[3, "n_tokens"] == 0 and out.loc[3, "oov_rate"] == 0.0
    assert out.loc[4, "n_tokens"] == 0
