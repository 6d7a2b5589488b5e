"""Bigram-LM document scoring (functions/ngram_lm.score_bigram_lm)."""

from __future__ import annotations

import math

import pyarrow as pa

import ray.data as rd

from rsmetacheck_ray.functions.ngram_lm import (
    DEFAULT_FLOOR_P,
    score_bigram_lm,
)

_FLOOR_TERM = math.floor(-math.log(DEFAULT_FLOOR_P) * 1_000_000_000.0)


def _corpus(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_all_oov_doc_scores_at_floor(ray_session):
    """Unique-word doc: every bigram count 1 < min_count ⇒ pruned ⇒
    each term is the exact floor constant."""
    ds = _corpus([(1, "alpha beta gamma delta")])
    out = score_bigram_lm(ds, min_count=2).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_bigrams"] == 3
    assert out.loc[1, "nll_fp"] == 3 * _FLOOR_TERM


def test_deterministic_phrase_scores_zero(ray_session):
    """p(w2|w1) = 1 for every bigram of a fixed repeated phrase ⇒
    -ln(1) = 0 ⇒ nll_fp = 0."""
    rows = [(i, "to be or not") for i in range(8)]
    out = (
        score_bigram_lm(_corpus(rows), min_count=2)
        .to_pandas()
        .set_index("doc_id")
    )
    assert (out["n_bigrams"] == 3).all()
    assert (out["nll_fp"] == 0).all()


def test_short_docs_emit_no_row(ray_session):
    rows = [(1, "solo"), (2, ""), (3, "two words")]
    out = score_bigram_lm(_corpus(rows), min_count=1).to_pandas()
    assert sorted(out["doc_id"]) == [3]


def test_mixed_probability_exact(ray_session):
    """Hand-computed: corpus 'a b', 'a b', 'a c' with min_count=1 ⇒
    p(b|a)=2/3, p(c|a)=1/3."""
    rows = [(1, "a b"), (2, "a b"), (3, "a c")]
    out = (
        score_bigram_lm(_corpus(rows), min_count=1)
        .to_pandas()
        .set_index("doc_id")
    )
    t_b = math.floor(-math.log(2 / 3) * 1_000_000_000.0)
    t_c = math.floor(-math.log(1 / 3) * 1_000_000_000.0)
    assert out.loc[1, "nll_fp"] == t_b
    assert out.loc[2, "nll_fp"] == t_b
    assert out.loc[3, "nll_fp"] == t_c


def test_layout_independent(ray_session):
    rows = [(i, f"w{i % 5} common w{(i + 1) % 5} common tail") for i in range(40)]
    a = (
        score_bigram_lm(_corpus(rows), min_count=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ds2 = _corpus(rows).repartition(9)
    b = (
        score_bigram_lm(ds2, min_count=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
