"""Quantized lexicon quality classifier (functions/classifier.py)."""

import pyarrow as pa

import ray.data as rd

from rsmetacheck_ray.functions.classifier import (
    CONTENT_WEIGHT,
    MARKER_WEIGHT,
    OOV_WEIGHT,
    classify_quality,
    default_lexicon,
)


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _score(out, doc_id):
    return out[out.doc_id == doc_id].iloc[0]


def test_scores_are_exact_weight_sums(ray_session):
    out = classify_quality(
        _ds(
            [
                (1, "the system value"),        # 3 + 1 + 1
                (2, "zzz qqq"),                 # -2 -2
                (3, "the zzz"),                 # 3 - 2
                (4, ""),                        # no tokens
                (5, None),                      # null text == no tokens
            ]
        )
    ).to_pandas()
    r1 = _score(out, 1)
    assert (r1.n_tokens, r1.score_total, r1.score_mean) == (3, 5, 5 / 3)
    assert bool(r1.keep_quality)
    r2 = _score(out, 2)
    assert r2.score_total == -4 and not bool(r2.keep_quality)
    r3 = _score(out, 3)
    assert r3.score_total == 1 and bool(r3.keep_quality)
    for d in (4, 5):
        r = _score(out, d)
        assert (r.n_tokens, r.score_total, r.score_mean) == (0, 0, 0.0)
        assert bool(r.keep_quality)  # 0 >= 0: empty docs pass by default


def test_default_lexicon_shape():
    lex = default_lexicon()
    assert lex["the"] == MARKER_WEIGHT
    assert lex["system"] == CONTENT_WEIGHT
    assert "zzz" not in lex and OOV_WEIGHT < 0
    assert len(lex) >= 100


def test_custom_lexicon_and_threshold(ray_session):
    # threshold 1/2: mean weight must reach 0.5
    out = classify_quality(
        _ds([(1, "good good bad"), (2, "good bad bad")]),
        lexicon={"good": 1, "bad": 0},
        oov_weight=0,
        th_num=1,
        th_den=2,
    ).to_pandas()
    assert bool(_score(out, 1).keep_quality)   # 2/3 >= 1/2
    assert not bool(_score(out, 2).keep_quality)  # 1/3 < 1/2


def test_unicode_whitespace_matches_sql_semantics(ray_session):
    # U+00A0 is whitespace to pc.utf8_split_whitespace but NOT to the
    # SQL oracles' RE2 '\S+': the canonical splitter must treat
    # 'the system value' as TWO tokens, like count_ws_tokens does
    out = classify_quality(_ds([(1, "the\u00A0system value")])).to_pandas()
    assert out.n_tokens.tolist() == [2]
    # 'the system' is one OOV token (-2); 'value' is content (+1)
    assert out.score_total.tolist() == [-1]


def test_quality_bins_quartile_edges(ray_session, tmp_path):
    """8 distinct scores -> quantile_disc cutpoints at sorted positions
    1/3/5, bins by count-of-cuts-below: [0,1,1,2,2,3,3,3]."""
    import pyarrow.parquet as pq

    from rsmetacheck_ray.pipelines.queries import q_quality_bins

    # k OOV tokens -> score k * OOV_WEIGHT: 8 docs, 8 distinct scores
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, 9), pa.int64()),
                "text": pa.array(
                    [" ".join(["zzqx"] * k) for k in range(1, 9)], pa.string()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    df = (
        q_quality_bins(str(tmp_path))
        .to_pandas()
        .sort_values("score_total")
        .reset_index(drop=True)
    )
    assert df["bin"].tolist() == [0, 1, 1, 2, 2, 3, 3, 3]


def test_every_document_is_scored(ray_session):
    rows = [(i, "the and was" if i % 2 else "junky tokens only") for i in range(20)]
    out = classify_quality(_ds(rows)).to_pandas()
    assert len(out) == 20
    assert out.keep_quality.sum() == 10
