"""Distributed bigram-LM estimation (functions/ngram_lm.py)."""

import pyarrow as pa

import ray.data as rd

from rsmetacheck_ray.functions.ngram_lm import train_bigram_lm


def _ds(texts, parallelism=None):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = rd.from_arrow(t)
    return ds.repartition(parallelism) if parallelism else ds


def _lm(texts, **kw):
    df = train_bigram_lm(_ds(texts), **kw).to_pandas()
    return {(r.w1, r.w2): (r.n, r.p) for r in df.itertuples()}


def test_counts_and_conditionals(ray_session):
    out = _lm(["a b a b c"])
    # bigrams: (a,b) x2, (b,a), (b,c)
    assert out[("a", "b")] == (2, 1.0)
    assert out[("b", "a")] == (1, 0.5)
    assert out[("b", "c")] == (1, 0.5)


def test_no_cross_document_bigrams(ray_session):
    out = _lm(["x y", "y z"])
    assert set(out) == {("x", "y"), ("y", "z")}
    # single-token / empty / None docs emit nothing
    assert _lm(["solo", "", "a b"]) == {("a", "b"): (1, 1.0)}


def test_min_count_prunes_after_totalling(ray_session):
    # context 'q': (q,r) x3 and (q,s) x1 -> p(q,r)=0.75 must use the
    # FULL total 4 even though (q,s) itself is pruned at min_count=3
    out = _lm(["q r q r q r q s"], min_count=3)
    assert out == {("q", "r"): (3, 0.75), ("r", "q"): (3, 1.0)}


def test_probabilities_sum_to_one_per_context(ray_session):
    df = train_bigram_lm(_ds(["a b a c a d b c b d"] * 7)).to_pandas()
    sums = df.groupby("w1")["p"].sum()
    assert (abs(sums - 1.0) < 1e-12).all()


def test_deterministic_across_partitionings(ray_session):
    texts = [f"w{i % 5} w{(i + 1) % 7} w{i % 3} common token" for i in range(60)]

    def run(p):
        return (
            train_bigram_lm(_ds(texts, parallelism=p))
            .to_pandas()
            .sort_values(["w1", "w2"])
            .reset_index(drop=True)
        )

    import pandas as pd

    pd.testing.assert_frame_equal(run(1), run(9))
