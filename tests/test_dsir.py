"""DSIR importance weights (functions/dsir.py): path equivalence and
edge semantics the sf-corpus oracle can't isolate — broadcast vs
shuffle plan identity, zero-token documents, empty target slice,
fixed-point exactness, target-slice direction."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data as rd

from rsmetacheck_ray.functions.dsir import FP_SCALE, dsir_weights


def _corpus(rows):
    ids, texts, tgts = zip(*rows)
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "is_target": pa.array(tgts, pa.bool_()),
            }
        )
    )


def _run(rows, **kw):
    df = (
        dsir_weights(_corpus(rows), target_col="is_target", **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return df


ROWS = [
    (0, "alpha beta alpha", True),
    (1, "beta gamma", False),
    (2, "alpha alpha delta", True),
    (3, "", False),  # zero tokens
    (4, "gamma gamma gamma", False),
]


def test_weights_match_reference_model(ray_session):
    df = _run(ROWS)
    # hand model: occurrences over the 5 docs
    c_r = {"alpha": 4, "beta": 2, "gamma": 4, "delta": 1}
    c_t = {"alpha": 4, "beta": 1, "gamma": 0, "delta": 1}
    v, n_r, n_t = 4, 11, 6

    def term_fp(tok):
        t = (math.log(c_t[tok] + 1) - math.log(n_t + v)) - (
            math.log(c_r[tok] + 1) - math.log(n_r + v)
        )
        return math.floor(t * FP_SCALE)

    def doc_fp(text):
        return sum(term_fp(w) for w in text.split() if w)

    expect = {i: doc_fp(t) for i, t, _ in ROWS}
    got = dict(zip(df["doc_id"], df["log_weight_fp"]))
    assert got == expect
    assert df.loc[df.doc_id == 3, "n_tokens"].iloc[0] == 0
    assert df.loc[df.doc_id == 3, "log_weight"].iloc[0] == 0.0
    # direction: target-heavy docs score above the anti-target doc
    assert expect[0] > expect[4] and expect[2] > expect[4]


def test_shuffle_plan_identical_to_broadcast(ray_session):
    a = _run(ROWS)
    b = _run(ROWS, broadcast_max_terms=0, num_partitions=4)
    assert a.equals(b)


def test_empty_target_slice_is_uniform_penalty(ray_session):
    # no target docs: c_t=0 and N_t=0 for every token — weights are
    # still defined (add-one smoothing) and finite
    rows = [(0, "x y", False), (1, "y z", False)]
    df = _run(rows)
    assert np.isfinite(df["log_weight"]).all()


def test_token_free_corpus(ray_session):
    df = _run([(0, "", False), (1, None, True)])
    assert df["n_tokens"].tolist() == [0, 0]
    assert df["log_weight_fp"].tolist() == [0, 0]
