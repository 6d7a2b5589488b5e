"""Per-document top-k TF-IDF (functions/tfidf.py) — brute-force
differential, broadcast↔shuffle plan parity, tie-breaks, edges."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data as rd

from rsmetacheck_ray.functions.tfidf import (
    document_frequencies,
    tfidf_top_terms,
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


def _brute(rows, k=5):
    n = len(rows)
    df: dict[str, int] = {}
    for _, t in rows:
        for w in set(t.split()):
            df[w] = df.get(w, 0) + 1
    out = []
    for d, t in rows:
        tf: dict[str, int] = {}
        for w in t.split():
            tf[w] = tf.get(w, 0) + 1
        scored = [
            (w, c, df[w], float(c) * math.log(n / df[w]))
            for w, c in tf.items()
        ]
        scored.sort(key=lambda x: (-x[3], x[0]))
        for r, (w, c, dfv, s) in enumerate(scored[:k], 1):
            out.append((d, w, c, dfv, s, r))
    return sorted(out)


ROWS = [
    (1, "apple banana apple cherry"),
    (2, "banana banana durian"),
    (3, "cherry elderberry apple apple apple"),
    (4, "fig fig fig fig grape"),
]


def _sorted_tuples(ds):
    df = ds.to_pandas().sort_values(["doc_id", "rnk"])
    return sorted(
        (int(r.doc_id), r.term, int(r.tf), int(r.df), float(r.score), int(r.rnk))
        for r in df.itertuples()
    )


def test_matches_brute_force(ray_session):
    got = _sorted_tuples(tfidf_top_terms(_ds(ROWS), k=3, n_docs=4))
    assert got == _brute(ROWS, k=3)


def test_document_frequencies(ray_session):
    df = document_frequencies(_ds(ROWS)).to_pandas()
    m = dict(zip(df["term"], df["df"]))
    assert m == {
        "apple": 2, "banana": 2, "cherry": 2,
        "durian": 1, "elderberry": 1, "fig": 1, "grape": 1,
    }


def test_shuffle_plan_matches_broadcast(ray_session):
    bc = _sorted_tuples(tfidf_top_terms(_ds(ROWS), k=3, n_docs=4))
    sh = _sorted_tuples(
        tfidf_top_terms(
            _ds(ROWS), k=3, n_docs=4, broadcast_max_terms=0,
            num_partitions=3,
        )
    )
    assert sh == bc


def test_score_ties_break_on_term(ray_session):
    # both terms: tf=1, df=1 -> identical score; rank by term ASC
    rows = [(1, "zzz aaa"), (2, "shared shared")]
    out = (
        tfidf_top_terms(_ds(rows), k=2, n_docs=2)
        .to_pandas()
        .sort_values(["doc_id", "rnk"])
    )
    d1 = out[out.doc_id == 1]
    assert d1["term"].tolist() == ["aaa", "zzz"]
    assert d1["rnk"].tolist() == [1, 2]


def test_k_bounds_and_empty(ray_session):
    rows = [(1, "a b"), (2, "")]
    out = tfidf_top_terms(_ds(rows), k=5, n_docs=2).to_pandas()
    # doc 1 has only 2 distinct terms; doc 2 emits nothing
    assert len(out) == 2
    assert set(out["doc_id"]) == {1}
    empty = tfidf_top_terms(_ds([]), k=5, n_docs=0)
    assert empty.count() == 0
