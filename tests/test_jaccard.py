"""Exact n-gram Jaccard operator (functions/jaccard.py)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from rsmetacheck_ray.functions.jaccard import (
    jaccard_verify_pairs,
    ngram_jaccard_pairs,
    rare_gram_candidate_pairs,
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


def _brute_jaccard(a: str, b: str, k: int = 5) -> float:
    def grams(t):
        w = t.split()
        return {tuple(w[i : i + k]) for i in range(len(w) - k + 1)}

    sa, sb = grams(a), grams(b)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
NEAR = BASE + " extra tail words appended here"
OTHER = "one two three four five six seven eight nine ten"


def test_matches_brute_force(ray_session):
    rows = [(1, BASE), (2, NEAR), (3, OTHER)]
    out = ngram_jaccard_pairs(_ds(rows), min_jaccard=0.0).to_pandas()
    got = {
        (r.doc_id_a, r.doc_id_b): r.jaccard for r in out.itertuples()
    }
    assert (1, 2) in got
    assert got[(1, 2)] == _brute_jaccard(BASE, NEAR)
    # disjoint doc 3 shares no gram with anything: never a candidate
    assert all(3 not in p for p in got)


def test_exact_duplicate_scores_one(ray_session):
    out = ngram_jaccard_pairs(_ds([(1, BASE), (2, BASE)])).to_pandas()
    assert out[["doc_id_a", "doc_id_b"]].values.tolist() == [[1, 2]]
    assert out["jaccard"].tolist() == [1.0]
    assert out["n_common"].tolist() == out["n_a"].tolist()


def test_rare_gram_pruning_hides_common_grams(ray_session):
    # the shared gram appears in every doc (df = 9 > max_df = 8), so
    # the pruning contract makes all pairs invisible
    rows = [(i, f"w{i} x{i} shared one two three four y{i}") for i in range(9)]
    cand = rare_gram_candidate_pairs(_ds(rows), max_df=8).to_pandas()
    assert len(cand) == 0
    # raising max_df makes them candidates again
    cand = rare_gram_candidate_pairs(_ds(rows), max_df=9).to_pandas()
    assert len(cand) == 36  # C(9,2): every pair shares the rare gram


def test_candidates_distinct_and_ordered(ray_session):
    # two docs sharing MANY rare grams still yield ONE pair row, with
    # the shared rare-gram count
    rows = [(5, BASE), (9, BASE)]
    cand = rare_gram_candidate_pairs(_ds(rows)).to_pandas()
    assert cand[["doc_id_a", "doc_id_b"]].values.tolist() == [[5, 9]]
    assert cand["n_shared_rare"].tolist() == [6]  # 10 words -> 6 grams


def test_short_docs_and_empty_input(ray_session):
    short = _ds([(1, "a b c"), (2, "a b c")])  # < 5 words: no grams
    assert ngram_jaccard_pairs(short).count() == 0
    out = ngram_jaccard_pairs(_ds([]))
    assert out.count() == 0
    # NB: .to_pandas() of an empty Ray dataset drops columns; the
    # dataset-level schema is the contract
    assert out.schema().names == [
        "doc_id_a", "doc_id_b", "n_common", "n_a", "n_b", "jaccard",
    ]


def test_verify_external_pairs(ray_session):
    # verification accepts an arbitrary candidate edge list (e.g. from
    # minhash) and scores it exactly
    docs = _ds([(1, BASE), (2, NEAR), (3, OTHER)])
    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_id_a": pa.array([1, 1], pa.int64()),
                "doc_id_b": pa.array([2, 3], pa.int64()),
            }
        )
    )
    out = (
        jaccard_verify_pairs(docs, pairs)
        .to_pandas()
        .sort_values("doc_id_b")
        .reset_index(drop=True)
    )
    assert out["jaccard"].tolist() == [
        _brute_jaccard(BASE, NEAR),
        _brute_jaccard(BASE, OTHER),
    ]
    assert out["n_common"].tolist()[1] == 0


def test_verify_pair_with_gramless_side(ray_session):
    # doc 2 has < 5 words -> no gram set; the pair scores J = 0 with
    # doc 1's real set size reported (the SQL `sizes` semantics)
    docs = _ds([(1, BASE), (2, "too short")])
    pairs = rd.from_arrow(
        pa.table(
            {
                "doc_id_a": pa.array([1], pa.int64()),
                "doc_id_b": pa.array([2], pa.int64()),
            }
        )
    )
    out = jaccard_verify_pairs(docs, pairs).to_pandas()
    assert out["n_a"].tolist() == [6]
    assert out["n_b"].tolist() == [0]
    assert out["n_common"].tolist() == [0]
    assert out["jaccard"].tolist() == [0.0]
