"""Benchmark-decontamination operator (functions/decontaminate.py)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from rsmetacheck_ray.functions.decontaminate import (
    batch_gram_hashes,
    benchmark_gram_hashes,
    contaminated_docs,
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


BENCH = [(0, "the quick brown fox jumps over the lazy dog tonight")]


def test_planted_contamination_flagged(ray_session):
    corpus = _ds(
        [
            # embeds the 5-gram "quick brown fox jumps over" mid-document
            (1, "intro words then quick brown fox jumps over and more text"),
            # no shared 5-gram (words shared, sequence broken)
            (2, "quick fox brown jumps the over dog lazy tonight words"),
            # exact copy of the benchmark doc: shares every 5-gram (6 of them)
            (3, "the quick brown fox jumps over the lazy dog tonight"),
        ]
    )
    out = (
        contaminated_docs(corpus, _ds(BENCH))
        .to_pandas()
        .set_index("doc_id")["n_shared_grams"]
        .to_dict()
    )
    assert 2 not in out
    assert out[1] >= 1
    assert out[3] == 6  # 10 words -> 6 distinct 5-grams, all shared


def test_short_docs_emit_no_grams(ray_session):
    di, gh = batch_gram_hashes(pa.array(["one two three four", "", None]))
    assert len(di) == 0 and len(gh) == 0  # all docs < 5 words
    # a doc of exactly 5 words emits exactly one gram
    di, gh = batch_gram_hashes(pa.array(["a b c d e"]))
    assert list(di) == [0] and len(gh) == 1


def test_gram_count_is_distinct(ray_session):
    # the shared gram appears twice in the corpus doc -> counted once
    corpus = _ds([(1, "quick brown fox jumps over pad quick brown fox jumps over")])
    bench = _ds([(0, "quick brown fox jumps over")])
    out = contaminated_docs(corpus, bench).to_pandas()
    assert out["n_shared_grams"].tolist() == [1]


def test_empty_benchmark_and_empty_corpus(ray_session):
    empty = _ds([])
    assert len(contaminated_docs(_ds(BENCH), empty).to_pandas()) == 0
    assert len(contaminated_docs(empty, _ds(BENCH)).to_pandas()) == 0
    assert len(benchmark_gram_hashes(empty)) == 0


def test_benchmark_grams_sorted_distinct(ray_session):
    g = benchmark_gram_hashes(_ds(BENCH + [(7, BENCH[0][1])]))
    assert len(g) == 6  # duplicate benchmark doc adds nothing
    assert np.all(np.diff(g.astype(np.uint64)) > 0)


def test_attribution_per_bench_item(ray_session):
    from rsmetacheck_ray.functions.decontaminate import (
        contamination_attribution,
    )

    # bench item 100: gram A ("one two three four five") + tail;
    # bench item 200: two distinct leaking grams; item 300: clean
    bench = _ds([
        (100, "one two three four five unique tail words here now"),
        (200, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (300, "totally clean benchmark item nothing matches this text"),
    ])
    corpus = _ds([
        # hits item 100's leading gram
        (1, "prefix one two three four five suffix"),
        # also hits item 100's leading gram (second distinct doc)
        (2, "again one two three four five more"),
        # hits TWO distinct grams of item 200
        (3, "alpha beta gamma delta epsilon zeta padding padding2"),
        # no 5-gram overlap with anything
        (4, "completely different wording with no shared windows at all"),
    ])
    got = {r["bench_id"]: r
           for r in contamination_attribution(corpus, bench).take_all()}
    assert set(got) == {100, 200}  # item 300 emits no row
    assert got[100]["n_docs"] == 2 and got[100]["n_shared_grams"] == 1
    # doc 3 covers "alpha..epsilon" and "beta..zeta" (2 grams of 200),
    # plus "alpha beta gamma delta epsilon zeta" has 2 windows
    assert got[200]["n_docs"] == 1
    assert got[200]["n_shared_grams"] == 2
