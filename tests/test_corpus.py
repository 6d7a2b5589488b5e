"""Edge-case tests for the corpus-construction batch
(pipelines/corpus.py): token-budget boundary semantics (straddle
bucket refinement, zero-token docs, budget-fits-everything), z-score
moments, snapshot-diff classification, and posting-list ordering with
the max-df stoplist."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsmetacheck_ray.pipelines import corpus as cor


def _write_docs(d, rows):
    """rows: (doc_id, text, lang)."""
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array(["web"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))


def test_budget_cuts_inside_straddle_bucket(ray_session, tmp_path):
    d = str(tmp_path)
    # lang en: doc 1 (9 chars, 2 tokens) is its own bucket; docs 2,3,4
    # share the 5-char bucket, ordered by doc_id, with 3/2/2 tokens.
    _write_docs(d, [
        (1, "aa bb ccc", "en"),
        (2, "d e f", "en"),
        (3, "gg hh", "en"),
        (4, "ii jj", "en"),
    ])
    # budget 4: doc1 (3 tokens, cum 3) kept; doc2 would make cum 6 →
    # the straddle-bucket refinement stops before it.
    out = cor.token_budget_sample(d, budget=4).to_pandas()
    assert sorted(out["doc_id"]) == [1]
    # budget 8: doc1(3)+doc2(3)+doc3(2)=8 kept; doc4 would make 10
    out = cor.token_budget_sample(d, budget=8).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3]


def test_budget_degenerate_equal_lengths_distributed(
    ray_session, tmp_path, monkeypatch
):
    """A corpus where EVERY document has the same length puts a whole
    language stratum into one straddle bucket. With the driver pull
    capped to zero, the distributed doc_id-range refinement must
    resolve the budget boundary identically to the driver path."""
    d = str(tmp_path)
    # 40 same-length en docs of 2 tokens each, non-contiguous doc_ids
    rows = [(i * 7 + 3, "aa bb", "en") for i in range(40)]
    rows += [(1000 + i, "cc dd", "fr") for i in range(5)]
    _write_docs(d, rows)
    want = cor.token_budget_sample(d, budget=13).to_pandas()
    # budget 13, 2 tokens/doc → 6 docs kept per lang (cum 12; the 7th
    # would reach 14), fr keeps all 5
    assert len(want) == 6 + 5
    monkeypatch.setattr(cor, "_STRADDLE_PULL_MAX", 0)
    monkeypatch.setattr(cor, "_STRADDLE_B", 4)  # force several rounds
    got = cor.token_budget_sample(d, budget=13).to_pandas()
    a = want.sort_values("doc_id").reset_index(drop=True)
    b = got.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert sorted(b[b.lang == "en"]["doc_id"]) == [
        i * 7 + 3 for i in range(6)
    ]


def test_budget_fits_everything(ray_session, tmp_path):
    d = str(tmp_path)
    _write_docs(d, [(1, "a b", "en"), (2, "c", "fr")])
    out = cor.token_budget_sample(d, budget=10_000).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]


def test_budget_langs_independent(ray_session, tmp_path):
    d = str(tmp_path)
    # each lang gets its own budget: en has 3 one-token docs, fr has 3;
    # budget 2 keeps the two longest per lang.
    _write_docs(d, [
        (1, "aaaa", "en"), (2, "bbb", "en"), (3, "cc", "en"),
        (4, "dddd", "fr"), (5, "eee", "fr"), (6, "ff", "fr"),
    ])
    out = cor.token_budget_sample(d, budget=2).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 4, 5]


def test_zscore_exact_two_points(ray_session, tmp_path):
    d = str(tmp_path)
    # two docs, lengths 2 and 4: mean 3, sample std sqrt(2) → z ∓1/√2
    _write_docs(d, [(1, "ab", "en"), (2, "cdef", "en")])
    out = cor.quality_zscores(d).to_pandas().set_index("doc_id")
    assert out.loc[1, "z"] == pytest.approx(-1 / np.sqrt(2))
    assert out.loc[2, "z"] == pytest.approx(1 / np.sqrt(2))


def test_diff_classifies_all_three(ray_session, tmp_path):
    d = str(tmp_path)
    # doc 17 → removed; doc 16 (16%13=3) → changed; doc 24 (24%19=5) →
    # spawns added 10000024; doc 1 → unchanged (absent from output)
    _write_docs(d, [
        (17, "gone", "en"), (16, "revise me", "en"),
        (24, "spawns", "en"), (1, "same", "en"),
    ])
    out = cor.dataset_diff(d).to_pandas().set_index("doc_id")
    assert out.loc[17, "change"] == "removed"
    assert out.loc[16, "change"] == "changed"
    assert out.loc[10_000_024, "change"] == "added"
    assert 1 not in out.index and 24 not in out.index
    assert len(out) == 3


def test_diff_removed_wins_over_changed(ray_session, tmp_path):
    d = str(tmp_path)
    # doc 221 = 13*17: divisible by 17 → removed even though %13 rule
    # would also revise it
    _write_docs(d, [(221, "both rules", "en")])
    out = cor.dataset_diff(d).to_pandas()
    assert list(out["change"]) == ["removed"]


def test_postings_sorted_and_deduped(ray_session, tmp_path):
    d = str(tmp_path)
    # "x" appears twice in doc 2 → one posting; doc order ascending
    _write_docs(d, [(3, "x y", "en"), (2, "x x", "en"), (1, "y", "en")])
    out = cor.term_postings(d).to_pandas().set_index("term")
    assert out.loc["x", "postings"] == "2,3" and out.loc["x", "df"] == 2
    assert out.loc["y", "postings"] == "1,3" and out.loc["y", "df"] == 2


def test_postings_max_df_stoplist(ray_session, tmp_path):
    d = str(tmp_path)
    # "the" in all 3 docs, "rare" in one: max_df=2 drops "the"
    _write_docs(d, [
        (1, "the rare", "en"), (2, "the", "en"), (3, "the", "en"),
    ])
    out = cor.term_postings(d, max_df=2).to_pandas().set_index("term")
    assert "the" not in out.index
    assert out.loc["rare", "postings"] == "1"


def test_apply_changes_merge_semantics(ray_session, tmp_path):
    d = str(tmp_path)
    # 16 → updated (16%13=3), 17 → deleted, 24 → spawns insert, 1 → kept
    _write_docs(d, [
        (16, "revise me", "en"), (17, "gone", "en"),
        (24, "spawns", "en"), (1, "same", "en"),
    ])
    out = cor.apply_changes(d).to_pandas().set_index("doc_id")
    assert out.loc[16, "text"] == "revise me [rev2]"
    assert 17 not in out.index
    assert out.loc[10_000_024, "text"] == "new spawns"
    assert out.loc[24, "text"] == "spawns"  # insert source row survives
    assert out.loc[1, "text"] == "same"
    assert len(out) == 4


def test_apply_changes_roundtrips_with_diff(ray_session, tmp_path):
    d = str(tmp_path)
    rows = [(i, f"doc {i} body", "en") for i in range(1, 60)]
    _write_docs(d, rows)
    snap_b = cor.apply_changes(d).to_pandas().set_index("doc_id")["text"]
    diff = cor.dataset_diff(d).to_pandas().set_index("doc_id")["change"]
    base = {r[0]: r[1] for r in rows}
    # every diff row is consistent with the applied snapshot
    for doc_id, change in diff.items():
        if change == "removed":
            assert doc_id in base and doc_id not in snap_b.index
        elif change == "added":
            assert doc_id not in base and doc_id in snap_b.index
        else:
            assert snap_b[doc_id] != base[doc_id]
    # and every unchanged base row survives byte-identical
    for doc_id, text in base.items():
        if doc_id not in diff.index:
            assert snap_b[doc_id] == text


def test_dq_checks_counts(ray_session, tmp_path):
    d = str(tmp_path)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 2, 3, 4], pa.int64()),
            "text": pa.array(["ok", None, "   ", "x", "y"], pa.string()),
            "lang": pa.array(["en", "fr", "xx", "de", "zh"], pa.string()),
            "source": pa.array(["web"] * 5, pa.string()),
            # row 4 lies about its length
            "n_chars": pa.array([2, 0, 3, 1, 99], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    out = cor.dq_checks(d).to_pandas().set_index("check")["n_violations"]
    assert out["null_text"] == 1
    assert out["n_chars_mismatch"] == 1   # only row 4 (null text -> len 0 == 0)
    assert out["bad_lang"] == 1           # xx
    assert out["empty_text"] == 2         # None and whitespace-only
    assert out["dup_doc_id"] == 2         # both rows with id 2


def test_bm25_matches_bruteforce(ray_session, tmp_path):
    d = str(tmp_path)
    import math

    rows = [
        (1, "hash hash join x y", "en"),
        (2, "join filter filter filter", "en"),
        (3, "nothing relevant here at all", "en"),
        (4, "hash join filter", "en"),
        (5, "hash", "en"),
    ]
    _write_docs(d, rows)
    out = cor.bm25_search(d, query="hash join filter", k=3).to_pandas()
    # brute force, same formula
    terms = sorted({"hash", "join", "filter"})
    docs = {r[0]: r[1].split() for r in rows}
    n = len(docs)
    dls = {k_: len(v) for k_, v in docs.items()}
    avgdl = sum(dls.values()) / float(n)
    want = {}
    for did, toks in docs.items():
        s = 0.0
        for t in terms:
            df = sum(1 for v in docs.values() if t in v)
            idf = math.log(1.0 + (float(n - df) + 0.5) / (df + 0.5))
            tf = float(toks.count(t))
            s += idf * (tf * (cor.BM25_K1 + 1.0)) / (
                tf + cor.BM25_K1 * ((1.0 - cor.BM25_B)
                                    + cor.BM25_B * (dls[did] / avgdl))
            )
        want[did] = s
    top3 = sorted(want, key=lambda k_: (-want[k_], k_))[:3]
    assert list(out["doc_id"]) == top3
    for did, sc in zip(out["doc_id"], out["score"]):
        assert sc == pytest.approx(want[did], rel=1e-12)


def test_bm25_absent_terms_score_zero(ray_session, tmp_path):
    d = str(tmp_path)
    _write_docs(d, [(1, "a b c", "en"), (2, "d e", "en")])
    out = cor.bm25_search(d, query="zzz qqq", k=5).to_pandas()
    # no doc contains the terms: every score is exactly 0, ranked by id
    assert list(out["doc_id"]) == [1, 2]
    assert all(s == 0.0 for s in out["score"])


def test_diff_and_merge_reject_offset_collisions(ray_session, tmp_path):
    """A base doc_id at/above the derived-insert offset would collide
    with derived ids — both operators must refuse, not corrupt."""
    d = str(tmp_path)
    _write_docs(d, [(1, "ok", "en"), (10_000_024, "collider", "en")])
    with pytest.raises(Exception, match="derived-insert offset"):
        cor.dataset_diff(d).to_pandas()
    with pytest.raises(Exception, match="derived-insert offset"):
        cor.apply_changes(d).to_pandas()


def test_embedding_norms_ragged_across_rows(ray_session, tmp_path):
    """Differing dims are fine when rows land in different blocks
    (per-batch uniform); a WITHIN-batch mix trips the guard — pin the
    guard directly on the batch function."""
    d = str(tmp_path)
    t = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [1.0, 0.0, 0.0]],
                                  pa.list_(pa.float32())),
            "label": pa.array([0, 0], pa.int32()),
        }
    )
    pq.write_table(t, os.path.join(d, "embeddings.parquet"))
    out = cor.embedding_norms(d).to_pandas().set_index("vec_id")
    assert sorted(out["dim"]) == [2, 3]  # per-block dims both computed
    assert out.loc[0, "norm"] == 1.0 and out.loc[1, "norm"] == 1.0


def test_embedding_norms_values(ray_session, tmp_path):
    d = str(tmp_path)
    t = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[3.0, 4.0], [0.0, 0.0]],
                                  pa.list_(pa.float32())),
            "label": pa.array([0, 0], pa.int32()),
        }
    )
    pq.write_table(t, os.path.join(d, "embeddings.parquet"))
    out = cor.embedding_norms(d).to_pandas().set_index("vec_id")
    assert out.loc[0, "norm"] == 5.0 and out.loc[0, "dim"] == 2
    assert out.loc[1, "norm"] == 0.0
