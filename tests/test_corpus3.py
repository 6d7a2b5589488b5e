"""Planted tests for corpus batch 3 (pipelines/corpus3.py):
phrase-search positions / counts / doc-boundary guard, containment
asymmetry vs Jaccard, and Neyman allocation arithmetic."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsmetacheck_ray.pipelines import corpus3 as c3


def _docs(d, rows):
    """rows: (doc_id, text, lang)."""
    ids, texts, langs = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(["s"] * len(rows), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


def test_phrase_search_positions_and_counts(ray_session, tmp_path):
    d = str(tmp_path)
    _docs(d, [
        (1, "fast table start", "en"),          # hit at pos 0
        (2, "x  fast   table fast table", "en"),  # two hits, first at 1
        (3, "fast cable", "en"),                # no hit
        (4, "table fast", "en"),                # reversed — no hit
        (5, "", "en"),                          # empty text
        (6, "the fast", "en"),                  # w2 never follows
    ])
    got = {r["doc_id"]: r for r in c3.phrase_search(d).take_all()}
    assert set(got) == {1, 2}
    assert got[1]["n_occ"] == 1 and got[1]["first_pos"] == 0
    assert got[2]["n_occ"] == 2 and got[2]["first_pos"] == 1


def test_phrase_search_no_cross_document_match(ray_session, tmp_path):
    d = str(tmp_path)
    # doc 1 ends with w1, doc 2 begins with w2 — adjacency must not
    # leak across the document boundary inside a shared batch
    _docs(d, [(1, "a fast", "en"), (2, "table b", "en")])
    assert c3.phrase_search(d).take_all() == []


def test_phrase_search_absent_word_whole_batch(ray_session, tmp_path):
    d = str(tmp_path)
    _docs(d, [(1, "nothing here at all", "en")])
    assert c3.phrase_search(d).take_all() == []
