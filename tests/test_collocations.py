"""Collocation counts (q_collocations): adjacency stops at document
boundaries, min_count filters after the GLOBAL sum (pairs split
across blocks still qualify), marginals count every occurrence of the
word (not just in surviving pairs), and whitespace-boundary empties
never pair."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsmetacheck_ray.pipelines.queries import q_collocations


def _lake(d, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


def test_collocations_boundaries_and_marginals(ray_session, tmp_path):
    d = str(tmp_path)
    # "a b" appears 3x in doc0, 2x in doc1 (split across rows ->
    # global sum 5 >= min_count). Doc boundary: doc0 ends with "b",
    # doc1 starts with "a" — that is NOT a pair. "b c" appears 4x
    # only -> filtered. Extra solo "a" bumps the marginal.
    _lake(d, [
        "a b x a b x a b",          # 3x (a,b)
        "a b c x a b c  x b c x b c a",  # 2x (a,b), 4x (b,c)
    ])
    t = q_collocations(d, min_count=5)
    rows = t.to_pylist()
    words0 = "a b x a b x a b".split()
    words1 = "a b c x a b c  x b c x b c a".split()
    n_a = words0.count("a") + words1.count("a")
    n_b = words0.count("b") + words1.count("b")
    assert rows == [
        {"w1": "a", "w2": "b", "n_xy": 5, "n_x": n_a, "n_y": n_b}
    ], rows


def test_collocations_empty_and_below_threshold(ray_session, tmp_path):
    d = str(tmp_path)
    _lake(d, ["a b", "c d"])
    t = q_collocations(d, min_count=5)
    assert t.num_rows == 0
    assert t.column_names == ["w1", "w2", "n_xy", "n_x", "n_y"]
