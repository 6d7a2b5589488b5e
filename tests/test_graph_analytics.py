"""Planted tests for the round-4 graph-analytics kernels
(pipelines/queries.py): degree assortativity (star = −1, complete
graph den=0 → 0.0) and the fixed-round k-core peel (triangle+tail,
path-graph round-by-round peeling, insufficient rounds leave a
partially-peeled residue — pinning the exactly-R-rounds contract the
oracle's unrolled CTEs share), plus the vocabulary-overlap query."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsmetacheck_ray.pipelines.queries import (
    assortativity_from_edges,
    kcore_peel,
)
from rsmetacheck_ray.pipelines import corpus2 as c2


def _e(pairs):
    lo = np.asarray([min(a, b) for a, b in pairs], np.int64)
    hi = np.asarray([max(a, b) for a, b in pairs], np.int64)
    return lo, hi


def test_assortativity_star_is_minus_one():
    # star K1,4: hub degree 4, leaves degree 1 → r = −1 exactly
    lo, hi = _e([(0, 1), (0, 2), (0, 3), (0, 4)])
    n, r = assortativity_from_edges(lo, hi)
    assert n == 5
    assert abs(r + 1.0) < 1e-12


def test_assortativity_regular_graph_degenerate():
    # triangle: all degrees equal → den = 0 → defined as 0.0
    lo, hi = _e([(0, 1), (1, 2), (0, 2)])
    n, r = assortativity_from_edges(lo, hi)
    assert n == 3 and r == 0.0


def test_kcore_triangle_with_tail():
    # triangle 0-1-2 plus tail 2-3-4: 2-core = the triangle
    lo, hi = _e([(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)])
    nodes, deg = kcore_peel(lo, hi, k=2, rounds=16)
    assert nodes.tolist() == [0, 1, 2]
    assert deg.tolist() == [2, 2, 2]


def test_kcore_path_needs_rounds():
    # path 0-1-2-3-4-5: each round peels both ends; the 2-core is
    # empty, but it takes ceil(5/2)=3 synchronous rounds to get there —
    # with only 2 rounds a residue remains (the exactly-R contract)
    lo, hi = _e([(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)])
    nodes2, deg2 = kcore_peel(lo, hi, k=2, rounds=2)
    assert nodes2.tolist() == [2, 3]
    assert deg2.tolist() == [1, 1]
    nodes3, _ = kcore_peel(lo, hi, k=2, rounds=3)
    assert nodes3.tolist() == []


def test_kcore_k3_clique():
    # K4 plus a pendant: the 3-core is exactly the K4
    lo, hi = _e(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    )
    nodes, deg = kcore_peel(lo, hi, k=3, rounds=16)
    assert nodes.tolist() == [0, 1, 2, 3]
    assert deg.tolist() == [3, 3, 3, 3]


def test_lang_vocab_overlap_planted(ray_session, tmp_path):
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["a b c", "b c d", "x"], pa.string()),
                "lang": pa.array(["en", "fr", "ja"], pa.string()),
                "source": pa.array(["s"] * 3, pa.string()),
                "n_chars": pa.array([5, 5, 1], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    for parts in (1, 3):
        got = c2.lang_vocab_overlap(d, num_partitions=parts).take_all()
        # en={a,b,c}, fr={b,c,d} → common {b,c}; ja disjoint → omitted
        assert got == [
            {"lang_a": "en", "lang_b": "fr", "n_a": 3, "n_b": 3,
             "n_common": 2, "n_union": 4, "jaccard": 0.5}
        ], got


def test_gate_host_keep_rate_totals(ray_session):
    from rsmetacheck_ray.pipelines.queries import (
        q_gate_decisions,
        q_gate_host_keep_rate,
    )

    sf = "/root/testdata/sf0.001"
    hosts = q_gate_host_keep_rate(sf).to_pylist()
    dec = q_gate_decisions(sf).to_pandas()
    assert sum(r["n_docs"] for r in hosts) == len(dec)
    assert sum(r["n_kept"] for r in hosts) == int(dec["keep"].sum())
    assert all(0.0 <= r["keep_rate"] <= 1.0 for r in hosts)
    assert len(hosts) > 1  # multi-host corpus actually rolls up


def test_gate_rule_cooccurrence_diag_matches_fire_counts(ray_session):
    from rsmetacheck_ray.pipelines.queries import (
        _DROP_NOLM_CODES,
        q_gate_rule_cooccurrence,
    )

    sf = "/root/testdata/sf0.001"
    rows = q_gate_rule_cooccurrence(sf).to_pylist()
    assert len(rows) == 55  # 10 selves + 45 pairs
    by = {(r["rule_a"], r["rule_b"]): r["n_both"] for r in rows}
    # co-occurrence never exceeds either rule's own fire count
    for (a, b), n in by.items():
        assert n <= by[(a, a)] and n <= by[(b, b)]
    # something actually fires in the corpus
    assert any(by[(c, c)] > 0 for c in _DROP_NOLM_CODES)


def test_split_leakage_planted(ray_session, tmp_path):
    import pyarrow.parquet as _pq
    from rsmetacheck_ray.functions.sampling import _md5_ranks
    from rsmetacheck_ray.functions.split import (
        DEFAULT_TRAIN_BUCKETS,
        DEFAULT_VAL_BUCKETS,
    )
    from rsmetacheck_ray.pipelines.queries import q_split_leakage

    d = str(tmp_path)
    # find one id per split deterministically
    ids = np.arange(1, 400, dtype=np.int64)
    buckets = np.array([int(r[:2], 16) for r in _md5_ranks(ids)])
    train_id = int(ids[buckets < DEFAULT_TRAIN_BUCKETS][0])
    val_lo = DEFAULT_TRAIN_BUCKETS
    val_hi = DEFAULT_TRAIN_BUCKETS + DEFAULT_VAL_BUCKETS
    val_id = int(ids[(buckets >= val_lo) & (buckets < val_hi)][0])
    clean_id = int(ids[buckets < DEFAULT_TRAIN_BUCKETS][1])
    shared = "alpha beta gamma delta epsilon zeta"  # a full 5-gram
    _pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([train_id, val_id, clean_id], pa.int64()),
                "text": pa.array(
                    [shared, shared + " extra", "totally different words "
                     "one two three four five"],
                    pa.string(),
                ),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(["s"] * 3, pa.string()),
                "n_chars": pa.array([1, 1, 1], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = q_split_leakage(d).take_all()
    leaked = {r["doc_id"] for r in got}
    assert train_id in leaked and clean_id not in leaked


def test_clustering_bowtie():
    from rsmetacheck_ray.pipelines.queries import clustering_from_edges

    # bowtie: triangles 0-1-2 and 2-3-4 sharing node 2.
    lo, hi = _e([(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)])
    t = {r["doc_id"]: r for r in clustering_from_edges(lo, hi).to_pylist()}
    hub = t[2]
    assert hub["degree"] == 4 and hub["triangles"] == 2
    assert hub["wedges"] == 6 and abs(hub["lcc"] - 2.0 / 6.0) < 1e-15
    for n in (0, 1, 3, 4):
        assert t[n]["degree"] == 2 and t[n]["triangles"] == 1
        assert t[n]["wedges"] == 1 and t[n]["lcc"] == 1.0


def test_clustering_path_no_triangles():
    from rsmetacheck_ray.pipelines.queries import clustering_from_edges

    # path 0-1-2: middle node has a wedge but no triangle -> lcc 0.0
    lo, hi = _e([(0, 1), (1, 2)])
    t = {r["doc_id"]: r for r in clustering_from_edges(lo, hi).to_pylist()}
    assert t[1]["wedges"] == 1 and t[1]["triangles"] == 0
    assert t[1]["lcc"] == 0.0
    assert t[0]["wedges"] == 0 and t[0]["lcc"] == 0.0
