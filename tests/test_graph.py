"""Tests for the BSP PageRank (functions/graph.py): bitwise parity
with the dense single-machine reference on random graphs, structural
sanity (star centrality, dangling mass conservation), determinism,
the setup size gate, and the registry query."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsmetacheck_ray.functions import graph as gr


def _edges(pairs):
    return pa.table(
        {
            "src": pa.array([a for a, _ in pairs], pa.int64()),
            "dst": pa.array([b for _, b in pairs], pa.int64()),
        }
    )


def _rand_edges(n_nodes, n_edges, seed):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n_nodes, n_edges) * 13 + 7  # sparse ids
    dst = rng.randint(0, n_nodes, n_edges) * 13 + 7
    return _edges(list(zip(src.tolist(), dst.tolist())))


def test_matches_dense_reference(ray_session):
    e = _rand_edges(200, 1000, seed=5)
    got = gr.pagerank(e, n_iter=15, num_partitions=4)
    want = gr.pagerank_dense(e, n_iter=15)
    gm = dict(zip(got.column("node").to_pylist(), got.column("rank").to_pylist()))
    assert set(gm) == set(want)
    for k, v in want.items():
        assert gm[k] == pytest.approx(v, rel=1e-12, abs=1e-15)


def test_ranks_sum_to_one(ray_session):
    # with uniform dangling redistribution total mass is conserved
    e = _rand_edges(100, 300, seed=9)
    got = gr.pagerank(e, n_iter=25, num_partitions=3)
    assert float(np.sum(got.column("rank").to_numpy())) == pytest.approx(1.0)


def test_star_center_dominates(ray_session):
    # all leaves point at node 0: the hub must outrank every leaf
    e = _edges([(i, 0) for i in range(1, 20)])
    got = gr.pagerank(e, n_iter=20, num_partitions=2)
    m = dict(zip(got.column("node").to_pylist(), got.column("rank").to_pylist()))
    assert all(m[0] > m[i] for i in range(1, 20))


def test_deterministic_across_runs(ray_session):
    e = _rand_edges(150, 600, seed=3)
    a = gr.pagerank(e, n_iter=10, num_partitions=4)
    b = gr.pagerank(e, n_iter=10, num_partitions=4)
    assert a.column("rank").to_pylist() == b.column("rank").to_pylist()


def test_partition_count_invariance(ray_session):
    # the BSP result must not depend on the partitioning (accumulation
    # order is pinned by sorted shards + fixed piece order)
    e = _rand_edges(120, 500, seed=11)
    a = gr.pagerank(e, n_iter=12, num_partitions=1)
    b = gr.pagerank(e, n_iter=12, num_partitions=6)
    am = dict(zip(a.column("node").to_pylist(), a.column("rank").to_pylist()))
    bm = dict(zip(b.column("node").to_pylist(), b.column("rank").to_pylist()))
    for k in am:
        assert am[k] == pytest.approx(bm[k], rel=1e-12, abs=1e-15)


def test_empty_and_gate(ray_session, monkeypatch):
    got = gr.pagerank(_edges([]))
    assert got.num_rows == 0
    monkeypatch.setattr(gr, "_EDGE_SETUP_MAX", 2)
    with pytest.raises(ValueError, match="setup gate"):
        gr.pagerank(_edges([(1, 2), (2, 3), (3, 1)]))


def test_fixed_matches_dense_reference(ray_session):
    e = _rand_edges(200, 1000, seed=5)
    got = gr.pagerank_fixed(e, n_iter=15, num_partitions=4)
    want = gr.pagerank_fixed_dense(e, n_iter=15)
    gm = dict(
        zip(got.column("node").to_pylist(), got.column("rank_fp").to_pylist())
    )
    assert gm == want  # EXACT integer equality, not approx


def test_fixed_partition_count_invariance(ray_session):
    # the fixed-point variant's whole reason to exist: identical
    # INTEGERS at any shard topology (order-free sums)
    e = _rand_edges(120, 500, seed=11)
    a = gr.pagerank_fixed(e, n_iter=12, num_partitions=1)
    b = gr.pagerank_fixed(e, n_iter=12, num_partitions=6)
    am = dict(zip(a.column("node").to_pylist(), a.column("rank_fp").to_pylist()))
    bm = dict(zip(b.column("node").to_pylist(), b.column("rank_fp").to_pylist()))
    assert am == bm


def test_fixed_tracks_float(ray_session):
    # fixed-point sheds < 1 ulp (1e-15) per floor division: the two
    # arithmetics must agree to ~1e-9 relative on a connected graph
    e = _rand_edges(100, 400, seed=7)
    f = gr.pagerank(e, n_iter=20, num_partitions=3)
    q = gr.pagerank_fixed(e, n_iter=20, num_partitions=3)
    fm = dict(zip(f.column("node").to_pylist(), f.column("rank").to_pylist()))
    qm = dict(zip(q.column("node").to_pylist(), q.column("rank_fp").to_pylist()))
    assert set(fm) == set(qm)
    for k, v in fm.items():
        assert qm[k] / gr.PR_SCALE == pytest.approx(v, rel=1e-6, abs=1e-9)


def test_fixed_empty(ray_session):
    got = gr.pagerank_fixed(_edges([]))
    assert got.num_rows == 0
    assert set(got.column_names) == {"node", "rank_fp"}


def test_registry_query_runs(ray_session):
    from rsmetacheck_ray.functions.graph import PR_SCALE
    from rsmetacheck_ray.pipelines.queries import q_rank_dedup_graph

    out = q_rank_dedup_graph("/root/testdata/sf0.001")
    assert out.num_rows > 0
    assert set(out.column_names) == {"node", "rank_fp"}
    # every rank positive, mass ≈ 1 (fixed-point units of 1/PR_SCALE)
    r = out.column("rank_fp").to_numpy()
    assert (r > 0).all()
    assert float(r.sum()) / PR_SCALE == pytest.approx(1.0, rel=1e-6)


# --- BFS hop distances -------------------------------------------------

def _sym(pairs):
    return _edges(pairs + [(b, a) for a, b in pairs])


def test_bfs_chain_distances(ray_session):
    # path 1-2-3-4-5 seeded at 1: dist = hops along the chain
    e = _sym([(1, 2), (2, 3), (3, 4), (4, 5)])
    got = gr.bfs_distances(e, np.array([1]), num_partitions=2)
    m = dict(zip(got.column("node").to_pylist(), got.column("dist").to_pylist()))
    assert m == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_multi_source_components(ray_session):
    # two components, one seed each; star beats chain where shorter
    e = _sym([(1, 2), (2, 3), (1, 3), (10, 11), (10, 12), (12, 13)])
    got = gr.bfs_distances(e, np.array([1, 10]), num_partitions=3)
    m = dict(zip(got.column("node").to_pylist(), got.column("dist").to_pylist()))
    assert m == {1: 0, 2: 1, 3: 1, 10: 0, 11: 1, 12: 1, 13: 2}


def test_bfs_partition_invariance_and_dense_parity(ray_session):
    e = _rand_edges(60, 240, seed=11)
    sym = pa.table(
        {
            "src": pa.concat_arrays([e.column("src").combine_chunks(), e.column("dst").combine_chunks()]),
            "dst": pa.concat_arrays([e.column("dst").combine_chunks(), e.column("src").combine_chunks()]),
        }
    )
    seeds = np.array([7, 20])  # 7 always exists (id formula); 20 may not
    outs = []
    for p in (1, 4):
        got = gr.bfs_distances(sym, seeds, num_partitions=p)
        outs.append(
            sorted(zip(got.column("node").to_pylist(), got.column("dist").to_pylist()))
        )
    assert outs[0] == outs[1]  # bitwise partition invariance
    assert dict(outs[0]) == gr.bfs_dense(sym, seeds)


def test_bfs_unreached_omitted(ray_session):
    # 99 is isolated from the seed: no row
    e = _sym([(1, 2), (98, 99)])
    got = gr.bfs_distances(e, np.array([1]), num_partitions=2)
    m = dict(zip(got.column("node").to_pylist(), got.column("dist").to_pylist()))
    assert m == {1: 0, 2: 1}


def test_bfs_registry_query(ray_session):
    from rsmetacheck_ray.pipelines.queries import q_dedup_graph_bfs

    out = q_dedup_graph_bfs("/root/testdata/sf0.001")
    assert set(out.column_names) == {"doc_id", "component_id", "dist"}
    ids = out.column("doc_id").to_pylist()
    comps = out.column("component_id").to_pylist()
    dists = out.column("dist").to_pylist()
    assert len(ids) > 0
    by_id = dict(zip(ids, dists))
    for i, c, d in zip(ids, comps, dists):
        assert c <= i  # canonical is the component min
        assert (d == 0) == (i == c)  # exactly the roots at distance 0
    # every component root is present with dist 0
    for c in set(comps):
        assert by_id[c] == 0


# --- triangle counting ---------------------------------------------------

def _und(pairs):
    return pa.table(
        {
            "a": pa.array([min(x, y) for x, y in pairs], pa.int64()),
            "b": pa.array([max(x, y) for x, y in pairs], pa.int64()),
        }
    )


def test_triangles_clique_and_chain(ray_session):
    # K4 on {1,2,3,4}: each node in C(3,2)=3 triangles; chain 10-11-12
    # contributes none
    k4 = [(i, j) for i in (1, 2, 3, 4) for j in (1, 2, 3, 4) if i < j]
    e = _und(k4 + [(10, 11), (11, 12)])
    got = gr.triangle_counts(e, num_partitions=2)
    m = dict(zip(got.column("node").to_pylist(), got.column("triangles").to_pylist()))
    assert m == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_star_hub_zero(ray_session):
    # star: hub 1 with 50 leaves — zero triangles, and the orientation
    # gives the hub out-degree <= 1 (no wedge blowup)
    e = _und([(1, k) for k in range(2, 52)])
    got = gr.triangle_counts(e, num_partitions=3)
    assert got.num_rows == 0


def test_triangles_dense_parity_and_invariance(ray_session):
    rng = np.random.RandomState(13)
    a = rng.randint(0, 40, 300) * 7 + 3
    b = rng.randint(0, 40, 300) * 7 + 3
    keep = a != b
    e = _und(list(zip(a[keep].tolist(), b[keep].tolist())))
    outs = []
    for p in (1, 4):
        got = gr.triangle_counts(e, num_partitions=p)
        outs.append(
            sorted(zip(got.column("node").to_pylist(), got.column("triangles").to_pylist()))
        )
    assert outs[0] == outs[1]
    assert dict(outs[0]) == gr.triangles_dense(e)


def test_triangles_registry_query(ray_session):
    from rsmetacheck_ray.pipelines.queries import q_dedup_graph_triangles

    out = q_dedup_graph_triangles("/root/testdata/sf0.001")
    assert set(out.column_names) == {"doc_id", "triangles"}
    assert all(t > 0 for t in out.column("triangles").to_pylist())


def test_double_sweep_diameter_on_planted_chain(ray_session, tmp_path):
    """A 5-node path graph: sweep 1 from the min node (an endpoint)
    reaches the other endpoint at distance 4; sweep 2 back measures
    the exact diameter 4. A 4-clique stays at 1."""
    import os
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rsmetacheck_ray.pipelines import queries as q

    d = str(tmp_path)
    # chain via shared 64-char prefixes: doc i and i+1 share prefix_i
    # is hard to plant through the text corpus; instead drive the
    # internal machinery directly on a synthetic edge list.
    from rsmetacheck_ray.functions.graph import bfs_distances

    def dist_map(edges_ab, seeds):
        e = pa.table({
            "src": pa.array([x for ab in edges_ab for x in ab], pa.int64()),
            "dst": pa.array([x for ab in edges_ab for x in ab[::-1]], pa.int64()),
        })
        t = bfs_distances(e, np.array(seeds, np.int64), max_iter=32)
        return dict(zip(t.column("node").to_pylist(),
                        t.column("dist").to_pylist()))

    # path 1-2-3-4-5
    chain = [(1, 2), (2, 3), (3, 4), (4, 5)]
    d1 = dist_map(chain, [1])
    far = max(sorted(d1), key=lambda n: (d1[n], -n))
    assert far == 5 and d1[far] == 4
    d2 = dist_map(chain, [far])
    assert max(d2.values()) == 4  # exact diameter on a tree
    # 4-clique: diameter 1
    clique = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    dc = dist_map(clique, [10])
    assert max(dc.values()) == 1
