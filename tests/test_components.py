"""Connected components over dedup edges: transitive chains must unify
(the pair generators alone cannot), both the vectorized local solve and
the distributed hash-to-min path, at any partition count."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from rsmetacheck_ray.functions.components import (
    connected_components,
    dedup_survivors,
)


def _pairs(edges: list[tuple[int, int]]) -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "doc_id_a": pa.array([a for a, _ in edges], pa.int64()),
                "doc_id_b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )


def _solve(edges, **kw) -> dict[int, int]:
    out = connected_components(_pairs(edges), **kw).to_pandas()
    return dict(zip(out["doc_id"], out["component_id"]))


def test_transitive_chain_local(ray_session):
    # A≈B, B≈C, no A≈C edge — all three must share one canonical id
    got = _solve([(20, 10), (20, 30), (50, 60)])
    assert got == {10: 10, 20: 10, 30: 10, 50: 50, 60: 50}


def test_long_path_and_duplicates_local(ray_session):
    # 60-node path + duplicate and reversed edges
    path = [(i, i + 1) for i in range(100, 160)]
    extra = [(150, 149), (100, 101)]
    got = _solve(path + extra)
    assert set(got.values()) == {100}
    assert len(got) == 61


def test_distributed_path_matches_local(ray_session):
    edges = [(2, 1), (3, 2), (10, 11), (11, 12), (12, 13), (99, 98)]
    local = _solve(edges)
    dist = _solve(edges, local_max_edges=0, num_partitions=3)
    assert local == dist
    assert dist[13] == 10 and dist[3] == 1


def test_distributed_long_chain_converges_logarithmically(ray_session):
    """Chain-shaped components (successively edited page versions) must
    not cost O(depth) rounds: with mapping shortcutting a 40-deep path
    resolves in ~2 outer rounds x log(depth) jumps."""
    path = [(i, i + 1) for i in range(500, 540)]
    got = _solve(path, local_max_edges=0, num_partitions=4)
    assert set(got.values()) == {500}
    assert len(got) == 41


def test_empty_and_selfloop(ray_session):
    ds = connected_components(_pairs([]))
    # NB: Dataset.to_pandas drops the schema of an all-empty dataset
    # (Ray quirk) — assert on the dataset schema instead
    assert ds.schema().names == ["doc_id", "component_id"]
    assert ds.count() == 0
    got = _solve([(7, 7)])
    assert got == {7: 7}
    got = _solve([(7, 7)], local_max_edges=0)
    assert got == {7: 7}


def test_dedup_survivors_decision(ray_session):
    """Every corpus doc gets a (canonical_id, keep) row: cluster
    minimum survives, other members drop, edge-untouched docs keep."""
    ids = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3, 9, 42], pa.int64())})
    )
    out = (
        dedup_survivors(ids, _pairs([(1, 2), (2, 3)]))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3, 9, 42]
    assert out["canonical_id"].tolist() == [1, 1, 1, 9, 42]
    assert out["keep"].tolist() == [True, False, False, True, True]


def test_star_output_of_exact_dedup_resolves(ray_session):
    """Star pairs from two different keyings compose into one cluster
    through the shared member (the q_dedup_components shape)."""
    # prefix stars: (1,2),(1,3); suffix stars: (3,9) -> all one comp
    got = _solve([(1, 2), (1, 3), (3, 9)])
    assert set(got.values()) == {1} and len(got) == 4
