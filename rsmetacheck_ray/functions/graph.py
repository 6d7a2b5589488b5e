"""Distributed PageRank — the bulk-synchronous (BSP) iterative
pattern over hash-co-partitioned graph state.

This is the one operator family where the Dataset API is genuinely the
wrong tool (the brief's "drop to raw Ray tasks" case): every iteration
rewrites a rank VECTOR that must stay co-partitioned with an IMMUTABLE
edge set. A ``groupby`` formulation would re-shuffle every edge every
iteration; here the edge partitions enter the object store ONCE
(``ray.put``), and each iteration runs P scatter tasks + P gather
tasks whose only exchange is (dst, contribution) arrays — 16 B per
edge per iteration, the minimal BSP shuffle.

Partitioning contract: edges are partitioned by ``hash(src)``, node
shards by the same hash — so a scatter task's rank lookups are local
by construction; contributions are binned to the destination's shard
inside the task (P arrays out per task, the P×P exchange).

Semantics (standard damped PageRank with uniform dangling
redistribution)::

    rank' = (1-d)/N + d * (Σ_in contrib + dangling_mass / N)

Driver-side setup partitions the edge table in one vectorized pass —
edge lists here are dedup-pair outputs (O(duplicates), orders of
magnitude smaller than the corpus); the documented gate mirrors
``components.connected_components``'s local-path gate. The per-round
compute and exchange are fully distributed.

Determinism: every per-node accumulation is ``np.add.at`` over arrays
whose order is fixed by (sorted nodes, fixed partition loop order), so
repeated runs are bitwise identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .hashing import splitmix64_np
from ..partitioning import adaptive_partitions

# setup materializes the edge table once on the driver (16 B/edge);
# past this, partition the edges with a Dataset pass first
_EDGE_SETUP_MAX = 50_000_000


@ray.remote
def _scatter(
    src: np.ndarray,
    dst: np.ndarray,
    dst_part: np.ndarray,
    nodes: np.ndarray,
    inv_deg: np.ndarray,
    rank: np.ndarray,
    n_parts: int,
):
    """One edge partition's contributions, binned by dst shard."""
    pos = np.searchsorted(nodes, src)  # all srcs are local by contract
    contrib = rank[pos] * inv_deg[pos]
    order = np.argsort(dst_part, kind="stable")
    dp, dd, cc = dst_part[order], dst[order], contrib[order]
    bounds = np.searchsorted(dp, np.arange(n_parts + 1))
    return [
        (dd[bounds[q]: bounds[q + 1]], cc[bounds[q]: bounds[q + 1]])
        for q in range(n_parts)
    ]


@ray.remote
def _gather(
    nodes: np.ndarray,
    piece_refs: list,
    damping: float,
    teleport: float,
    dangle_share: float,
):
    """New rank vector for one node shard from all inbound pieces.
    ``piece_refs`` arrive as a LIST of ObjectRefs (nested refs are not
    auto-dereferenced), so each piece is fetched worker-to-worker here
    — the driver never touches the edge exchange."""
    acc = np.zeros(len(nodes), np.float64)
    for ref in piece_refs:
        val = ray.get(ref)
        if isinstance(val, list):  # n_parts == 1: un-split scatter output
            val = val[0]
        d_ids, c = val
        if len(d_ids):
            np.add.at(acc, np.searchsorted(nodes, d_ids), c)
    return teleport + damping * (acc + dangle_share)


@ray.remote
def _dangling_mass(rank: np.ndarray, deg: np.ndarray) -> float:
    return float(rank[deg == 0].sum())


def _shard_graph(edges: pa.Table, num_partitions: int | None):
    """Shared BSP setup: hash-co-partitioned node shards + edge
    partitions in the object store. Returns ``None`` for the empty
    graph, else ``(n, n_parts, shard_nodes, shard_deg, edge_refs,
    node_refs, deg_refs)``."""
    if edges.num_rows > _EDGE_SETUP_MAX:
        raise ValueError(
            f"{edges.num_rows} edges exceed the driver setup gate "
            f"{_EDGE_SETUP_MAX}; pre-partition with a Dataset pass"
        )
    src = edges.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = edges.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    nodes_all = np.unique(np.concatenate([src, dst]))
    n = len(nodes_all)
    if n == 0:
        return None
    # min_partitions=1: the default 64-way parallelism floor is right
    # for one-shot Dataset shuffles but poison for a BSP loop — every
    # iteration pays P dangling + P scatter (×P returns) + P gather
    # tasks, so a small graph at P=64 drowns in ~4k objects/round
    # (measured: 17 s for a 3.7k-edge graph; <1 s at the sized P)
    n_parts = num_partitions or adaptive_partitions(
        len(src), row_bytes=16, min_partitions=1
    )

    part_of = lambda a: (splitmix64_np(a.astype(np.uint64)) % n_parts).astype(
        np.int64
    )
    node_part = part_of(nodes_all)
    # node shards (sorted within shard: np.unique output is sorted and
    # the stable partition selection preserves that)
    shard_nodes = [nodes_all[node_part == q] for q in range(n_parts)]
    deg_all = np.zeros(n, np.int64)
    np.add.at(deg_all, np.searchsorted(nodes_all, src), 1)
    shard_deg = [deg_all[node_part == q] for q in range(n_parts)]

    # edge partitions by hash(src): srcs are local to shard p
    src_part = part_of(src)
    dst_part_all = part_of(dst)
    edge_refs = []
    for p in range(n_parts):
        sel = src_part == p
        edge_refs.append(
            (
                ray.put(src[sel]),
                ray.put(dst[sel]),
                ray.put(dst_part_all[sel]),
            )
        )
    node_refs = [ray.put(sn) for sn in shard_nodes]
    deg_refs = [ray.put(d) for d in shard_deg]
    return n, n_parts, shard_nodes, shard_deg, edge_refs, node_refs, deg_refs


def pagerank(
    edges: pa.Table,
    damping: float = 0.85,
    n_iter: int = 20,
    num_partitions: int | None = None,
) -> pa.Table:
    """(node, rank) for every node of the directed edge table
    (columns ``src``, ``dst``)."""
    setup = _shard_graph(edges, num_partitions)
    if setup is None:
        return pa.table(
            {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
        )
    n, n_parts, shard_nodes, shard_deg, edge_refs, node_refs, deg_refs = setup
    with np.errstate(divide="ignore"):
        shard_inv = [
            np.where(d > 0, 1.0 / d.astype(np.float64), 0.0) for d in shard_deg
        ]
    inv_refs = [ray.put(iv) for iv in shard_inv]

    rank_refs = [
        ray.put(np.full(len(sn), 1.0 / n, np.float64)) for sn in shard_nodes
    ]
    teleport = (1.0 - damping) / n
    for _ in range(n_iter):
        dangle = sum(
            ray.get(
                [
                    _dangling_mass.remote(rank_refs[q], deg_refs[q])
                    for q in range(n_parts)
                ]
            )
        )
        # one return object PER DESTINATION shard: gather tasks pull
        # their pieces directly from the scatter workers' object
        # stores — the exchange never routes through the driver
        scatter = [
            _scatter.options(num_returns=n_parts).remote(
                edge_refs[p][0], edge_refs[p][1], edge_refs[p][2],
                node_refs[p], inv_refs[p], rank_refs[p], n_parts,
            )
            for p in range(n_parts)
        ]
        if n_parts == 1:  # num_returns=1 yields a bare ref, not a list
            scatter = [[s] for s in scatter]
        rank_refs = [
            _gather.remote(
                node_refs[q],
                [scatter[p][q] for p in range(n_parts)],
                damping,
                teleport,
                dangle / n,
            )
            for q in range(n_parts)
        ]
    ranks = ray.get(rank_refs)
    return pa.table(
        {
            "node": pa.array(np.concatenate(shard_nodes), pa.int64()),
            "rank": pa.array(np.concatenate(ranks), pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Fixed-point PageRank — the same BSP plan in exact int64 arithmetic
# (ranks in units of 1/PR_SCALE, per-edge contribution = rank //
# out-degree, damping as the rational damping_num/damping_den). Every
# reduce is an integer sum, so the result is independent of partition
# count, shard topology AND accumulation order — the determinism
# float PageRank can only promise per fixed partitioning. That makes
# the 20-iteration fixpoint exactly re-derivable by the DuckDB oracle
# (unrolled integer CTEs) and reproducible bit-for-bit across cluster
# sizes — the property a 100 TB resume/retry pipeline actually needs.
# Mass conservation is approximate (each floor division sheds < 1
# unit of 1e-15), bounded by (edges + nodes) ulps per iteration.
# ---------------------------------------------------------------------------

PR_SCALE = 10**15


@ray.remote
def _scatter_fixed(
    src: np.ndarray,
    dst: np.ndarray,
    dst_part: np.ndarray,
    nodes: np.ndarray,
    deg: np.ndarray,
    rank: np.ndarray,
    n_parts: int,
):
    """Integer contributions (rank // out-degree) binned by dst shard.
    Every src has deg >= 1 by construction (degree counts src rows)."""
    pos = np.searchsorted(nodes, src)
    contrib = rank[pos] // deg[pos]
    order = np.argsort(dst_part, kind="stable")
    dp, dd, cc = dst_part[order], dst[order], contrib[order]
    bounds = np.searchsorted(dp, np.arange(n_parts + 1))
    return [
        (dd[bounds[q]: bounds[q + 1]], cc[bounds[q]: bounds[q + 1]])
        for q in range(n_parts)
    ]


@ray.remote
def _gather_fixed(
    nodes: np.ndarray,
    piece_refs: list,
    damping_num: int,
    damping_den: int,
    tele: int,
    dangle_n: int,
):
    acc = np.zeros(len(nodes), np.int64)
    for ref in piece_refs:
        val = ray.get(ref)
        if isinstance(val, list):  # n_parts == 1: un-split scatter output
            val = val[0]
        d_ids, c = val
        if len(d_ids):
            np.add.at(acc, np.searchsorted(nodes, d_ids), c)
    return tele + (damping_num * (acc + dangle_n)) // damping_den


@ray.remote
def _dangling_mass_fixed(rank: np.ndarray, deg: np.ndarray) -> int:
    return int(rank[deg == 0].sum())


def pagerank_fixed(
    edges: pa.Table,
    damping_num: int = 85,
    damping_den: int = 100,
    n_iter: int = 20,
    num_partitions: int | None = None,
    scale: int = PR_SCALE,
) -> pa.Table:
    """(node, rank_fp) in units of 1/scale — exact-integer damped
    PageRank, bitwise identical at ANY partition count."""
    setup = _shard_graph(edges, num_partitions)
    if setup is None:
        return pa.table(
            {"node": pa.array([], pa.int64()), "rank_fp": pa.array([], pa.int64())}
        )
    n, n_parts, shard_nodes, _shard_deg, edge_refs, node_refs, deg_refs = setup
    rank_refs = [
        ray.put(np.full(len(sn), scale // n, np.int64)) for sn in shard_nodes
    ]
    tele = ((damping_den - damping_num) * scale) // (damping_den * n)
    for _ in range(n_iter):
        dangle = sum(
            ray.get(
                [
                    _dangling_mass_fixed.remote(rank_refs[q], deg_refs[q])
                    for q in range(n_parts)
                ]
            )
        )
        dangle_n = dangle // n
        scatter = [
            _scatter_fixed.options(num_returns=n_parts).remote(
                edge_refs[p][0], edge_refs[p][1], edge_refs[p][2],
                node_refs[p], deg_refs[p], rank_refs[p], n_parts,
            )
            for p in range(n_parts)
        ]
        if n_parts == 1:  # num_returns=1 yields a bare ref, not a list
            scatter = [[s] for s in scatter]
        rank_refs = [
            _gather_fixed.remote(
                node_refs[q],
                [scatter[p][q] for p in range(n_parts)],
                damping_num,
                damping_den,
                tele,
                dangle_n,
            )
            for q in range(n_parts)
        ]
    ranks = ray.get(rank_refs)
    return pa.table(
        {
            "node": pa.array(np.concatenate(shard_nodes), pa.int64()),
            "rank_fp": pa.array(np.concatenate(ranks), pa.int64()),
        }
    )


def pagerank_fixed_dense(
    edges: pa.Table,
    damping_num: int = 85,
    damping_den: int = 100,
    n_iter: int = 20,
    scale: int = PR_SCALE,
) -> dict[int, int]:
    """Single-machine reference with identical integer semantics."""
    src = edges.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = edges.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    if n == 0:
        return {}
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    deg = np.zeros(n, np.int64)
    np.add.at(deg, si, 1)
    rank = np.full(n, scale // n, np.int64)
    tele = ((damping_den - damping_num) * scale) // (damping_den * n)
    for _ in range(n_iter):
        dangle_n = int(rank[deg == 0].sum()) // n
        acc = np.zeros(n, np.int64)
        np.add.at(acc, di, rank[si] // np.maximum(deg[si], 1))
        rank = tele + (damping_num * (acc + dangle_n)) // damping_den
    return {int(k): int(v) for k, v in zip(nodes, rank)}


def pagerank_dense(
    edges: pa.Table, damping: float = 0.85, n_iter: int = 20
) -> dict[int, float]:
    """Reference single-machine power iteration with identical
    semantics (tests pin the distributed result against this)."""
    src = edges.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = edges.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    if n == 0:
        return {}
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    deg = np.zeros(n, np.int64)
    np.add.at(deg, si, 1)
    inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
    rank = np.full(n, 1.0 / n)
    t = (1.0 - damping) / n
    for _ in range(n_iter):
        dangle = rank[deg == 0].sum()
        acc = np.zeros(n)
        np.add.at(acc, di, rank[si] * inv[si])
        rank = t + damping * (acc + dangle / n)
    return {int(k): float(v) for k, v in zip(nodes, rank)}


# ---------------------------------------------------------------------------
# Multi-source BFS hop distances — the same hash-sharded BSP plan as
# PageRank but in the MIN-PLUS semiring: each round every edge
# partition proposes dist[src]+1 to its destination shard, each shard
# keeps the elementwise minimum, and the loop stops at the first
# unchanged round (or the ``max_iter`` cap the SQL oracle mirrors).
# min is idempotent, commutative and associative, so the fixpoint is
# independent of partition count, shard topology and accumulation
# order — BFS levels are exact integers, there is nothing to drift.
# Per round the exchange ships only frontier-reachable (dst, cand)
# int64 pairs between worker object stores; the driver sees one bool
# per shard. Rounds are bounded by the graph diameter — O(log n) on
# star-contracted dedup graphs.
# ---------------------------------------------------------------------------

_BFS_INF = np.int64(2**62)


@ray.remote
def _bfs_scatter(
    src: np.ndarray,
    dst: np.ndarray,
    dst_part: np.ndarray,
    nodes: np.ndarray,
    dist: np.ndarray,
    n_parts: int,
):
    """Candidate distances dist[src]+1, binned by destination shard;
    unreached sources (INF) ship nothing."""
    pos = np.searchsorted(nodes, src)
    cand = dist[pos]
    ok = cand < _BFS_INF
    cand = cand[ok] + 1
    dd_all, dp = dst[ok], dst_part[ok]
    order = np.argsort(dp, kind="stable")
    dp, dd, cc = dp[order], dd_all[order], cand[order]
    bounds = np.searchsorted(dp, np.arange(n_parts + 1))
    return [
        (dd[bounds[q]: bounds[q + 1]], cc[bounds[q]: bounds[q + 1]])
        for q in range(n_parts)
    ]


@ray.remote(num_returns=2)
def _bfs_gather(nodes: np.ndarray, dist: np.ndarray, piece_refs: list):
    """Elementwise min of the shard's distances with every incoming
    candidate batch; second return is the shard's changed flag (the
    only thing the driver pulls per round)."""
    new = dist.copy()
    for ref in piece_refs:
        val = ray.get(ref)
        if isinstance(val, list):  # n_parts == 1: un-split scatter output
            val = val[0]
        d_ids, c = val
        if len(d_ids):
            np.minimum.at(new, np.searchsorted(nodes, d_ids), c)
    return new, bool((new != dist).any())


def bfs_distances(
    edges: pa.Table,
    seeds: np.ndarray,
    max_iter: int = 64,
    num_partitions: int | None = None,
) -> pa.Table:
    """(node, dist) hop distances from the nearest seed over the
    directed edge table (columns ``src``, ``dst``; pass both
    directions for an undirected graph). Nodes unreachable from any
    seed within ``max_iter`` rounds are omitted — mirroring the SQL
    oracle's bounded recursive walk."""
    setup = _shard_graph(edges, num_partitions)
    if setup is None:
        return pa.table(
            {"node": pa.array([], pa.int64()), "dist": pa.array([], pa.int64())}
        )
    _n, n_parts, shard_nodes, _deg, edge_refs, node_refs, _deg_refs = setup
    seeds_sorted = np.unique(np.asarray(seeds, np.int64))
    dist_refs = []
    for sn in shard_nodes:
        d = np.full(len(sn), _BFS_INF, np.int64)
        d[np.isin(sn, seeds_sorted)] = 0
        dist_refs.append(ray.put(d))
    for _ in range(max_iter):
        scatter = [
            _bfs_scatter.options(num_returns=n_parts).remote(
                edge_refs[p][0], edge_refs[p][1], edge_refs[p][2],
                node_refs[p], dist_refs[p], n_parts,
            )
            for p in range(n_parts)
        ]
        if n_parts == 1:  # num_returns=1 yields a bare ref, not a list
            scatter = [[s] for s in scatter]
        pairs = [
            _bfs_gather.remote(
                node_refs[q],
                dist_refs[q],
                [scatter[p][q] for p in range(n_parts)],
            )
            for q in range(n_parts)
        ]
        dist_refs = [p[0] for p in pairs]
        if not any(ray.get([p[1] for p in pairs])):
            break
    dists = ray.get(dist_refs)
    nodes_all = np.concatenate(shard_nodes)
    dist_all = np.concatenate(dists) if dists else np.zeros(0, np.int64)
    reached = dist_all < _BFS_INF
    return pa.table(
        {
            "node": pa.array(nodes_all[reached], pa.int64()),
            "dist": pa.array(dist_all[reached], pa.int64()),
        }
    )


def bfs_dense(edges: pa.Table, seeds: np.ndarray, max_iter: int = 64):
    """Reference single-machine BFS with identical semantics (tests
    pin the distributed result against this)."""
    src = edges.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = edges.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    if len(nodes) == 0:
        return {}
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    dist = np.full(len(nodes), _BFS_INF, np.int64)
    dist[np.isin(nodes, np.unique(np.asarray(seeds, np.int64)))] = 0
    for _ in range(max_iter):
        cand = dist.copy()
        np.minimum.at(cand, di, dist[si] + 1)
        if (cand == dist).all():
            break
        dist = cand
    return {
        int(k): int(v) for k, v in zip(nodes, dist) if v < _BFS_INF
    }


# ---------------------------------------------------------------------------
# Triangle counting — the local-clustering diagnostic for dedup
# graphs (a cluster glued by a single weak chain has zero triangles;
# a genuine dup clique is triangle-dense). Standard degree-ordered
# orientation: each undirected edge points from the lower (deg, id)
# endpoint to the higher, every triangle then has exactly ONE apex
# whose two out-neighbors close it, and Σ out-deg² — the wedge work —
# is O(m^1.5) regardless of hubs (a star's hub gets out-degree ≤ 1).
# Distributed shape: apex adjacency hash-partitioned across tasks;
# the oriented edge-key set (one u64 per edge, node ids densified to
# 32-bit codes) is ray.put ONCE and probed with searchsorted in every
# task; tasks return sparse (code, count) partials. The wedge
# expansion is fully vectorized (rank-decode arithmetic, no per-node
# Python loop).
# ---------------------------------------------------------------------------


def _wedge_pairs(cnts: np.ndarray):
    """(grp, i, j) index triples enumerating all within-group ordered
    pairs i < j for groups of the given sizes — pure arithmetic."""
    pairs_per = cnts * (cnts - 1) // 2
    tot = int(pairs_per.sum())
    if tot == 0:
        e = np.zeros(0, np.int64)
        return e, e, e
    grp = np.repeat(np.arange(len(cnts), dtype=np.int64), pairs_per)
    starts = np.concatenate([[0], np.cumsum(pairs_per)[:-1]])
    r = np.arange(tot, dtype=np.int64) - np.repeat(starts, pairs_per)
    j = ((1.0 + np.sqrt(1.0 + 8.0 * r.astype(np.float64))) / 2.0).astype(
        np.int64
    )
    j = np.where(j * (j - 1) // 2 > r, j - 1, j)   # float-sqrt guards
    j = np.where((j + 1) * j // 2 <= r, j + 1, j)
    i = r - j * (j - 1) // 2
    return grp, i, j


@ray.remote
def _tri_part(
    src_codes: np.ndarray,
    dst_codes: np.ndarray,
    keys: np.ndarray,
    n_codes: int,
):
    """Count triangles closed over this partition's apex adjacency:
    for each apex, probe every oriented out-neighbor pair against the
    broadcast edge-key set; credit all three corners."""
    if not len(src_codes):
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    # adjacency groups: src_codes arrives sorted by (src, dst-rank)
    uniq, starts = np.unique(src_codes, return_index=True)
    cnts = np.diff(np.concatenate([starts, [len(src_codes)]]))
    grp, i, j = _wedge_pairs(cnts)
    if not len(grp):
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    off = starts[grp]
    vi = dst_codes[off + i]
    vj = dst_codes[off + j]
    probe = (vi.astype(np.uint64) << np.uint64(32)) | vj.astype(np.uint64)
    pos = np.searchsorted(keys, probe)
    pos[pos >= len(keys)] = len(keys) - 1 if len(keys) else 0
    hit = len(keys) > 0
    hits = (keys[pos] == probe) if hit else np.zeros(len(probe), bool)
    acc = np.zeros(n_codes, np.int64)
    np.add.at(acc, uniq[grp[hits]], 1)   # apex corner
    np.add.at(acc, vi[hits], 1)
    np.add.at(acc, vj[hits], 1)
    nz = np.flatnonzero(acc)
    return nz, acc[nz]


def triangle_counts(
    edges: pa.Table, num_partitions: int | None = None
) -> pa.Table:
    """(node, triangles) per node of the undirected simple graph given
    as distinct ``a`` < ``b`` pairs; nodes in no triangle are omitted."""
    if edges.num_rows > _EDGE_SETUP_MAX:
        raise ValueError(
            f"{edges.num_rows} edges exceed the driver setup gate "
            f"{_EDGE_SETUP_MAX}; pre-partition with a Dataset pass"
        )
    empty = pa.table(
        {
            "node": pa.array([], pa.int64()),
            "triangles": pa.array([], pa.int64()),
        }
    )
    if edges.num_rows == 0:
        return empty
    a = edges.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
    b = edges.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    n = len(nodes)
    ca = np.searchsorted(nodes, a)
    cb = np.searchsorted(nodes, b)
    # dedupe (defensive: the algorithm assumes a simple graph)
    packed = ca.astype(np.uint64) << np.uint64(32) | cb.astype(np.uint64)
    packed = np.unique(packed)
    ca = (packed >> np.uint64(32)).astype(np.int64)
    cb = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
    deg = np.zeros(n, np.int64)
    np.add.at(deg, ca, 1)
    np.add.at(deg, cb, 1)
    # orientation rank: position in the (deg, id) total order
    rank = np.empty(n, np.int64)
    rank[np.lexsort((np.arange(n), deg))] = np.arange(n)
    fwd = rank[ca] < rank[cb]
    src = np.where(fwd, ca, cb)
    dst = np.where(fwd, cb, ca)
    keys = np.sort(
        src.astype(np.uint64) << np.uint64(32) | dst.astype(np.uint64)
    )
    keys_ref = ray.put(keys)
    # adjacency sorted by (src, dst-rank): wedge pairs come out in
    # oriented order, so the probe key direction is always correct
    order = np.lexsort((rank[dst], src))
    src, dst = src[order], dst[order]
    n_parts = num_partitions or adaptive_partitions(
        len(src), row_bytes=16, min_partitions=1
    )
    part = (splitmix64_np(src.astype(np.uint64)) % n_parts).astype(np.int64)
    acc = np.zeros(n, np.int64)
    tasks = []
    for p in range(n_parts):
        sel = part == p
        tasks.append(_tri_part.remote(src[sel], dst[sel], keys_ref, n))
    for nz, cnt in ray.get(tasks):
        acc[nz] += cnt
    out = np.flatnonzero(acc)
    if not len(out):
        return empty
    return pa.table(
        {
            "node": pa.array(nodes[out], pa.int64()),
            "triangles": pa.array(acc[out], pa.int64()),
        }
    )


def triangles_dense(edges: pa.Table) -> dict[int, int]:
    """Reference brute-force per-node triangle counts (tests pin the
    distributed result against this)."""
    a = edges.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
    b = edges.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
    es = set()
    adj: dict[int, set] = {}
    for x, y in zip(a.tolist(), b.tolist()):
        if x == y:
            continue
        lo, hi = (x, y) if x < y else (y, x)
        if (lo, hi) in es:
            continue
        es.add((lo, hi))
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    cnt: dict[int, int] = {}
    for (x, y) in es:
        common = adj.get(x, set()) & adj.get(y, set())
        for z in common:
            if z > y:   # each triangle once: x < y < z
                for v in (x, y, z):
                    cnt[v] = cnt.get(v, 0) + 1
    return cnt
