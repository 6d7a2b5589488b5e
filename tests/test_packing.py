"""Sequence-packing operator (functions/packing.py)."""

import pyarrow as pa

import ray.data as rd

from rsmetacheck_ray.functions.packing import pack_sequences


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _packed(rows, **kw):
    df = pack_sequences(_ds(rows), **kw).to_pandas()
    return df.set_index("doc_id").sort_index()


def test_span_math_and_order(ray_session):
    # seq_len=4: doc 1 (3 tok) spans seq 0; doc 2 (3 tok) starts at
    # offset 3 -> spans seqs 0..1; doc 3 (10 tok) starts at 6 -> 1..3
    out = _packed(
        [(1, "a b c"), (2, "d e f"), (3, "g h i j k l m n o p")],
        seq_len=4,
    )
    assert out.loc[1, ["seq_first", "seq_last"]].tolist() == [0, 0]
    assert out.loc[2, ["seq_first", "seq_last"]].tolist() == [0, 1]
    assert out.loc[3, ["seq_first", "seq_last"]].tolist() == [1, 3]
    assert out["n_tokens"].tolist() == [3, 3, 10]


def test_shard_resets_offsets(ray_session):
    # shard_size=2: docs 0,1 in shard 0; docs 2,3 in shard 1 — the
    # second shard's first doc starts at offset 0 again
    out = _packed(
        [(0, "a b c"), (1, "d e"), (2, "x y z"), (3, "w")],
        seq_len=4,
        shard_size=2,
    )
    assert out.loc[0, "shard"] == 0 and out.loc[2, "shard"] == 1
    assert out.loc[2, ["seq_first", "seq_last"]].tolist() == [0, 0]
    # doc 3 starts at offset 3 within shard 1 -> still seq 0 (3 < 4)
    assert out.loc[3, ["seq_first", "seq_last"]].tolist() == [0, 0]


def test_zero_token_docs_omitted(ray_session):
    out = _packed([(1, "a b"), (2, ""), (3, None), (4, "c")], seq_len=4)
    assert sorted(out.index.tolist()) == [1, 4]
    # doc 2/3 contribute nothing to doc 4's offset
    assert out.loc[4, "seq_first"] == 0


def test_deterministic_across_partitionings(ray_session):
    rows = [(i, "tok " * (i % 7 + 1)) for i in range(200)]
    a = _packed(rows, seq_len=8, num_partitions=2)
    b = _packed(rows, seq_len=8, num_partitions=17)
    assert a.equals(b)


# --- First-Fit-Decreasing whole-document packing ---------------------------

from rsmetacheck_ray.functions.packing import pack_ffd


def _ffd(rows, **kw):
    df = pack_ffd(_ds(rows), **kw).to_pandas()
    return df.set_index("doc_id").sort_index()


def test_ffd_planted_assignment(ray_session):
    # capacity 10; sizes 7,6,4,3,2 (FFD order). First-fit:
    # 7->bin0, 6->bin1, 4->bin1(6+4=10), 3->bin0(7+3=10), 2->bin2
    rows = [
        (1, "t " * 7), (2, "t " * 6), (3, "t " * 4),
        (4, "t " * 3), (5, "t " * 2),
    ]
    df = _ffd(rows, capacity=10)
    assert df.loc[1, "bin"] == 0 and df.loc[4, "bin"] == 0
    assert df.loc[2, "bin"] == 1 and df.loc[3, "bin"] == 1
    assert df.loc[5, "bin"] == 2


def test_ffd_capacity_respected_and_oversize_own_bin(ray_session):
    rows = [(i, "x " * ((i * 13) % 18 + 1)) for i in range(100)]
    rows.append((200, "y " * 50))  # oversize vs capacity 20
    df = _ffd(rows, capacity=20)
    fills = df.groupby(["shard", "bin"])["n_tokens"].sum()
    ok = df[df["n_tokens"] <= 20]
    assert (
        ok.groupby(["shard", "bin"])["n_tokens"].sum().index.size > 0
    )
    # every bin NOT holding an oversize doc fits the capacity
    oversize_bins = set(
        map(tuple, df[df["n_tokens"] > 20][["shard", "bin"]].values)
    )
    for key, tot in fills.items():
        if key not in oversize_bins:
            assert tot <= 20, (key, tot)
    # the oversize doc sits ALONE in its bin
    ob = df[df["n_tokens"] > 20]
    assert len(ob) == 1
    key = (ob["shard"].iloc[0], ob["bin"].iloc[0])
    assert (df[["shard", "bin"]].apply(tuple, axis=1) == key).sum() == 1


def test_ffd_never_worse_than_next_fit(ray_session):
    rows = [(i, "w " * ((i * 7) % 23 + 1)) for i in range(300)]
    cap = 25
    df = _ffd(rows, capacity=cap)
    n_bins_ffd = df.groupby("shard")["bin"].nunique().sum()
    # next-fit in doc-id order
    import collections
    by_shard = collections.defaultdict(list)
    for i, t in rows:
        n = len(t.split())
        by_shard[i // 4096].append(n)
    nf_bins = 0
    for sizes in by_shard.values():
        rem, bins = 0, 0
        for s in sizes:
            if s > rem:
                bins += 1
                rem = cap
            rem -= s
        nf_bins += bins
    assert n_bins_ffd <= nf_bins


def test_ffd_partition_invariant(ray_session):
    rows = [(i, "q " * (i % 11 + 1)) for i in range(150)]
    a = _ffd(rows, capacity=16, num_partitions=2)
    b = _ffd(rows, capacity=16, num_partitions=13)
    assert a.equals(b)
