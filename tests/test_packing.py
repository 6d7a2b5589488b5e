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
