"""Fixed-size token chunking (functions/chunking.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data as rd

from rsmetacheck_ray.functions.chunking import chunk_tokens


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_chunks_match_reference():
    # pure-python reference over several ragged shapes
    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),   # 10 tokens, C=4
        (2, "only three tokens"),
        (3, ""),                                      # no rows
        (4, "   "),                                   # whitespace-only
        (5, " ".join(f"u{i}" for i in range(8))),    # exact multiple
    ]
    import ray  # ray_session fixture owns init; this test is pure driver

    out = (
        chunk_tokens(_ds(rows), chunk_size=4)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    exp = []
    for d, t in rows:
        toks = t.split()
        for c in range(0, len(toks), 4):
            exp.append((d, c // 4, " ".join(toks[c : c + 4]), len(toks[c : c + 4])))
    got = [
        (int(r.doc_id), int(r.chunk_idx), r.chunk_text, int(r.n_tokens))
        for r in out.itertuples()
    ]
    assert got == exp
    assert 3 not in out["doc_id"].tolist()
    assert 4 not in out["doc_id"].tolist()


def test_multiline_whitespace_canonicalized(ray_session):
    out = chunk_tokens(_ds([(7, "a\tb\n c   d e")]), chunk_size=2).to_pandas()
    assert out["chunk_text"].tolist() == ["a b", "c d", "e"]
    assert out["n_tokens"].tolist() == [2, 2, 1]


def test_chunk_size_one_and_validation(ray_session):
    out = chunk_tokens(_ds([(1, "x y z")]), chunk_size=1).to_pandas()
    assert out["chunk_idx"].tolist() == [0, 1, 2]
    assert out["chunk_text"].tolist() == ["x", "y", "z"]
    with pytest.raises(ValueError):
        chunk_tokens(_ds([]), chunk_size=0)


def test_empty_dataset_and_batch_schema(ray_session):
    assert chunk_tokens(_ds([])).count() == 0
    # the stage's empty-batch table carries the full output schema
    from rsmetacheck_ray.functions.chunking import _OUT_SCHEMA

    assert _OUT_SCHEMA.names == [
        "doc_id", "chunk_idx", "chunk_text", "n_tokens",
    ]
