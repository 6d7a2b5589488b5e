"""First-occurrence line dedup (functions/linededup.py): ordering
semantics the sf-corpus oracle can't isolate — cross-document
precedence, within-document repeats, full-removal docs, reassembly
order."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from rsmetacheck_ray.functions.linededup import dedup_lines


def _run(texts, ids=None):
    ids = ids or list(range(len(texts)))
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    df = dedup_lines(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    return df


def test_cross_doc_first_wins(ray_session):
    df = _run(["a\nb", "b\nc", "c\na\nd"])
    assert df["dedup_text"].tolist() == ["a\nb", "c", "d"]
    assert df["n_lines"].tolist() == [2, 2, 3]
    assert df["kept_lines"].tolist() == [2, 1, 1]


def test_within_doc_repeat_removed(ray_session):
    df = _run(["x\nx\ny\nx"])
    assert df["dedup_text"].tolist() == ["x\ny"]
    assert df["kept_lines"].tolist() == [2]


def test_doc_losing_every_line(ray_session):
    df = _run(["only line", "only line"])
    assert df["dedup_text"].tolist() == ["only line", ""]
    assert df["kept_lines"].tolist() == [1, 0]
    assert df["n_lines"].tolist() == [1, 1]


def test_doc_order_not_input_order(ray_session):
    # first = smallest (doc_id, pos), regardless of row order in input
    df = _run(["dup", "dup"], ids=[9, 2])
    by_id = dict(zip(df["doc_id"], df["kept_lines"]))
    assert by_id == {2: 1, 9: 0}


def test_order_preserved_after_removal(ray_session):
    df = _run(["keep1\nzap\nkeep2", "zap\nsolo"])
    assert df["dedup_text"].tolist() == ["keep1\nzap\nkeep2", "solo"]


def test_null_and_empty_text(ray_session):
    # '' and null both split to one empty line; corpus-first wins
    df = _run([None, "", "real"])
    assert df["n_lines"].tolist() == [1, 1, 1]
    assert df["kept_lines"].tolist() == [1, 0, 1]
    assert df["dedup_text"].tolist() == ["", "", "real"]
