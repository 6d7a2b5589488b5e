"""Duplicated-span removal (functions/spandedup.py): keep-first
semantics the sf-corpus oracle can't isolate — cross-document
precedence, overlapping covered spans, within-doc repeats, sub-W
documents, empty/null text, full-removal docs."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from rsmetacheck_ray.functions.spandedup import dedup_spans


def _run(texts, ids=None, w=3):
    ids = ids or list(range(len(texts)))
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    return (
        dedup_spans(ds, w=w)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_cross_doc_first_occurrence_survives(ray_session):
    # "a b c" (W=3) appears in docs 0 and 1 — doc 0 keeps it whole,
    # doc 1 loses those three positions but keeps its unique tail
    df = _run(["a b c x y", "a b c q r"])
    assert df["clean_text"].tolist() == ["a b c x y", "q r"]
    assert df["n_words"].tolist() == [5, 5]
    assert df["kept_words"].tolist() == [5, 2]


def test_overlapping_spans_union_not_doublecount(ray_session):
    # doc 1 repeats a 4-word phrase: two overlapping duplicated
    # 3-grams ("a b c" at pos1, "b c d" at pos2) cover positions 1-4
    # exactly once each — the mask is a union, kept_words = 1
    df = _run(["a b c d tail", "a b c d z"])
    assert df["clean_text"].tolist() == ["a b c d tail", "z"]
    assert df["kept_words"].tolist() == [5, 1]


def test_within_doc_repeat_removed(ray_session):
    # same doc repeats the phrase: first instance kept, second removed
    df = _run(["p q r STOP p q r"])
    assert df["clean_text"].tolist() == ["p q r STOP"]
    assert df["kept_words"].tolist() == [4]


def test_doc_order_not_input_order(ray_session):
    # first = smallest (doc_id, pos), not input row order
    df = _run(["s t u", "s t u"], ids=[9, 2])
    by_id = dict(zip(df["doc_id"], df["kept_words"]))
    assert by_id == {2: 3, 9: 0}
    assert df.loc[df.doc_id == 9, "clean_text"].iloc[0] == ""


def test_short_and_empty_docs_untouched(ray_session):
    # docs shorter than W form no grams; '' and null are one empty word
    df = _run(["x y", "x y", "", None])
    assert df["clean_text"].tolist() == ["x y", "x y", "", ""]
    assert df["n_words"].tolist() == [2, 2, 1, 1]
    assert df["kept_words"].tolist() == [2, 2, 1, 1]


def test_unique_content_inside_duplicate_lines(ray_session):
    # the phrase repeats mid-line — line-level dedup would miss this
    df = _run(
        ["intro THE SHARED PHRASE outro", "other THE SHARED PHRASE end"]
    )
    assert df["clean_text"].tolist() == [
        "intro THE SHARED PHRASE outro",
        "other end",
    ]


def test_consecutive_spaces_are_words(ray_session):
    # '  ' splits to empty words (DuckDB string_split parity) and they
    # participate in grams like any other word
    df = _run(["a  b c", "a  b c"])
    assert df["n_words"].tolist() == [4, 4]
    assert df["kept_words"].tolist() == [4, 0]


def test_dup_gram_fractions_planted(ray_session):
    import ray.data as rd

    from rsmetacheck_ray.functions.spandedup import dup_gram_fractions

    # doc 1 and 2 share their full 5-word text -> every gram dup (1.0)
    # doc 3 is unique -> 0.0; doc 4 has 6 words where the FIRST 5-gram
    # equals doc 3's... keep simpler: doc 4 unique too, fraction 0.0
    texts = [
        "a b c d e",
        "a b c d e",
        "q w e r t y",
        "z x v n m k l",
    ]
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    outs = []
    for parts in (1, 3):
        res = dup_gram_fractions(
            rd.from_arrow(t).repartition(2), num_partitions=parts
        ).to_pandas().sort_values("doc_id", ignore_index=True)
        outs.append(res)
    assert outs[0].equals(outs[1])
    got = outs[0].set_index("doc_id")
    assert got.loc[1, "dup_fraction"] == 1.0 and got.loc[1, "n_grams"] == 1
    assert got.loc[2, "dup_fraction"] == 1.0
    assert got.loc[3, "dup_fraction"] == 0.0 and got.loc[3, "n_grams"] == 2
    assert got.loc[4, "dup_fraction"] == 0.0 and got.loc[4, "n_grams"] == 3
