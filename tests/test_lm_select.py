"""Planted tests for the r5 curation/monitoring additions:
Moore-Lewis cross-entropy-difference selection and the PSI source
drift score."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _docs(d, rows):
    """rows: (doc_id, text, source)."""
    ids, texts, srcs = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(srcs, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


def test_moore_lewis_prefers_in_domain_vocabulary(ray_session, tmp_path):
    from rsmetacheck_ray.pipelines.queries import q_moore_lewis_select

    d = str(tmp_path)
    rows = [
        # in-domain seed (src0): a->b and b->a are CERTAIN here
        (1, "alpha beta alpha beta alpha beta", "src0"),
        # in-domain-like doc elsewhere: same transitions
        (10, "alpha beta alpha beta", "web"),
        # diluters: under the GENERAL LM alpha also goes to zulu often,
        # so p_gen(a->b) < 1 = p_in(a->b) and doc 10 scores NEGATIVE
        (30, "alpha zulu stop", "web"),
        (31, "alpha zulu stop", "web"),
        (32, "alpha zulu stop", "web"),
        # aliens: every bigram floors on BOTH LMs -> ce_diff exactly 0
        (20, "yankee xray whisky victor uniform tango", "web"),
        (21, "quebec papa oscar november mike lima", "web"),
    ]
    _docs(d, rows)
    got = q_moore_lewis_select(d).take_all()
    assert len(got) == len(rows)  # k=50 > corpus: everything ranked
    ce = [r["ce_diff"] for r in got]
    assert ce == sorted(ce)
    by_id = {r["doc_id"]: r for r in got}
    # in-domain-vocab docs score negative (more probable under the
    # seed LM than the diluted general LM)
    assert by_id[1]["ce_diff"] < 0 and by_id[10]["ce_diff"] < 0
    # aliens floor on both sides -> exactly 0
    assert by_id[20]["ce_diff"] == 0.0 == by_id[21]["ce_diff"]
    # diluters are general-corpus-typical but in-domain-alien -> positive
    assert by_id[30]["ce_diff"] > 0
    order = [r["doc_id"] for r in got]
    assert set(order[:2]) == {1, 10}  # the in-domain-like docs lead


def test_psi_zero_for_identical_and_large_for_shifted(ray_session, tmp_path):
    from rsmetacheck_ray.pipelines.stats import source_psi_chars

    d = str(tmp_path)
    # 'same' mirrors the reference mix; 'shifted' is all huge docs
    rows = []
    i = 0
    for _ in range(30):
        rows.append((i, "x" * 100, "same")); i += 1
        rows.append((i, "x" * 100, "same2")); i += 1
    for _ in range(4):  # minority source: the reference stays ~stable
        rows.append((i, "x" * 5000, "shifted")); i += 1
    _docs(d, rows)
    got = {r["source"]: r for r in source_psi_chars(d).to_pylist()}
    assert set(got) == {"same", "same2", "shifted"}
    assert all(r["psi"] >= 0.0 for r in got.values())
    # sources matching the reference mix sit near 0; the all-huge
    # minority source is far from it
    assert got["shifted"]["psi"] > 10 * got["same"]["psi"]
    assert got["same"]["psi"] < 0.25  # below the "population changed" bar
    assert got["same"]["n_docs"] == 30 and got["shifted"]["n_docs"] == 4
