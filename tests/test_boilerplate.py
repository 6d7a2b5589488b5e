"""Corpus-frequency boilerplate line scrub (functions/boilerplate.py)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from rsmetacheck_ray.functions.boilerplate import (
    hot_line_hashes,
    line_doc_frequency,
    scrub_boilerplate_lines,
)

FOOTER = "© example corp — all rights reserved"
NAV = "home | products | about | contact"


def _ds(rows, parallelism=None):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    if parallelism:
        return rd.from_arrow(t).repartition(parallelism)
    return rd.from_arrow(t)


CORPUS = [
    (1, f"unique article one\n{NAV}\n{FOOTER}"),
    (2, f"{NAV}\nanother body\n{FOOTER}"),
    (3, f"third story text\n{FOOTER}"),
    (4, "rare line kept\nonly here"),
    (5, f"{NAV}\n{FOOTER}"),  # all lines hot at min_df=3
]


def _scrub(rows, min_df=3, **kw):
    return (
        scrub_boilerplate_lines(_ds(rows), _ds(rows), min_df=min_df, **kw)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )


def test_hot_lines_removed_rare_lines_kept(ray_session):
    out = _scrub(CORPUS)
    # FOOTER df=4, NAV df=3 -> both hot; every body line unique -> kept
    assert out.loc[1, "text_scrubbed"] == "unique article one"
    assert out.loc[1, "n_lines_removed"] == 2
    assert out.loc[2, "text_scrubbed"] == "another body"
    assert out.loc[3, "text_scrubbed"] == "third story text"
    assert out.loc[3, "n_lines_removed"] == 1
    assert out.loc[4, "text_scrubbed"] == "rare line kept\nonly here"
    assert out.loc[4, "n_lines_removed"] == 0
    # a document of only boilerplate scrubs to the empty string
    assert out.loc[5, "text_scrubbed"] == ""
    assert out.loc[5, "n_lines_removed"] == 2


def test_every_instance_of_a_hot_line_removed(ray_session):
    # doc 1 repeats the footer: df counts it once, the scrub drops both
    rows = [
        (1, f"{FOOTER}\nbody\n{FOOTER}"),
        (2, FOOTER),
        (3, FOOTER),
    ]
    out = _scrub(rows)
    assert out.loc[1, "text_scrubbed"] == "body"
    assert out.loc[1, "n_lines_removed"] == 2


def test_threshold_boundary(ray_session):
    rows = [(i, f"body {i}\n{FOOTER}") for i in range(1, 4)]
    # df == 3: hot at min_df=3, not at min_df=4
    assert (_scrub(rows, min_df=3)["n_lines_removed"] == 1).all()
    assert (_scrub(rows, min_df=4)["n_lines_removed"] == 0).all()


def test_line_doc_frequency_counts_docs_not_instances(ray_session):
    rows = [(1, f"{NAV}\n{NAV}\nx"), (2, NAV)]
    df = line_doc_frequency(_ds(rows)).to_pandas()
    assert sorted(df["n_docs"].tolist()) == [1, 2]  # NAV=2 docs, "x"=1
    hot = hot_line_hashes(_ds(rows), min_df=2)
    assert len(hot) == 1 and np.all(np.diff(hot) > 0)


def test_empty_corpus_and_no_hot_lines(ray_session):
    assert len(scrub_boilerplate_lines(_ds([]), _ds([])).to_pandas()) == 0
    rows = [(1, "a\nb"), (2, "c")]
    out = _scrub(rows)  # nothing reaches min_df=3
    assert out["n_lines_removed"].tolist() == [0, 0]
    assert out["text_scrubbed"].tolist() == ["a\nb", "c"]


def test_deterministic_across_partitionings(ray_session):
    rows = [(i, f"body {i}\n{FOOTER}" if i % 2 else f"{NAV}\nbody {i}") for i in range(40)]

    def run(p):
        return (
            scrub_boilerplate_lines(
                _ds(rows, parallelism=p), _ds(rows, parallelism=p)
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    import pandas as pd

    pd.testing.assert_frame_equal(run(1), run(7))
