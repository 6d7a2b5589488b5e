"""Planted B-cubed evaluation check: hand-computed precision/recall
on a corpus with one perfect cluster and one over-merge."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_bcubed_hand_computed(ray_session, tmp_path):
    from rsmetacheck_ray.pipelines.queries import q_dedup_bcubed

    d = str(tmp_path)
    prefix = "p" * 64  # shared 64-char prefix -> one near-dup cluster
    rows = [
        # docs 3 and 7: same prefix, different tails -> over-merged
        # cluster {3,7}; truth singletons
        (3, prefix + " tail three " + "x" * 64),
        (7, prefix + " tail seven " + "y" * 64),
        # doc 10: %10==0 -> the CC corpus adds an exact replica
        # 1000010; prefix cluster == truth pair -> perfect cell
        (10, "q" * 64 + " unique body ten " + "z" * 64),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["s"] * len(rows), pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = q_dedup_bcubed(d).to_pylist()[0]
    # corpus = {3, 7, 10, 1000010}; clusters {3,7} and {10,1000010};
    # truth {3}, {7}, {10,1000010}
    assert got["n_docs"] == 4
    # P: docs 3,7 contribute 1/2 each; 10 and its replica 1 each -> 3/4
    assert got["bcubed_p"] == 0.75
    # R: every truth item fully recovered -> 1
    assert got["bcubed_r"] == 1.0
    assert abs(got["bcubed_f1"] - (2 * 0.75 / 1.75)) < 1e-12
    # exact micro-unit sums
    assert got["sum_p_fp"] == 3_000_000 and got["sum_r_fp"] == 4_000_000
