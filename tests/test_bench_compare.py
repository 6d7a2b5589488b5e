"""Unit tests for tools/bench_compare.py: window-factor normalization
(a uniform slowdown flags nothing), relative-regression flagging, and
the truncated-tail salvage path (the driver keeps ~2 KB of stdout)."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

_SPEC = importlib.util.spec_from_file_location(
    "bench_compare",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "bench_compare.py",
    ),
)
bc = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bc)


def test_uniform_slowdown_flags_nothing():
    old = {f"q{i}": 1.0 for i in range(10)}
    new = {f"q{i}": 1.9 for i in range(10)}  # whole window 1.9x slower
    r = bc.compare(old, new, threshold=2.0)
    assert r["window_factor"] == 1.9
    assert r["regressions"] == []


def test_relative_regression_flagged():
    old = {f"q{i}": 1.0 for i in range(10)}
    new = {f"q{i}": 1.0 for i in range(10)}
    new["q3"] = 2.5  # only q3 slower than 2x the median ratio (1.0)
    r = bc.compare(old, new, threshold=2.0)
    assert [f["query"] for f in r["regressions"]] == ["q3"]
    assert r["regressions"][0]["normalized"] == 2.5


def test_subthreshold_and_tiny_pairs_ignored():
    old = {"a": 1.0, "b": 0.02, "c": 1.0}
    new = {"a": 1.5, "b": 0.08, "c": 1.0}  # b is 4x but sub-100ms
    r = bc.compare(old, new, threshold=2.0)
    assert r["regressions"] == []


def test_salvage_from_truncated_tail(tmp_path):
    # a tail cut MID-JSON, the driver's BENCH_r03 failure mode:
    # medians dict fragment + spread fragments, plus meta keys that
    # must not be mistaken for queries
    tail = (
        '_sample": [0.173, 0.174], "scrub_boilerplate": [0.501, 0.524], '
        '"knn_cosine": 0.19, "value": 4.685, "num_cpus": 32, '
        '"dedup_exact": 0.5, '
    )
    p = tmp_path / "wrapped.json"
    p.write_text(json.dumps({"n": 3, "rc": 0, "tail": tail, "parsed": None}))
    q = bc.load_queries(str(p))
    assert q["knn_cosine"] == 0.19
    assert q["dedup_exact"] == 0.5
    assert q["scrub_boilerplate"] == 0.501  # spread form -> min
    assert "value" not in q and "num_cpus" not in q


def test_full_json_line_roundtrip(tmp_path):
    p = tmp_path / "raw.json"
    p.write_text(json.dumps({
        "metric": "quality_gate_e2e", "value": 5.0,
        "queries": {"a": 1.0, "b": 2.0},
    }))
    assert bc.load_queries(str(p)) == {"a": 1.0, "b": 2.0}
