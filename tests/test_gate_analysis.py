"""Consistency checks for the r5 gate-analysis queries at sf0.001 —
internal invariants that hold regardless of corpus content."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def test_rule_marginal_bounds(ray_session):
    from rsmetacheck_ray.pipelines.queries import (
        _DROP_NOLM_CODES, q_gate_rule_marginal,
    )

    rows = q_gate_rule_marginal(SF).to_pylist()
    assert [r["rule"] for r in rows] == sorted(_DROP_NOLM_CODES)
    for r in rows:
        assert 0 <= r["n_sole"] <= r["n_hits"]
    # at least one rule must carry unique signal on the gate corpus
    assert any(r["n_sole"] > 0 for r in rows)


def test_ppl_sensitivity_monotone(ray_session):
    from rsmetacheck_ray.config import DEFAULT_CONFIG
    from rsmetacheck_ray.pipelines.queries import q_gate_ppl_sensitivity

    rows = q_gate_ppl_sensitivity(SF).to_pylist()
    ths = [r["threshold"] for r in rows]
    assert ths == sorted(ths) and len(ths) == 25
    drops = [r["n_lm_dropped"] for r in rows]
    keeps = [r["n_kept"] for r in rows]
    # raising the threshold can only drop fewer and keep more
    assert drops == sorted(drops, reverse=True)
    assert keeps == sorted(keeps)
    # the configured threshold sits on the grid; its keep count must
    # equal the gate's own kept total
    from rsmetacheck_ray.pipelines.queries import q_gate_decisions

    kept_total = sum(
        1 for r in q_gate_decisions(SF).take_all() if r["keep"]
    )
    at_cfg = {r["threshold"]: r["n_kept"] for r in rows}[
        DEFAULT_CONFIG.max_bits_per_char
    ]
    assert at_cfg == kept_total


def test_order_yield_internal_consistency(ray_session):
    from rsmetacheck_ray.pipelines.queries import q_dedup_order_yield

    r = q_dedup_order_yield(SF).to_pylist()[0]
    assert 0 < r["gate_then_dedup_kept"] <= r["n_docs"]
    assert 0 <= r["dedup_then_gate_kept"] <= r["gate_then_dedup_kept"] + r["n_docs"]


def test_curate_pack_invariants(ray_session):
    from rsmetacheck_ray.functions.packing import DEFAULT_CAPACITY
    from rsmetacheck_ray.pipelines.queries import q_curate_pack

    rows = q_curate_pack(SF).to_pylist()
    assert rows, "curation must keep something at sf0.001"
    for r in rows:
        assert r["n_docs"] >= 1
        # multi-doc bins respect capacity (single oversized docs may not)
        if r["n_docs"] > 1:
            assert r["n_tokens"] <= DEFAULT_CAPACITY
    keys = [(r["shard"], r["bin"]) for r in rows]
    assert keys == sorted(keys) and len(set(keys)) == len(keys)


def test_best_survivor_beats_min_id_canonical(ray_session):
    from rsmetacheck_ray.pipelines.queries import (
        q_dedup_best_survivor, q_dedup_components,
    )

    best = {r["component_id"]: r
            for r in q_dedup_best_survivor(SF).take_all()}
    comp_rows = q_dedup_components(SF).take_all()
    assert best and comp_rows
    # every cluster has exactly one survivor, and it is a member
    members: dict[int, set] = {}
    for r in comp_rows:
        members.setdefault(r["component_id"], set()).add(r["doc_id"])
    for cid, r in best.items():
        assert r["doc_id"] in members[cid]
    assert set(best) == set(members)
