"""Rule-catalog tests, mirroring the reference's parametrized
trigger / non-trigger style (``test_p001.py:142-228``): every family
must fire its expected rules, clean rows must fire nothing, and the
result-shape invariants hold (``test_p001.py:230-240``)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rsmetacheck_ray.datagen import FAMILIES, generate_tables
from rsmetacheck_ray.stages.extract import extract_stage
from rsmetacheck_ray.stages.langid import LangIdScorer
from rsmetacheck_ray.stages.perplexity import PerplexityScorer
from rsmetacheck_ray.stages.rules import (
    CATALOG,
    DROP_CODES,
    RULE_CODES,
    apply_scrub,
    rule_stage_fn,
)


@pytest.fixture(scope="module")
def gated():
    pages, labels = generate_tables(3000)
    b = PerplexityScorer()(LangIdScorer()(extract_stage(pages)))
    return rule_stage_fn(b, with_rule_hits=True), pages, labels


def test_catalog_shape():
    assert len(RULE_CODES) == len(set(RULE_CODES))
    for rule in CATALOG:
        assert rule.severity in ("drop", "flag")
        assert rule.suggestion


@pytest.mark.parametrize("family,expected_rules,expected_keep",
                         [(f, r, k) for f, _, r, k in FAMILIES])
def test_family_fires_expected_rules(gated, family, expected_rules, expected_keep):
    out, pages, labels = gated
    fam = np.array(labels.column("family").to_pylist())
    m = fam == family
    assert m.any(), f"no {family} rows in fixture"
    keep = np.array(out.column("keep").to_pylist())[m]
    assert (keep == expected_keep).all()
    for code in expected_rules:
        hits = np.array(out.column(f"hit_{code}").to_pylist())[m]
        assert hits.all(), f"{family}: rule {code} did not fire on all rows"


def test_clean_rows_fire_nothing(gated):
    out, pages, labels = gated
    fam = np.array(labels.column("family").to_pylist())
    m = np.isin(fam, ["clean", "duplicate"])
    for code in RULE_CODES:
        hits = np.array(out.column(f"hit_{code}").to_pylist())[m]
        assert not hits.any(), f"rule {code} fired on clean rows"


def test_keep_is_negation_of_drop_rules(gated):
    out, _, _ = gated
    keep = np.array(out.column("keep").to_pylist())
    drop = np.zeros(len(keep), dtype=bool)
    for code in DROP_CODES:
        drop |= np.array(out.column(f"hit_{code}").to_pylist())
    assert (keep == ~drop).all()


def test_rule_hits_struct_matches_bool_columns(gated):
    out, _, _ = gated
    hits = out.column("rule_hits").to_pylist()
    for i in range(0, len(hits), 97):
        listed = {h["rule"] for h in hits[i]}
        from_cols = {c for c in RULE_CODES if out.column(f"hit_{c}")[i].as_py()}
        assert listed == from_cols


def test_scrub_matches_labels(gated):
    out, pages, labels = gated
    got = out.column("scrubbed_text").to_pylist()
    exp = labels.column("expected_scrubbed_text").to_pylist()
    assert got == exp


def test_rule_exception_isolation():
    """A crashing rule is skipped for the batch and recorded; the run
    continues (semantics of detect_pitfalls_main.py:356-358)."""
    import rsmetacheck_ray.stages.rules as R

    pages, _ = generate_tables(50)
    b = PerplexityScorer()(LangIdScorer()(extract_stage(pages)))
    broken = R.Rule("boom", "drop", "test", lambda ctx: 1 / 0, "boom")
    R.CATALOG.append(broken)
    R.RULE_CODES.append("boom")
    R.DROP_CODES.append("boom")
    try:
        out = R.rule_stage_fn(b)
        err = out.column("rule_errors")[0].as_py()
        assert err and "boom" in err
        assert not any(out.column("hit_boom").to_pylist())
        # other rules still evaluated
        assert "hit_empty_text" in out.column_names
    finally:
        R.CATALOG.remove(broken)
        R.RULE_CODES.remove("boom")
        R.DROP_CODES.remove("boom")


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("mail me at bob.smith+x@corp.example.org now", "mail me at <EMAIL> now"),
        ("call +1-555-123-4567 today", "call <PHONE> today"),
        ("call (555) 123-4567 today", "call <PHONE> today"),
        ("host 10.0.0.1 down", "host <IP> down"),
        ("that hellspawn thing", "that **** thing"),
        ("no pii here", "no pii here"),
        ("date 2021-03-05 is not a phone", "date 2021-03-05 is not a phone"),
    ],
)
def test_scrub_unit_cases(raw, expected):
    out = apply_scrub(pa.array([raw], pa.string()))
    assert out.to_pylist() == [expected]


def test_bigram_stats_vectorized_matches_reference():
    """The polars fast path must reproduce the Python spec exactly,
    including newline/multi-space/empty edge cases."""
    from rsmetacheck_ray.stages.rules import _bigram_line_stats, _bigram_line_stats_py

    texts = [
        "",
        "a b a b a b a b",
        "one two three",             # <4 tokens -> no top_frac
        "x  y\tz   x y",             # runs of whitespace
        "l1\nl2\nl1\nl2\nl3",        # duplicate lines
        "single line no repeat here at all",
        "w " * 600,                  # exceeds the 512-token scan bound
        None,
    ]
    arr = pa.array(texts, pa.string())
    tf_v, nl_v, df_v = _bigram_line_stats(arr, 512)
    tf_p, nl_p, df_p = _bigram_line_stats_py(["" if t is None else t for t in texts], 512)
    assert np.allclose(tf_v, tf_p, rtol=0, atol=0), (tf_v, tf_p)
    assert (nl_v == nl_p).all()
    assert np.allclose(df_v, df_p, rtol=0, atol=0)
