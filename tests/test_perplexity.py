"""Perplexity scorer: calibration margins and determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rsmetacheck_ray.config import DEFAULT_CONFIG
from rsmetacheck_ray.datagen import generate_tables
from rsmetacheck_ray.stages.extract import extract_stage
from rsmetacheck_ray.stages.perplexity import PerplexityScorer

_KEEP_FAMILIES = [
    "clean", "duplicate", "pii_email", "pii_phone", "pii_ip", "toxic",
    "outdated_ts", "bare_identifier", "homepage_url", "archive_url",
    "shorthand_url", "multi_value_lang",
]


def test_margins_on_fixtures():
    pages, labels = generate_tables(1500)
    sc = PerplexityScorer()
    out = sc(extract_stage(pages))
    bpc = np.array(out.column("bits_per_char").to_pylist())
    fam = np.array(labels.column("family").to_pylist())
    keep = np.isin(fam, _KEEP_FAMILIES)
    thr = DEFAULT_CONFIG.max_bits_per_char
    assert bpc[keep].max() < thr - 1.0, "keep rows must clear the gate with margin"
    gib = fam == "gibberish"
    assert gib.any()
    assert bpc[gib].min() > thr + 1.0, "gibberish must fail the gate with margin"


def test_empty_text_scores_zero():
    sc = PerplexityScorer()
    t = pa.table({"extracted_text": ["", "ab"]})
    out = sc(t)
    assert out.column("bits_per_char").to_pylist()[0] == 0.0


def test_deterministic_across_instances():
    t = pa.table({"extracted_text": ["the system and value was that table with stream"]})
    a = PerplexityScorer()(t).column("bits_per_char").to_pylist()
    b = PerplexityScorer()(t).column("bits_per_char").to_pylist()
    assert a == b
