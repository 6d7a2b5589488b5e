"""Property-based tests (hypothesis) for the fuzz-sensitive surfaces:
arbitrary unicode through the rule catalog and scrubber must never
crash and must hold the documented invariants; the rolling-hash
chunker must exactly tile every byte string within its bounds; the
scrub pass must be idempotent (a scrubbed document re-scrubs to
itself, the reference's re-run stability property)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from rsmetacheck_ray.config import DEFAULT_CONFIG
from rsmetacheck_ray.functions import fingerprint as fp
from rsmetacheck_ray.stages.rules import DROP_CODES, RULE_CODES, apply_scrub, rule_stage_fn

_TEXT = st.text(max_size=400)


def _gate_batch(texts: list[str], urls: list[str] | None = None) -> pa.Table:
    n = len(texts)
    urls = urls or [f"https://site{i}.example.com/x" for i in range(n)]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "url": pa.array(urls),
            "warc_ts": pa.array([1_672_531_200_000_000] * n, pa.timestamp("us")),
            "extracted_text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "n_tokens": pa.array([len(t.split()) for t in texts], pa.int64()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            "n_tokens_scan": pa.array([len(t.split()) for t in texts], pa.int64()),
            "stopword_hits": pa.array([0] * n, pa.int64()),
            "stopword_lang": pa.array([None] * n, pa.string()),
            "detected_lang": pa.array(["und"] * n, pa.string()),
            "langid_conf": pa.array([0.0] * n, pa.float64()),
            "bits_per_char": pa.array([1.0] * n, pa.float64()),
        }
    )


@settings(max_examples=40, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_rule_stage_total_on_arbitrary_unicode(texts):
    """No rule may crash on any unicode input (the reference's
    defensive key-probing invariant): rule_errors stays empty, keep is
    a total boolean, and every hit column is boolean."""
    out = rule_stage_fn(_gate_batch(texts), DEFAULT_CONFIG, with_evidence=True)
    assert not any(out.column("rule_errors").to_pylist())
    keep = out.column("keep").to_pylist()
    assert all(isinstance(k, bool) for k in keep)
    # keep == not any drop rule fired (the catalog contract)
    for i in range(len(texts)):
        fired_drop = any(
            out.column(f"hit_{c}")[i].as_py() for c in DROP_CODES
        )
        assert keep[i] == (not fired_drop)
    for c in RULE_CODES:
        assert out.column(f"hit_{c}").type == pa.bool_()


@settings(max_examples=40, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_scrub_idempotent(texts):
    """Scrubbing an already-scrubbed document is a no-op — replacement
    tokens (<EMAIL>, <PHONE>, <IP>, ****) never re-match any pattern."""
    arr = pa.array(texts, pa.string())
    once = apply_scrub(arr)
    twice = apply_scrub(once)
    assert once.to_pylist() == twice.to_pylist()


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=20_000))
def test_chunker_tiles_exactly(data):
    """Chunk boundaries exactly tile [0, n): monotone, end at n, every
    chunk within (min, max] except the final remainder."""
    bounds = fp.chunk_boundaries(data)
    if not data:
        assert bounds == []
        return
    assert bounds[-1] == len(data)
    assert all(b2 > b1 for b1, b2 in zip(bounds, bounds[1:]))
    lens = np.diff([0] + bounds)
    assert (lens <= fp._MAX_CHUNK).all()
    if len(lens) > 1:
        assert (lens[:-1] >= fp._MIN_CHUNK).all()
    # determinism
    assert bounds == fp.chunk_boundaries(data)


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=2000))
def test_doc_chunks_cover_all_bytes(text):
    rows = fp.doc_chunks(0, text)
    assert sum(r[3] for r in rows) == len(text.encode("utf-8"))
