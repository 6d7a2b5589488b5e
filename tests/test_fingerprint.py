"""Rolling-hash content-defined chunking tests: exactness of the
vectorized Rabin-Karp pass, boundary stability under insertion (the
property that makes partial-overlap dedup work), and the distributed
partial-overlap pair pipeline."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rsmetacheck_ray.functions import fingerprint as fp


def test_rolling_hash_matches_direct():
    rng = np.random.default_rng(7)
    b = rng.integers(0, 256, 500).astype(np.uint8)
    h = fp._rolling_hashes(b)
    with np.errstate(over="ignore"):
        for i in (0, 3, 250, len(b) - fp._WINDOW):
            acc = np.uint64(0)
            for j in range(fp._WINDOW):
                acc = acc * fp._P + np.uint64(b[i + j])
            assert h[i] == acc, i


def test_chunk_bounds_and_coverage():
    text = " ".join(f"token{i}" for i in range(3000))
    bounds = fp.chunk_boundaries(text.encode())
    assert bounds[-1] == len(text.encode())
    lens = np.diff([0] + bounds)
    assert (lens <= fp._MAX_CHUNK).all()
    # all but the final chunk respect the minimum
    assert (lens[:-1] >= fp._MIN_CHUNK).all()


def test_insertion_preserves_most_chunks():
    base = " ".join(f"word{i}" for i in range(2000))
    shifted = "AN INSERTED PREFIX SENTENCE APPEARS HERE " + base
    ca = {h for _, _, h, _ in fp.doc_chunks(0, base)}
    cb = {h for _, _, h, _ in fp.doc_chunks(1, shifted)}
    assert len(ca & cb) / len(ca) > 0.7


def test_empty_and_tiny_docs():
    assert fp.doc_chunks(0, "") == []
    rows = fp.doc_chunks(1, "tiny")
    assert len(rows) == 1 and rows[0][3] == len(b"tiny")


def test_partial_overlap_pairs_pipeline(ray_session):
    """All overlapping pairs must appear — including (1, 2), where
    NEITHER member is the chunk groups' min id (a star construction
    would miss it; caught by round-2 code review)."""
    import ray.data as rd

    base = " ".join(f"word{i}" for i in range(3000))
    docs = [
        (0, base),
        (1, "A DIFFERENT LEAD-IN THEN THE SHARED BODY " + base),
        (2, "ANOTHER DISTINCT PREFIX BEFORE THE SAME BODY " + base),
        (3, " ".join(f"other{i}" for i in range(3000))),  # unrelated
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([s for _, s in docs], pa.string()),
        }
    )
    out = fp.partial_overlap_pairs(rd.from_arrow(t), min_shared_chunks=2).to_pandas()
    pairs = set(zip(out["doc_id_a"], out["doc_id_b"]))
    assert {(0, 1), (0, 2), (1, 2)} <= pairs
    for a, b in pairs:
        assert {a, b} <= {0, 1, 2}
