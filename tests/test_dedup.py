"""Dedup operator tests — exact, MinHash-LSH vs exact Jaccard ground
truth, SimHash locality (the parametrized trigger/non-trigger style of
the reference's detector tests, ``test_p001.py:13-77``)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rsmetacheck_ray.functions import dedup as dd

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog near the river bank now"),    # near dup of 0
    (3, "completely different text about database engines and vectorized batch execution"),
    (4, "another unrelated document discussing language identification and scrubbing"),
    (5, ""),  # empty
]


def _ds():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS], pa.string()),
            }
        )
    )


def test_shingle_and_jaccard_basics():
    assert dd.ngram_jaccard(DOCS[0][1], DOCS[1][1]) == 1.0
    j_near = dd.ngram_jaccard(DOCS[0][1], DOCS[2][1])
    assert 0.5 < j_near < 1.0
    assert dd.ngram_jaccard(DOCS[0][1], DOCS[3][1]) == 0.0


def test_minhash_estimates_jaccard():
    a = dd.minhash_signature(dd.shingle_hashes(DOCS[0][1]))
    b = dd.minhash_signature(dd.shingle_hashes(DOCS[2][1]))
    est = (a == b).mean()
    true = dd.ngram_jaccard(DOCS[0][1], DOCS[2][1])
    assert abs(est - true) < 0.3
    # identical text -> identical signature
    c = dd.minhash_signature(dd.shingle_hashes(DOCS[1][1]))
    assert (a == c).all()


def test_exact_dedup_groups(ray_session):
    out = dd.exact_dedup_groups(_ds()).to_pandas().sort_values("doc_id")
    counts = dict(zip(out["doc_id"], out["dup_count"]))
    assert counts[0] == 2  # docs 0 and 1
    assert counts[2] == 1 and counts[3] == 1 and counts[5] == 1
    assert 1 not in counts  # absorbed into group of 0


def test_exact_dedup_pairs(ray_session):
    out = dd.exact_dedup_pairs(_ds()).to_pandas()
    pairs = set(zip(out["doc_id_a"], out["doc_id_b"]))
    assert pairs == {(0, 1)}


def test_signature_stage_matches_scalar_path():
    """The batched signature stage reproduces the scalar
    shingle→minhash path exactly (Arrow split parity + identical word
    hashes), including empty/whitespace/short-doc edges."""
    from rsmetacheck_ray.functions.dedup import (
        N_BANDS,
        _signature_stage,
        minhash_signature,
        shingle_hashes,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "",
        "   ",
        "one two",
        "　wide　space　tokens　here　",
        "a b c d e f g h i j k l m n o p",
        None,
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = _signature_stage(t, "text", "doc_id")
    sigs = {
        int(d): s
        for d, s in zip(out.column("doc_id").to_pylist(),
                        out.column("signature").to_pylist())
    }
    assert len(out) == len(texts) * N_BANDS
    for i, txt in enumerate(texts):
        expected = minhash_signature(shingle_hashes(txt or ""))
        assert sigs[i] == expected.tobytes(), i


def test_minhash_lsh_finds_near_dups(ray_session):
    out = dd.minhash_lsh_pairs(_ds(), min_est_jaccard=0.5).to_pandas()
    pairs = set(zip(out["doc_id_a"], out["doc_id_b"]))
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    # unrelated docs never pair
    for a, b in pairs:
        assert {a, b} <= {0, 1, 2}


def test_lsh_agrees_with_exact_jaccard_on_corpus(ray_session):
    """LSH recall on planted dups: every pair with true J >= 0.8 must
    be found; every reported pair must have true J >= 0.35."""
    texts = {d: t for d, t in DOCS}
    out = dd.minhash_lsh_pairs(_ds(), min_est_jaccard=0.5).to_pandas()
    found = set(zip(out["doc_id_a"], out["doc_id_b"]))
    for a in texts:
        for b in texts:
            if a < b:
                j = dd.ngram_jaccard(texts[a], texts[b])
                if j >= 0.8 and texts[a] and texts[b]:
                    assert (a, b) in found, (a, b, j)
    for a, b in found:
        assert dd.ngram_jaccard(texts[a], texts[b]) >= 0.35


def test_simhash_locality():
    h0 = dd.simhash64(DOCS[0][1])
    h1 = dd.simhash64(DOCS[1][1])
    h2 = dd.simhash64(DOCS[2][1])
    h3 = dd.simhash64(DOCS[3][1])
    assert h0 == h1
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h0, h2) < ham(h0, h3)
    assert dd.simhash64("") == 0


def test_embedding_near_dup_pairs(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 16)).astype(np.float32)
    base[5] = base[3] + 0.01 * rng.normal(size=16)  # planted near-dup
    t = pa.table(
        {
            "vec_id": pa.array(range(20), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in base],
                                  pa.list_(pa.float32())),
        }
    )
    out = dd.embedding_near_dup_pairs(rd.from_arrow(t), threshold=0.95).to_pandas()
    pairs = set(zip(out["vec_id_a"], out["vec_id_b"]))
    assert (3, 5) in pairs


def test_embedding_lsh_recall_vs_bruteforce(ray_session):
    """The LSH scale path must find most of the brute-force pairs and
    report no false positives (candidates are exact-verified)."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    base = rng.normal(size=(120, 24)).astype(np.float32)
    for i in range(10):  # planted near-dups
        base[100 + i] = base[i] + 0.05 * rng.normal(size=24).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(120), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in base],
                                  pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t)
    exact = dd.embedding_near_dup_pairs(ds, threshold=0.9).to_pandas()
    lsh = dd.embedding_lsh_pairs(ds, threshold=0.9).to_pandas()
    e = set(zip(exact["vec_id_a"], exact["vec_id_b"]))
    l = set(zip(lsh["vec_id_a"], lsh["vec_id_b"]))
    assert l <= e  # exact verification -> no false positives
    assert len(e) >= 10
    assert len(l & e) / len(e) >= 0.8, (len(l), len(e))


def test_embedding_auto_gate(ray_session):
    """embedding_pairs_auto routes by row count: exact under the gate
    (identical to the block-pair path), LSH above it (identical to the
    hyperplane path, a strict subset of exact)."""
    import ray.data as rd

    rng = np.random.default_rng(13)
    base = rng.normal(size=(60, 16)).astype(np.float32)
    for i in range(5):
        base[50 + i] = base[i] + 0.03 * rng.normal(size=16).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(60), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in base],
                                  pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t)

    def pairs(out):
        df = out.to_pandas()
        return set(zip(df["vec_id_a"], df["vec_id_b"]))

    exact = pairs(dd.embedding_near_dup_pairs(ds, threshold=0.9))
    lsh = pairs(dd.embedding_lsh_pairs(ds, threshold=0.9))
    assert pairs(dd.embedding_pairs_auto(ds, threshold=0.9)) == exact
    assert (
        pairs(dd.embedding_pairs_auto(ds, threshold=0.9, max_exact_rows=10))
        == lsh
    )
    assert lsh <= exact


def test_exact_dedup_pairs_megagroup_linear(ray_session):
    """A planted 10k-copy dup group emits g-1 star pairs, not g(g-1)/2 —
    the scale guard for boilerplate mega-groups (VERDICT r1 item 3)."""
    import ray.data as rd

    n = 10_000
    t = pa.table(
        {
            "doc_id": pa.array(range(n + 5), pa.int64()),
            "text": pa.array(
                ["same boilerplate page"] * n + [f"unique {i}" for i in range(5)],
                pa.string(),
            ),
        }
    )
    out = dd.exact_dedup_pairs(rd.from_arrow(t)).to_pandas()
    assert len(out) == n - 1
    assert (out["doc_id_a"] == 0).all()
    assert set(out["doc_id_b"]) == set(range(1, n))


def test_minhash_bucket_cap_bounds_output(ray_session):
    """A hot LSH bucket (many identical docs) is truncated at the
    bucket cap, so output stays bounded (cap shrunk here to keep the
    test fast; the default is MAX_BUCKET_DOCS)."""
    import ray.data as rd

    cap = 64
    n = cap + 40
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["identical text for every doc in the bucket"] * n),
        }
    )
    out = dd.minhash_lsh_pairs(
        rd.from_arrow(t), min_est_jaccard=0.5, max_bucket_docs=cap
    ).to_pandas()
    assert len(out) <= cap * (cap - 1) / 2
    assert len(out) > 0


def test_simhash_pairs_banded_hamming(ray_session):
    """simhash_pairs finds near-identical docs (Hamming <= 3 guaranteed
    by the 4x16-bit banding) and pairs nothing unrelated."""
    import ray.data as rd

    texts = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank today and more words follow"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank today and more words follow"),  # identical -> hamming 0
        (2, "completely different content about database engines and batch execution pipelines"),
        (3, "unrelated writing that covers language identification scrubbing and quality scores"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in texts], pa.int64()),
            "text": pa.array([s for _, s in texts], pa.string()),
        }
    )
    out = dd.simhash_pairs(rd.from_arrow(t), max_hamming=3).to_pandas()
    pairs = set(zip(out["doc_id_a"], out["doc_id_b"]))
    assert (0, 1) in pairs
    assert out.set_index(["doc_id_a", "doc_id_b"]).loc[(0, 1), "hamming"] == 0
    for a, b in pairs:
        assert {a, b} <= {0, 1}


def _inc_ds(rows, parallelism=None):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in rows], pa.int64()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        )
    )
    return ds.repartition(parallelism) if parallelism else ds


def test_incremental_new_docs(ray_session):
    seen = _inc_ds([(0, "alpha beta"), (1, "gamma delta")])
    new = _inc_ds(
        [
            (10, "alpha beta"),      # copy of seen -> not new
            (11, "epsilon zeta"),    # fresh -> new
            (12, "epsilon zeta"),    # duplicate WITHIN the increment -> still new
            (13, "gamma delta"),     # copy of seen -> not new
        ]
    )
    out = (
        dd.incremental_new_docs(new, seen)
        .to_pandas()
        .set_index("doc_id")["is_new"]
        .to_dict()
    )
    assert out == {10: False, 11: True, 12: True, 13: False}


def test_incremental_empty_sides(ray_session):
    rows = [(1, "a"), (2, "b")]
    all_new = dd.incremental_new_docs(_inc_ds(rows), _inc_ds([])).to_pandas()
    assert all_new["is_new"].all() and len(all_new) == 2
    none = dd.incremental_new_docs(_inc_ds([]), _inc_ds(rows)).to_pandas()
    assert len(none) == 0


def test_incremental_deterministic_across_partitionings(ray_session):
    import pandas as pd

    seen_rows = [(i, f"text {i % 7}") for i in range(40)]
    new_rows = [(100 + i, f"text {i % 11}") for i in range(40)]

    def run(p):
        return (
            dd.incremental_new_docs(
                _inc_ds(new_rows, parallelism=p), _inc_ds(seen_rows, parallelism=p)
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(1), run(6))


def test_incremental_bloom_no_false_negatives(ray_session):
    """The Bloom probe is one-sided: every doc the EXACT operator
    marks as already-seen must be maybe_seen in the Bloom result, and
    every maybe_seen=False doc must be exactly new."""
    from rsmetacheck_ray.pipelines.queries import (
        q_dedup_incremental,
        q_dedup_incremental_bloom,
    )

    sf = "/root/testdata/sf0.001"
    exact = q_dedup_incremental(sf).to_pandas().set_index("doc_id")
    bloom = q_dedup_incremental_bloom(sf).to_pandas().set_index("doc_id")
    assert set(exact.index) == set(bloom.index)
    j = exact.join(bloom)
    # seen content (is_new False) must always probe maybe_seen True
    assert j.loc[~j.is_new, "maybe_seen"].all()
    # a definite miss is definitely new
    assert j.loc[~j.maybe_seen, "is_new"].all()
    # and the filter is useful: most truly-new docs are definite misses
    assert (~j.loc[j.is_new, "maybe_seen"]).mean() > 0.9
