"""Encoding-hygiene + readability operator tests over PLANTED damage:
replacement chars, C0 controls, mojibake signatures, and hand-computed
ARI values — the boundary cases the sf testdata (clean synthetic text)
never exercises. DuckDB parity is separately pinned by the full-oracle
sweep; these tests pin absolute semantics."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from rsmetacheck_ray.pipelines.queries import (
    q_doc_encoding_flags,
    q_doc_readability,
)


def _write_docs(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["t"] * len(texts), pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def _rows(ds):
    out = ds if isinstance(ds, pa.Table) else pa.Table.from_pandas(ds.to_pandas())
    return {r["doc_id"]: r for r in out.to_pylist()}


def test_encoding_flags_planted(ray_session, tmp_path):
    texts = [
        "plain ascii only.",
        "café résumé",                 # non-ascii, no damage
        "bad � bytes � here",                # replacement chars
        "ctrl\x01\x02 kept\t\n\r end\x1f",             # C0 controls, ws kept
        "moji Ã© and Ã¨ end",      # UTF-8-as-Latin-1
        "Â«quotedÂ»",              # Â-mojibake
    ]
    sf = _write_docs(tmp_path, texts)
    rows = _rows(q_doc_encoding_flags(sf))

    assert rows[0]["n_non_ascii"] == 0 and rows[0]["clean_text"] == texts[0]
    assert rows[1]["n_non_ascii"] == 3 and rows[1]["n_mojibake"] == 0
    assert rows[2]["n_replacement"] == 2
    assert rows[2]["clean_text"] == "bad  bytes  here"
    assert rows[3]["n_control"] == 3  # \x01 \x02 \x1f — not \t\n\r
    assert rows[3]["clean_text"] == "ctrl kept\t\n\r end"
    assert rows[4]["n_mojibake"] == 2
    assert rows[5]["n_mojibake"] == 2
    # scrub leaves mojibake in place (flagged, not destroyed)
    assert rows[4]["clean_text"] == texts[4]


def test_readability_hand_computed(ray_session, tmp_path):
    texts = [
        "The cat sat.",              # 9 chars, 3 words, 1 sentence
        "",                          # all-zero: greatest() guards
        "no terminator here",        # 0 sentences -> s clamped to 1
        "Hi! Ok? Yes... end.",       # [.!?]+ runs: 4 sentences
    ]
    sf = _write_docs(tmp_path, texts)
    rows = _rows(q_doc_readability(sf))

    assert (rows[0]["n_ari_chars"], rows[0]["n_words"], rows[0]["n_sentences"]) == (9, 3, 1)
    assert rows[0]["ari"] == (4.71 * (9 / 3.0) + 0.5 * (3 / 1.0)) - 21.43
    assert (rows[1]["n_ari_chars"], rows[1]["n_words"]) == (0, 0)
    assert rows[1]["ari"] == (4.71 * 0.0 + 0.5 * 0.0) - 21.43
    assert rows[2]["n_sentences"] == 0
    assert rows[2]["ari"] == (4.71 * (16 / 3.0) + 0.5 * (3 / 1.0)) - 21.43
    assert rows[3]["n_sentences"] == 4


def _write_docs_sl(tmp_path, rows):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "lang": pa.array([l for _, l in rows], pa.string()),
            "source": pa.array([s for s, _ in rows], pa.string()),
            "n_chars": pa.array([1] * len(rows), pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def test_source_lang_kl_hand_computed(ray_session, tmp_path):
    import math

    from rsmetacheck_ray.pipelines.queries import q_source_lang_kl

    # 'bal' matches the corpus mix exactly -> KL == 0.0 exactly;
    # 'en_only' is pure en vs a 50/50 corpus -> KL == ln(2) exactly
    rows = (
        [("bal", "en")] * 2 + [("bal", "fr")] * 2
        + [("en_only", "en")] * 4 + [("fr_only", "fr")] * 4
    )
    sf = _write_docs_sl(tmp_path, rows)
    out = {r["source"]: r for r in q_source_lang_kl(sf).to_pylist()}
    assert out["bal"]["kl_lang"] == 0.0
    assert out["en_only"]["kl_lang"] == math.log(12.0 / 6.0)  # p=1, q=6/12
    assert out["fr_only"]["kl_lang"] == math.log(12.0 / 6.0)
    assert out["bal"]["n_docs"] == 4 and out["en_only"]["n_docs"] == 4


def test_curate_readability_band(ray_session, tmp_path):
    from rsmetacheck_ray.pipelines.queries import (
        _CURATE_ARI_PCTS,
        q_curate_readability,
        q_doc_readability,
    )

    # 100 docs in one lang with strictly increasing ARI (more chars
    # per word => higher ARI); complete sample (n <= k) => exact
    # nearest-rank band: keep ranks [5, 95] inclusive
    texts = ["w" * (i + 1) + " x." for i in range(100)]
    sf = _write_docs(tmp_path, texts)
    kept = q_curate_readability(sf).to_pandas()
    ari = {
        r["doc_id"]: r["ari"]
        for r in _rows(q_doc_readability(sf)).values()
    }
    order = sorted(ari, key=lambda d: ari[d])
    lo_rank = min(99, (100 * _CURATE_ARI_PCTS[0]) // 100)
    hi_rank = min(99, (100 * _CURATE_ARI_PCTS[1]) // 100)
    expected = {d for d in order[lo_rank: hi_rank + 1]}
    assert set(kept["doc_id"]) == expected
    assert len(kept) == 91


def test_source_gini_known_values(ray_session, tmp_path):
    from rsmetacheck_ray.pipelines.queries import q_source_gini

    # perfectly equal volumes -> G == 0 exactly
    rows = [("a", "en")] * 2 + [("b", "en")] * 2
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(["xx"] * 4, pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
            "source": pa.array([s for s, _ in rows], pa.string()),
            "n_chars": pa.array([10] * 4, pa.int64()),
        }
    )
    d1 = tmp_path / "eq"; d1.mkdir()
    pq.write_table(t, os.path.join(str(d1), "documents.parquet"))
    out = q_source_gini(str(d1)).to_pylist()[0]
    assert out == {"n_sources": 2, "total_chars": 40, "gini": 0.0}

    # volumes 1:3 over two sources -> G = (2*(1*1+2*3) - 3*4)/(2*4) = 0.25
    t2 = pa.table(
        {
            "doc_id": pa.array(range(2), pa.int64()),
            "text": pa.array(["x", "y"], pa.string()),
            "lang": pa.array(["en"] * 2, pa.string()),
            "source": pa.array(["a", "b"], pa.string()),
            "n_chars": pa.array([1, 3], pa.int64()),
        }
    )
    d2 = tmp_path / "skw"; d2.mkdir()
    pq.write_table(t2, os.path.join(str(d2), "documents.parquet"))
    out2 = q_source_gini(str(d2)).to_pylist()[0]
    assert out2["gini"] == 0.25


def test_weighted_sample_properties(ray_session, tmp_path):
    import math

    import numpy as np

    from rsmetacheck_ray.functions.hashing import splitmix64_np
    from rsmetacheck_ray.pipelines.queries import _WS_K, q_weighted_sample

    n = 400
    lens = [(i * 37) % 900 + 1 for i in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array(lens, pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_weighted_sample(str(tmp_path)).to_pandas()
    assert len(out) == _WS_K

    # exact reference: libm keys over the full table
    ids = np.arange(n, dtype=np.uint64)
    hs = (splitmix64_np(ids) >> np.uint64(11)).astype(np.int64)
    keys = [
        (math.log((h + 1) / 9007199254740992.0) / max(w, 1), -i)
        for i, (h, w) in enumerate(zip(hs.tolist(), lens))
    ]
    ref = sorted(range(n), key=lambda i: keys[i], reverse=True)[:_WS_K]
    assert out["doc_id"].tolist() == ref
    # heavier docs are overrepresented: sampled mean length > corpus mean
    assert out["n_chars"].mean() > sum(lens) / n


def test_dedup_cross_source_planted(ray_session, tmp_path):
    from rsmetacheck_ray.pipelines.queries import q_dedup_cross_source

    # doc 10 & 20 get mirror copies (%10==0): cross-source groups of 2.
    # docs 3 and 7 share text WITHIN one source: same-source group,
    # excluded. docs 5 (src a) and 6 (src b) share text: cross-source
    # WITHOUT any mirror copy.
    rows = [
        (3, "same text", "a"), (7, "same text", "a"),
        (5, "shared", "a"), (6, "shared", "b"),
        (10, "ten", "a"), (20, "twenty", "b"),
        (11, "unique1", "a"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    out = sorted(q_dedup_cross_source(str(tmp_path)).to_pandas().itertuples(index=False))
    got = {r.canonical_id: (r.group_size, r.n_sources) for r in out}
    assert 3 not in got           # same-source dup group excluded
    assert got[5] == (2, 2)       # organic cross-source pair
    assert got[10] == (2, 2)      # mirror pair
    assert got[20] == (2, 2)
    assert 11 not in got


def test_lang_keyness_distinctive_not_frequent(ray_session, tmp_path):
    from rsmetacheck_ray.pipelines.corpus import lang_keyness

    # 'the' is the most FREQUENT token in both langs but carries no
    # keyness; 'alpha'/'beta' are distinctive for their lang
    texts, langs = [], []
    for _ in range(20):
        texts.append("the the the alpha"); langs.append("en")
        texts.append("the the the beta"); langs.append("fr")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    outs = []
    for parts in (1, 4):
        res = lang_keyness(str(tmp_path), num_partitions=parts).to_pandas()
        outs.append(res.sort_values(["lang", "chi2", "token"], ignore_index=True))
    assert outs[0].equals(outs[1])
    top = {
        l: g.sort_values("chi2", ascending=False)["token"].iloc[0]
        for l, g in outs[0].groupby("lang")
    }
    assert top == {"en": "alpha", "fr": "beta"}
    # 'the' is never over-represented (identical share) -> excluded
    assert "the" not in set(outs[0]["token"])


def test_quality_percentiles_complete_sample(ray_session, tmp_path):
    from rsmetacheck_ray.pipelines.queries import q_quality_percentiles

    # 10 docs with strictly increasing ARI, one lang, complete sample
    # (n <= k) -> pctl is the exact ECDF: rank-th doc gets
    # (rank+1)*100//10
    texts = ["w" * (i + 1) + " x." for i in range(10)]
    sf = _write_docs(tmp_path, texts)
    out = q_quality_percentiles(sf).to_pandas()
    order = out.sort_values("ari")["doc_id"].tolist()
    got = out.set_index("doc_id")["pctl"]
    for rank, d in enumerate(order):
        assert got[d] == (rank + 1) * 100 // 10


def test_source_readability_drift_planted(ray_session, tmp_path):
    import math

    from rsmetacheck_ray.pipelines.queries import q_source_readability_drift

    # two sources with identical pooled counts -> var 0 -> z NULL;
    # pooled_ari computed on SUMMED counts (verify macro != micro by
    # giving source 'a' two docs whose pooled ARI differs from the
    # mean of the per-doc ARIs)
    texts = ["aa b.", "aaaaaaaa bb cc dd."]
    rows = [("a", texts[0]), ("a", texts[1]), ("b", texts[0]), ("b", texts[1])]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    out = {r["source"]: r for r in q_source_readability_drift(str(tmp_path)).to_pylist()}
    # pooled counts per source: ch = 2+8+2+2+2 = wait, per source:
    # doc0 'aa b.': ch=3 w=2 s=1; doc1: ch=14 w=4 s=1 -> pooled 17/6/2
    expect = (4.71 * (17 / 6.0) + 0.5 * (6 / 2.0)) - 21.43
    assert out["a"]["pooled_ari"] == expect
    assert out["a"]["pooled_ari"] == out["b"]["pooled_ari"]
    assert out["a"]["z"] is None and out["b"]["z"] is None
    # macro (pooled) differs from the micro mean of per-doc ARIs
    d0 = (4.71 * (3 / 2.0) + 0.5 * (2 / 1.0)) - 21.43
    d1 = (4.71 * (14 / 4.0) + 0.5 * (4 / 1.0)) - 21.43
    assert abs(expect - (d0 + d1) / 2) > 0.1
