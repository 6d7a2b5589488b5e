"""Language-ID scorer: accuracy on pool text + unit edge cases."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rsmetacheck_ray.datagen import generate_tables
from rsmetacheck_ray.stages.extract import extract_stage
from rsmetacheck_ray.stages.langid import LangIdScorer


def _mk(texts, langs=None):
    n = len(texts)
    t = pa.table(
        {
            "url": [f"u{i}" for i in range(n)],
            "warc_ts": pa.array([0] * n, pa.timestamp("us")),
            "lang": langs if langs is not None else ["en"] * n,
            "extracted_text": texts,
        }
    )
    return t


def test_detects_each_language():
    sc = LangIdScorer()
    out = sc(
        _mk(
            [
                "the system and value was that table with stream this record from engine",
                "les valeur des fichier est chaine dans nombre pour requete avec ligne",
                "los valor las archivo una cadena por numero como consulta pero linea",
                "der wert die datei und kette ist nummer ein anfrage mit zeile",
                "数据系统表值流窗口查询批向量结果引擎列网络",
            ],
            ["en", "fr", "es", "de", "zh"],
        )
    )
    assert out.column("detected_lang").to_pylist() == ["en", "fr", "es", "de", "zh"]


def test_empty_and_unknown_are_und():
    sc = LangIdScorer()
    out = sc(_mk(["", "zzz qqq xxx www vvv"], [None, None]))
    assert out.column("detected_lang").to_pylist() == ["und", "und"]


def test_fixture_detection_accuracy():
    pages, labels = generate_tables(1500)
    out = LangIdScorer()(extract_stage(pages))
    det = np.array(out.column("detected_lang").to_pylist())
    decl = np.array([d or "" for d in pages.column("lang").to_pylist()])
    fam = np.array(labels.column("family").to_pylist())
    clean = np.isin(fam, ["clean", "duplicate", "pii_email", "pii_phone", "pii_ip", "toxic"])
    assert (det[clean] == decl[clean]).mean() >= 0.995


def test_stopword_basis_falls_back_to_declared():
    sc = LangIdScorer()
    # content-only English: detection is und, stopword basis = declared en
    out = sc(_mk(["system value table stream record engine column"], ["en"]))
    assert out.column("detected_lang").to_pylist() == ["und"]
    assert out.column("stopword_lang").to_pylist() == ["en"]
    assert out.column("stopword_hits").to_pylist() == [0]


def test_union_pass_matches_per_language_counts():
    """The single-scan polars path must reproduce the per-language
    RE2 pass counts exactly (marker sets are disjoint)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from rsmetacheck_ray.stages.langid import LangIdScorer

    sc = LangIdScorer()
    texts = pa.array([
        "the system and the value was here",
        "les donnees est dans la chaine pour toujours",
        "der wert und die zeile ist nicht leer",
        "no markers whatsoever in sight",
        "",
        None,
        "the les der los mixed languages with aussi and auch",
    ], pa.string())
    fast = sc._marker_hits(texts, len(texts))
    slow = np.zeros_like(fast)
    for k, lang in enumerate(sc.patterns):
        slow[k] = pc.count_substring_regex(texts, sc.patterns[lang]).fill_null(0).to_numpy(
            zero_copy_only=False
        )
    assert (fast == slow).all(), (fast, slow)


def test_lang_confusion_matrix(ray_session):
    from rsmetacheck_ray.pipelines.queries import q_lang_confusion

    out = q_lang_confusion("/root/testdata/sf0.001")
    rows = out.to_pylist()
    assert len(rows) > 0
    # a confusion matrix: counts positive, detected side restricted to
    # the detector's label set, and totals equal the corpus size
    dets = {r["detected_lang"] for r in rows}
    assert all(r["n"] > 0 for r in rows)
    assert dets <= {"en", "fr", "es", "de", "und"}
    # totals must equal the pages corpus size: 500 docs + 5 triggers
    assert sum(r["n"] for r in rows) == 505
    # both confirmed and unconfirmed cells exist (non-degenerate)
    assert any(r["detected_lang"] == "en" for r in rows)
    assert any(r["detected_lang"] == "und" for r in rows)
