"""Language vocabulary pools — the single source of truth shared by the
deterministic fixture generator (``datagen.py``), the language-ID marker
sets (``stages/langid.py``) and the perplexity LM training corpus
(``stages/perplexity.py``).

Marker sets are mutually DISJOINT across languages so marker-density
language ID is unambiguous on pool-generated text. The content pools
are the non-marker filler words.

Analog of the reference's canonical-name tables
(``utils/pitfall_utils.py:42-61`` normalize_language_name): a frozen
lookup that downstream stages treat as spec, not data.
"""

from __future__ import annotations

# Marker ("stopword") sets — DISJOINT across languages by construction.
MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "was", "that", "with", "this", "from", "have"),
    "fr": ("les", "des", "est", "dans", "pour", "avec", "mais", "aussi"),
    "es": ("los", "las", "una", "por", "como", "pero", "entre", "sobre"),
    "de": ("der", "die", "und", "ist", "ein", "mit", "nicht", "auch"),
}

# Content (non-marker) word pools per language.
CONTENT: dict[str, tuple[str, ...]] = {
    "en": (
        "system", "value", "table", "stream", "record", "window", "filter",
        "merge", "query", "batch", "vector", "result", "engine", "column",
        "network", "process", "signal", "module", "object", "memory",
    ),
    "fr": (
        "valeur", "fichier", "chaine", "nombre", "requete", "ligne",
        "colonne", "resultat", "moteur", "reseau", "memoire", "signal",
        "module", "objet", "tableau", "fenetre", "flux", "calcul",
        "donnees", "schema",
    ),
    "es": (
        "valor", "archivo", "cadena", "numero", "consulta", "linea",
        "columna", "resultado", "motor", "memoria", "modulo", "objeto",
        "tabla", "ventana", "flujo", "calculo", "datos", "esquema",
        "sistema", "proceso",
    ),
    "de": (
        "wert", "datei", "kette", "nummer", "anfrage", "zeile", "spalte",
        "ergebnis", "motor", "speicher", "modul", "objekt", "tabelle",
        "fenster", "fluss", "rechnung", "daten", "schema", "systeme",
        "prozess",
    ),
}

# Chinese character pool (common Hanzi). zh text is generated as runs of
# these characters; language ID detects zh via CJK-character ratio.
ZH_CHARS: str = "数据系统表值流窗口查询批向量结果引擎列网络过程信号模块对象内存的是在有和了不人我他这中大来上国"

LANGS: tuple[str, ...] = ("en", "fr", "es", "de", "zh")

# Mild toxicity wordlist for the scrub stage (spec constant).
TOXICITY_WORDS: tuple[str, ...] = ("hellspawn", "damnable", "bastardly")
