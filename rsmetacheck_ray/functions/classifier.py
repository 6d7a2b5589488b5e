"""Lexicon quality classifier — a linear text classifier with
INTEGER-quantized weights, the inference shape of a fasttext-style
model-based quality filter (the learned counterpart of the rule
catalog's hand-written heuristics; both gate the same corpus).

Semantics (exactly SQL-derivable, hence a full differential oracle —
most "model scoring" stages are rows-only, this one is not):

    score_total = Σ over every token occurrence of weight(token)
    score_mean  = score_total / max(n_tokens, 1)      (one f64 division)
    keep_quality = score_total · TH_DEN ≥ TH_NUM · n_tokens

Weights are int64, so ``score_total`` is EXACT — no float summation
order to diverge between the engine's per-batch ``bincount`` and the
oracle's SQL ``SUM`` — and the threshold is the rational
``TH_NUM/TH_DEN`` compared by integer cross-multiplication. This is
honest quantized inference: real deployments quantize classifier
weights to integers for throughput; determinism falls out for free.

The default lexicon derives from the frozen vocabulary pools
(``functions/vocab.py`` — the engine's spec-not-data tables): language
markers score +3 (fluency evidence), content-pool words +1, and every
out-of-vocabulary token −2 (junk mass). A real deployment swaps in a
trained lexicon; the operator contract is the lookup-sum-threshold
shape, not these particular weights.

Scale plan: pure ``map_batches`` — NO shuffle at any corpus size. The
lexicon is actor state (built once per actor in ``__init__``); per
batch, ONE canonical ``\\S+`` split, dictionary-encode, weight lookup on
the batch's UNIQUE vocabulary only (Zipf ⇒ dictionary ≪ tokens), then
a vectorized per-doc ``bincount`` sum. The reference's closest analog
is the per-document description-quality heuristics
(``detect_pitfalls_main.py``'s W-rules); this is their learned-model
counterpart.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .tokenize import tokens_with_doc_index
from .vocab import CONTENT, MARKERS

MARKER_WEIGHT = 3
CONTENT_WEIGHT = 1
OOV_WEIGHT = -2

# keep iff score_total / n_tokens >= TH_NUM / TH_DEN (0 by default:
# fluent pool text is marker-dense and scores positive; junk is OOV-
# dominated and scores negative)
TH_NUM = 0
TH_DEN = 1


def default_lexicon() -> dict[str, int]:
    lex: dict[str, int] = {}
    for words in CONTENT.values():
        for w in words:
            lex[w] = CONTENT_WEIGHT
    for words in MARKERS.values():  # markers win over content on clash
        for w in words:
            lex[w] = MARKER_WEIGHT
    return lex


class QualityClassifier:
    """Actor-pool stage: (id, n_tokens, score_total, score_mean,
    keep_quality) per document."""

    def __init__(
        self,
        lexicon: dict[str, int] | None = None,
        oov_weight: int = OOV_WEIGHT,
        th_num: int = TH_NUM,
        th_den: int = TH_DEN,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        pa.set_cpu_count(1)
        self.lex = default_lexicon() if lexicon is None else dict(lexicon)
        self.oov = int(oov_weight)
        self.th_num, self.th_den = int(th_num), int(th_den)
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = pc.cast(batch.column(self.id_col), pa.int64())
        text = pc.fill_null(batch.column(self.text_col), "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        total = np.zeros(n, dtype=np.int64)
        n_tok = np.zeros(n, dtype=np.int64)
        if n:
            doc_idx, denc = tokens_with_doc_index(text)
            if denc is not None:
                vocab = denc.dictionary.to_pylist()
                get = self.lex.get
                dict_w = np.fromiter(
                    (get(w, self.oov) for w in vocab),
                    dtype=np.int64,
                    count=len(vocab),
                )
                tok_w = dict_w[denc.indices.to_numpy(zero_copy_only=False)]
                # int weights < 2^53: float64 bincount accumulation is exact
                total = np.bincount(
                    doc_idx, weights=tok_w, minlength=n
                ).astype(np.int64)
                n_tok = np.bincount(doc_idx, minlength=n).astype(np.int64)
        keep = total * self.th_den >= self.th_num * n_tok
        return pa.table(
            {
                self.id_col: ids,
                "n_tokens": pa.array(n_tok, pa.int64()),
                "score_total": pa.array(total, pa.int64()),
                "score_mean": pa.array(
                    total.astype(np.float64)
                    / np.maximum(n_tok, 1).astype(np.float64),
                    pa.float64(),
                ),
                "keep_quality": pa.array(keep, pa.bool_()),
            }
        )


def classify_quality(
    ds: rd.Dataset,
    lexicon: dict[str, int] | None = None,
    oov_weight: int = OOV_WEIGHT,
    th_num: int = TH_NUM,
    th_den: int = TH_DEN,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: tuple[int, int] | int = (1, 8),
) -> rd.Dataset:
    """Score every document with the quantized linear classifier."""
    return ds.map_batches(
        QualityClassifier,
        fn_constructor_args=(
            lexicon, oov_weight, th_num, th_den, text_col, id_col,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
