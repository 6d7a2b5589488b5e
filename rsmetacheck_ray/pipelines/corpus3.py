"""Corpus batch 3 (round 4, continuation): retrieval and sampling
shapes the suite did not yet cover —

- positional phrase search (``phrase_search``): exact consecutive
  token-sequence matching — the positional-postings capability a
  retrieval index adds on top of ``term_postings``'s doc-level
  postings,
- asymmetric n-gram containment pairs (``containment_pairs``): the
  quote / inclusion detector — |A∩B| / |A| ≥ τ catches a small page
  embedded inside a big one, which symmetric Jaccard structurally
  misses (the union term dilutes it),
- Neyman-allocated stratified sampling (``stratified_neyman_sample``):
  the survey-sampling allocation n_h ∝ N_h·σ_h — strata with more
  internal variance get proportionally more of the sample budget than
  proportional allocation would give them.

The reference has no analog (single-process JSON metadata walk);
these extend the training-data-pipeline axis the builder brief makes
first-class, in the styles of corpus.py / functions/jaccard.py.

Scale notes. ``phrase_search`` is ZERO-shuffle: a phrase hit is a
within-document property, so every batch answers for its own rows
(one RE2 split, vectorized adjacency over dictionary codes).
``containment_pairs`` reuses the rare-gram candidate discipline of
``functions/jaccard.py`` — only grams with df ≤ max_df expand into
pairs (bounded O(df²) per gram), then candidates are verified exactly
against the two documents' gram sets; the verify side ships gram
HASHES (8 B each), never text. ``stratified_neyman_sample`` ships one
(lang, n, Σx, Σx²) moment row per (batch, stratum); the allocation is
solved on the bounded per-stratum table and membership is a
broadcast bottom-k-by-hash threshold probe, so the corpus itself
never shuffles (the token_budget_sample discipline).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions.tokenize import WS_TOKEN_RE, tokens_with_doc_index
from .relational import _read_pq


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return _read_pq(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# positional phrase search
# ---------------------------------------------------------------------------

_PHRASE = ("fast", "table")


def phrase_search(
    sf_dir: str, w1: str = _PHRASE[0], w2: str = _PHRASE[1]
) -> rd.Dataset:
    """(doc_id, n_occ, first_pos): documents containing the exact
    consecutive token phrase ``w1 w2``, with the occurrence count and
    the 0-based token position of the first hit.

    Zero-shuffle: adjacency is a within-document property, so each
    batch emits its own answer rows. One canonical ``\\S+`` split per
    batch (tokens_with_doc_index), then the match is two dictionary-
    code compares and a doc-boundary guard — no per-row Python."""

    def local(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_occ": pa.array([], pa.int64()),
                "first_pos": pa.array([], pa.int64()),
            }
        )
        doc_idx, enc = tokens_with_doc_index(b.column("text"))
        n = len(doc_idx)
        if enc is None or n < 2:
            return empty
        vocab = enc.dictionary.to_pylist()
        try:
            c1 = vocab.index(w1)
            c2 = vocab.index(w2)
        except ValueError:  # a phrase word absent from the whole batch
            return empty
        codes = enc.indices.to_numpy(zero_copy_only=False)
        # token position within its own document: the flattened split
        # is doc-major, so doc_idx is nondecreasing and a run-start
        # subtraction gives 0-based positions
        new_doc = np.empty(n, dtype=bool)
        new_doc[0] = True
        np.not_equal(doc_idx[1:], doc_idx[:-1], out=new_doc[1:])
        run_id = np.cumsum(new_doc) - 1
        run_start = np.flatnonzero(new_doc)
        pos = np.arange(n, dtype=np.int64) - run_start[run_id]
        hit = (
            (codes[:-1] == c1)
            & (codes[1:] == c2)
            & (doc_idx[:-1] == doc_idx[1:])
        )
        hidx = np.flatnonzero(hit)
        if len(hidx) == 0:
            return empty
        hdocs = doc_idx[hidx]
        # hits are position-ordered, so the first index per doc run IS
        # the first occurrence
        udocs, first = np.unique(hdocs, return_index=True)
        n_occ = np.bincount(hdocs)[udocs]
        dids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(dids[udocs], pa.int64()),
                "n_occ": pa.array(n_occ.astype(np.int64), pa.int64()),
                "first_pos": pa.array(pos[hidx[first]], pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        local, batch_format="pyarrow"
    )


def _phrase_sql(w1: str = _PHRASE[0], w2: str = _PHRASE[1]) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(text, '{WS_TOKEN_RE}') AS toks
  FROM documents
),
m AS (
  SELECT doc_id,
    list_filter(range(1, len(toks)),
                i -> toks[i] = '{w1}' AND toks[i + 1] = '{w2}') AS hits
  FROM t
)
SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_occ,
       CAST(hits[1] - 1 AS BIGINT) AS first_pos
FROM m WHERE len(hits) > 0
"""


PHRASE_SEARCH_SQL = _phrase_sql()
