"""Benchmark decontamination — flag corpus documents that share any
word k-gram with a held-out benchmark/eval set (the training-data
hygiene step run before every pretraining job: eval examples that leak
into the training corpus inflate benchmark scores, so contaminated
documents are dropped or audited).

The reference has no analog (SURVEY §2 stops at per-document checks);
this is a cross-corpus operator in the dedup family
(functions/dedup.py) specialised to the asymmetric case: the benchmark
side is TINY (eval sets are MBs) while the corpus side is the full
100 TB stream. That asymmetry picks the plan:

 - **benchmark side**: one streamed pass collects the distinct k-gram
   hashes to the driver (bounded by the benchmark's vocabulary, not
   the corpus) and ``ray.put``\\ s ONE sorted uint64 array.
 - **corpus side**: a ``map_batches`` stage of CACHED TASKS pulls the
   array from the object store once per worker process, then every batch is
   one Arrow whitespace split + dictionary-encoded vocabulary hashing
   + one global windowed combine + a vectorized ``searchsorted``
   membership probe. No shuffle at all — the corpus never moves.

Gram hashing reuses the dedup primitives (``_word_hashes`` memo,
rotate-xor window combine, ``splitmix64`` finalize), so two word
sequences collide only with ~2⁻⁶⁴ probability — the hash-membership
answer equals the string-membership answer the SQL oracle computes
(LEAD-window 5-grams joined against the benchmark's distinct grams).

Docs with fewer than k words emit no grams — exact parity with the
oracle's ``LEAD(w, k-1) IS NOT NULL`` qualification.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .dedup import _combine_windows, _word_hashes
from .tokenize import tokens_with_doc_index

DEFAULT_NGRAM = 5


def batch_gram_hashes(
    arr: pa.Array | pa.ChunkedArray, k: int = DEFAULT_NGRAM
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, gram_hash) for every word k-gram of every string in
    ``arr`` — one canonical ``\\S+`` split for the batch (shared
    ``tokens_with_doc_index``, ASCII-WS parity with the SQL oracles),
    per-NEW-word hashing via the dictionary encoding, one masked
    global window combine. Raw (non-unique) grams; callers needing set
    semantics dedup per doc."""
    doc_idx, denc = tokens_with_doc_index(arr)
    if denc is None:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    dict_hashes = _word_hashes(denc.dictionary.to_pylist())
    wh_flat = dict_hashes[denc.indices.to_numpy(zero_copy_only=False)]
    total = len(wh_flat)
    if total < k:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    # windows crossing a document boundary are masked out — a doc with
    # fewer than k words therefore contributes nothing
    gh = _combine_windows(wh_flat, k)
    valid = doc_idx[: total - k + 1] == doc_idx[k - 1 :]
    return doc_idx[: total - k + 1][valid], gh[valid]


def benchmark_gram_hashes(
    bench: rd.Dataset, text_col: str = "text", k: int = DEFAULT_NGRAM
) -> np.ndarray:
    """Sorted distinct k-gram hashes of the benchmark set. Streams the
    (small) benchmark; only per-batch-unique uint64 hashes ever reach
    the driver — bounded by the benchmark's gram vocabulary."""
    parts: list[np.ndarray] = []
    for b in bench.iter_batches(batch_format="pyarrow", batch_size=4096):
        _, gh = batch_gram_hashes(b.column(text_col), k)
        if len(gh):
            parts.append(np.unique(gh))
    if not parts:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(parts))


class _ContaminationProbe:
    """Broadcast-probe stage, run as CACHED TASKS (not an actor pool):
    ``ray.get`` of the gram ref is a zero-copy plasma read that the
    worker process caches, and Ray task workers are reused across
    tasks and executions — the same loaded-once guarantee as an actor
    pool WITHOUT the per-query pool spin-up (the gate's `_GATE_CACHE`
    discipline, quality_gate.py)."""

    def __init__(self, gram_ref, id_col: str, text_col: str, k: int):
        self.grams = ray.get(gram_ref)  # sorted uint64
        self.id_col, self.text_col, self.k = id_col, text_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                self.id_col: pa.array([], pa.int64()),
                "n_shared_grams": pa.array([], pa.int64()),
            }
        )
        if len(ids) == 0 or len(self.grams) == 0:
            return empty
        di, gh = batch_gram_hashes(batch.column(self.text_col), self.k)
        if len(di) == 0:
            return empty
        pos = np.searchsorted(self.grams, gh)
        pos_c = np.minimum(pos, len(self.grams) - 1)
        hit = self.grams[pos_c] == gh
        md, mh = di[hit], gh[hit]
        if len(md) == 0:
            return empty
        # count DISTINCT shared grams per doc: lexsort the matched
        # (doc, gram) pairs, drop repeats, bincount the doc runs
        order = np.lexsort((mh, md))
        md, mh = md[order], mh[order]
        first = np.empty(len(md), dtype=bool)
        first[0] = True
        first[1:] = (md[1:] != md[:-1]) | (mh[1:] != mh[:-1])
        md_u = md[first]
        docs = np.unique(md_u)
        counts = np.bincount(
            np.searchsorted(docs, md_u), minlength=len(docs)
        ).astype(np.int64)
        return pa.table(
            {
                self.id_col: pa.array(ids[docs], pa.int64()),
                "n_shared_grams": pa.array(counts, pa.int64()),
            }
        )


def contaminated_docs(
    corpus: rd.Dataset,
    bench: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_NGRAM,
    concurrency: tuple[int, int] | int | None = None,
) -> rd.Dataset:
    """(id, n_shared_grams) for every corpus document sharing ≥1 word
    k-gram with the benchmark set. The corpus streams; the benchmark
    gram set broadcasts once. ``concurrency`` is accepted for API
    stability but unused — the probe runs as cached tasks
    (functions/taskcache.py), which auto-scale."""
    grams = benchmark_gram_hashes(bench, text_col, k)
    if len(grams) == 0:
        # nothing can match: skip the whole corpus pass, not just the
        # per-batch work inside it
        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_shared_grams": pa.array([], pa.int64()),
                }
            )
        )
    from .taskcache import cached_stage

    gram_ref = ray.put(grams)
    return corpus.map_batches(
        cached_stage(_ContaminationProbe, gram_ref, id_col, text_col, k),
        batch_format="pyarrow",
    )
