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


# ---------------------------------------------------------------------------
# per-benchmark-item attribution (r5): not just WHICH corpus docs are
# contaminated, but WHICH eval items they leak — the report an eval
# owner needs to decide whether a benchmark is burned (one item
# replicated across the web vs. diffuse 5-gram noise).
# ---------------------------------------------------------------------------

class _AttributionProbe:
    """Cached-task probe against the broadcast (gram → bench-item)
    index. Emits LOCALLY-DEDUPED (bench_id, kind, val) rows — kind 0
    carries a contaminating corpus doc id, kind 1 a shared gram hash —
    so the one shuffle groups by bench item and the final count is a
    distinct-count per kind."""

    def __init__(self, idx_ref, id_col: str, text_col: str, k: int):
        # (sorted unique gram hashes, CSR offsets, flat bench ids)
        self.grams, self.offs, self.bids = ray.get(idx_ref)
        self.id_col, self.text_col, self.k = id_col, text_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bench_id": pa.array([], pa.int64()),
                "kind": pa.array([], pa.int64()),
                "val": pa.array([], pa.int64()),
            }
        )
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0 or len(self.grams) == 0:
            return empty
        di, gh = batch_gram_hashes(batch.column(self.text_col), self.k)
        if len(di) == 0:
            return empty
        pos = np.searchsorted(self.grams, gh)
        pos_c = np.minimum(pos, len(self.grams) - 1)
        hit = self.grams[pos_c] == gh
        md, mg, mp = di[hit], gh[hit], pos_c[hit]
        if len(md) == 0:
            return empty
        # expand each matched (doc, gram) to its bench items (CSR walk)
        counts = self.offs[mp + 1] - self.offs[mp]
        rep_doc = np.repeat(ids[md].astype(np.int64), counts)
        rep_gram = np.repeat(mg.view(np.int64), counts)
        flat_idx = np.concatenate(
            [np.arange(o, o + c) for o, c in zip(self.offs[mp], counts)]
        ) if len(mp) else np.empty(0, np.int64)
        rep_bid = self.bids[flat_idx]
        rows = np.stack(
            [
                np.concatenate([rep_bid, rep_bid]),
                np.concatenate(
                    [np.zeros(len(rep_bid), np.int64),
                     np.ones(len(rep_bid), np.int64)]
                ),
                np.concatenate([rep_doc, rep_gram]),
            ]
        )
        uniq = np.unique(rows, axis=1)  # local dedupe before the shuffle
        return pa.table(
            {
                "bench_id": pa.array(uniq[0], pa.int64()),
                "kind": pa.array(uniq[1], pa.int64()),
                "val": pa.array(uniq[2], pa.int64()),
            }
        )


def contamination_attribution(
    corpus: rd.Dataset,
    bench: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_NGRAM,
) -> rd.Dataset:
    """(bench_id, n_docs, n_shared_grams) per CONTAMINATED benchmark
    item: how many distinct corpus documents share ≥1 word k-gram
    with it, and how many of its distinct k-grams leak at all.
    Benchmark items with zero hits emit no row (the oracle's inner
    join).

    Plan: the benchmark side builds a driver-bounded CSR index
    gram → [bench ids] (eval sets are MBs) broadcast once; the corpus
    streams through a cached-task probe emitting locally-deduped
    (bench_id, kind, val) rows; ONE groupby(bench_id) counts
    distincts. Corpus text never shuffles."""
    parts: list[np.ndarray] = []
    for b in bench.iter_batches(batch_format="pyarrow", batch_size=4096):
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        di, gh = batch_gram_hashes(b.column(text_col), k)
        if len(di) == 0:
            continue
        pair = np.stack([gh, ids[di].astype(np.uint64)])
        parts.append(np.unique(pair, axis=1))
    empty = pa.table(
        {
            "bench_id": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "n_shared_grams": pa.array([], pa.int64()),
        }
    )
    if not parts:
        return rd.from_arrow(empty)
    allp = np.unique(np.concatenate(parts, axis=1), axis=1)
    grams_sorted = allp[0]  # unique-pair sort is gram-major already
    uniq_g, starts = np.unique(grams_sorted, return_index=True)
    offs = np.append(starts, len(grams_sorted)).astype(np.int64)
    idx_ref = ray.put(
        (uniq_g, offs, allp[1].view(np.int64))
    )
    from .taskcache import cached_stage

    tagged = corpus.map_batches(
        cached_stage(_AttributionProbe, idx_ref, id_col, text_col, k),
        batch_format="pyarrow",
    )

    def final(g: pa.Table) -> pa.Table:
        bid = int(g.column("bench_id")[0].as_py())
        kind = g.column("kind").to_numpy(zero_copy_only=False)
        val = g.column("val").to_numpy(zero_copy_only=False)
        n_docs = len(np.unique(val[kind == 0]))
        n_grams = len(np.unique(val[kind == 1]))
        return pa.table(
            {
                "bench_id": pa.array([bid], pa.int64()),
                "n_docs": pa.array([n_docs], pa.int64()),
                "n_shared_grams": pa.array([n_grams], pa.int64()),
            }
        )

    return tagged.groupby("bench_id").map_groups(
        final, batch_format="pyarrow"
    )
