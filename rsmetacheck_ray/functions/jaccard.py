"""Exact n-gram Jaccard near-dup pairs — rare-gram candidate
generation plus an exact set-overlap verification stage.

The sketch families (MinHash, SimHash) ESTIMATE Jaccard; this operator
computes it exactly, completing the dedup family's exact/approximate
matrix (SURVEY §2 beyond-reference ops; the reference's only dedup is
the byte-identity check in ``utils/pitfall_utils.py:21-37``).

Two stages, both bounded by construction:

1. **Candidate generation by RARE grams** (the suffix-array/rare-n-gram
   pruning idea): a gram shared by ≤ ``max_df`` documents names at most
   ``max_df·(max_df−1)/2`` pairs, so pair expansion per gram is O(1) —
   no hot-bucket cap needed, unlike LSH buckets. The only shuffle ships
   the 24-byte ``(gram, doc_id, part)`` projection onto a size-adaptive
   hashed GRAM partition; each partition emits its pairs in one lexsort
   + per-length vectorized triangle expansion (Python loop count =
   O(max_df), not O(#grams)). Two documents are candidates iff they
   share ≥1 rare gram — a document pair sharing only boilerplate grams
   (df > max_df) is invisible, which is exactly the pruning contract.

2. **Exact verification over the candidate closure**: candidate doc
   ids (bounded by 2×#pairs) are collected, their full distinct-gram
   sets recomputed in one filtered corpus pass, left in the OBJECT
   STORE as Arrow blocks (``materialize`` + ``to_arrow_refs`` — the
   ``embedding_near_dup_pairs`` discipline, nothing streams through
   the driver), and fetched once per verify actor. The whole batch of
   pairs verifies in one vectorized pass (expand → lexsort → adjacent-
   duplicate count; zero Python-per-pair) and
   ``J = n_common / (n_a + n_b − n_common)`` — one float64 division of
   exact int64 counts, bit-identical to the SQL oracle's. A pair side
   with no gram set (doc under k words) contributes size 0 (J = 0).

Gram identity is the shared uint64 gram hash of
``functions/decontaminate.batch_gram_hashes`` (memoized word hashes →
rotate-xor window combine → splitmix finalize): hash-set Jaccard
equals string-set Jaccard up to ~2⁻⁶⁴ collisions, the same parity
contract the decontamination oracle relies on.

Scale note: the verification state is bounded by the CANDIDATE set,
not the corpus — at 100 TB the rare-gram prefilter is what keeps that
set small; ``max_df`` trades recall (pairs hiding behind common grams)
against candidate volume.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .decontaminate import batch_gram_hashes
from .hashing import splitmix64_np

DEFAULT_K = 5
DEFAULT_MAX_DF = 8

_PAIRS_SCHEMA = pa.schema(
    [("doc_id_a", pa.int64()), ("doc_id_b", pa.int64())]
)
_VERIFIED_SCHEMA = pa.schema(
    [
        ("doc_id_a", pa.int64()),
        ("doc_id_b", pa.int64()),
        ("n_common", pa.int64()),
        ("n_a", pa.int64()),
        ("n_b", pa.int64()),
        ("jaccard", pa.float64()),
    ]
)


def _distinct_doc_grams(
    batch: pa.Table, text_col: str, id_col: str, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_id, gram_hash) pairs, DISTINCT per document, for a batch.
    Rows arrive lexsorted by (doc, gram). A document's text lives in
    exactly one row of one batch, so per-batch distinct is global
    distinct."""
    ids = pc.cast(batch.column(id_col), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    di, gh = batch_gram_hashes(batch.column(text_col), k)
    if len(di) == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    order = np.lexsort((gh, di))
    di, gh = di[order], gh[order]
    first = np.empty(len(di), dtype=bool)
    first[0] = True
    first[1:] = (di[1:] != di[:-1]) | (gh[1:] != gh[:-1])
    return ids[di[first]], gh[first]


def _rare_pairs_part(group: pa.Table, max_df: int) -> pa.Table:
    """One hashed GRAM partition: segment the lexsorted (gram, doc)
    rows by gram, keep segments with 2 ≤ df ≤ max_df, expand each to
    its doc pairs — vectorized per segment LENGTH (docs are ascending
    within a segment, so emitted pairs satisfy a < b)."""
    g = group.column("gram").to_numpy(zero_copy_only=False)
    d = group.column("doc_id").to_numpy(zero_copy_only=False)
    n = len(g)
    if n == 0:
        return _PAIRS_SCHEMA.empty_table()
    order = np.lexsort((d, g))
    g, d = g[order], d[order]
    starts = np.nonzero(np.concatenate([[True], g[1:] != g[:-1]]))[0]
    lens = np.diff(np.append(starts, n))
    a_out: list[np.ndarray] = []
    b_out: list[np.ndarray] = []
    for m in range(2, max_df + 1):
        s_m = starts[lens == m]
        if len(s_m) == 0:
            continue
        # (S, m) doc matrix for every df==m segment, all pairs at once
        docs = d[s_m[:, None] + np.arange(m)[None, :]]
        ai, bj = np.triu_indices(m, 1)
        a_out.append(docs[:, ai].reshape(-1))
        b_out.append(docs[:, bj].reshape(-1))
    if not a_out:
        return _PAIRS_SCHEMA.empty_table()
    return pa.table(
        {
            "doc_id_a": pa.array(np.concatenate(a_out), pa.int64()),
            "doc_id_b": pa.array(np.concatenate(b_out), pa.int64()),
        }
    )


def rare_gram_candidate_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    max_df: int = DEFAULT_MAX_DF,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """DISTINCT document pairs (a < b) sharing at least one word
    k-gram that appears in ≤ ``max_df`` documents, with the shared
    rare-gram count per pair (``n_shared_rare``)."""
    from ..partitioning import adaptive_partitions, parquet_rows_hint

    if num_partitions:
        n_parts = num_partitions
    else:
        hint = parquet_rows_hint(ds)
        # ~96 distinct grams per ~100-token doc, 24 B shuffled rows
        n_parts = adaptive_partitions(
            hint * 96 if hint else None, row_bytes=24
        )

    def gram_rows(b: pa.Table) -> pa.Table:
        ids, gh = _distinct_doc_grams(b, text_col, id_col, k)
        part = (splitmix64_np(gh) % n_parts).astype(np.int64)
        return pa.table(
            {
                "gram": pa.array(gh.view(np.int64), pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "gpart": pa.array(part, pa.int64()),
            }
        )

    pairs = (
        ds.map_batches(gram_rows, batch_format="pyarrow")
        .groupby("gpart")
        .map_groups(
            lambda grp: _rare_pairs_part(grp, max_df),
            batch_format="pyarrow",
        )
    )
    # a pair can share several rare grams (usually in different gram
    # partitions): global distinct, counting the shared rare grams
    from ray.data.aggregate import Count

    return pairs.groupby(["doc_id_a", "doc_id_b"]).aggregate(
        Count(alias_name="n_shared_rare")
    )


class _GramSetStage:
    """Corpus pass restricted to the candidate docs: emits each one's
    sorted distinct gram-hash set as a binary cell. Candidate-id array
    fetched from the object store once per worker process (cached
    tasks, taskcache.py)."""

    def __init__(self, ids_ref, text_col: str, id_col: str, k: int):
        self.cand = ray.get(ids_ref)  # sorted int64
        self.text_col, self.id_col, self.k = text_col, id_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "grams": pa.array([], pa.binary()),
            }
        )
        if len(batch) == 0 or len(self.cand) == 0:
            return empty
        ids = pc.cast(batch.column(self.id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        pos = np.searchsorted(self.cand, ids)
        member = self.cand[np.minimum(pos, len(self.cand) - 1)] == ids
        if not member.any():
            return empty
        sub = batch.filter(pa.array(member))
        di, gh = _distinct_doc_grams(sub, self.text_col, self.id_col, self.k)
        if len(di) == 0:
            return empty
        # rows are sorted by (doc, gram): slice each doc's sorted set
        starts = np.nonzero(np.concatenate([[True], di[1:] != di[:-1]]))[0]
        ends = np.append(starts[1:], len(di))
        return pa.table(
            {
                "doc_id": pa.array(di[starts], pa.int64()),
                "grams": pa.array(
                    [gh[s:e].tobytes() for s, e in zip(starts, ends)],
                    pa.binary(),
                ),
            }
        )


class _VerifyStage:
    """Exact Jaccard per candidate pair — an ACTOR POOL, because it
    holds every candidate doc's gram set (``concurrency`` bounds the
    replication; a per-task-worker cache would copy it to every core).

    State is a FLAT layout (one uint64 gram array + per-doc
    start/len indexed by a sorted doc-id array), and the whole batch
    verifies with ZERO Python-per-pair: both sides expand to
    (pair_idx, gram) rows (sets are slices of the flat array, gathered
    with one repeat/arange indexing pass), one lexsort groups them,
    and ``n_common`` is the per-pair count of adjacent duplicates — a
    (pair, gram) row can appear at most twice since each side's set is
    distinct. Batch expansion memory is bounded by the verify stage's
    ``batch_size`` × mean set size."""

    def __init__(self, set_refs):
        ids_parts: list[np.ndarray] = []
        len_parts: list[np.ndarray] = []
        blobs: list[bytes] = []
        for t in ray.get(list(set_refs)):
            if t.num_rows == 0:
                continue
            ids_parts.append(
                t.column("doc_id").to_numpy(zero_copy_only=False)
            )
            part = t.column("grams").to_pylist()
            blobs.extend(part)
            len_parts.append(
                np.fromiter((len(x) // 8 for x in part), np.int64, len(part))
            )
        if not ids_parts:
            self.doc_ids = np.empty(0, np.int64)
            self.starts = np.empty(0, np.int64)
            self.lens = np.empty(0, np.int64)
            self.flat = np.empty(0, np.uint64)
            return
        ids = np.concatenate(ids_parts).astype(np.int64)
        lens = np.concatenate(len_parts)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        order = np.argsort(ids)
        self.doc_ids = ids[order]
        self.starts = starts[order]
        self.lens = lens[order]
        self.flat = np.frombuffer(b"".join(blobs), dtype=np.uint64)

    def _lookup(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(start, len) per key; docs with no gram set get len 0."""
        if len(self.doc_ids) == 0:
            z = np.zeros(len(keys), np.int64)
            return z, z.copy()
        pos = np.minimum(
            np.searchsorted(self.doc_ids, keys), len(self.doc_ids) - 1
        )
        found = self.doc_ids[pos] == keys
        zero = np.int64(0)
        return (
            np.where(found, self.starts[pos], zero),
            np.where(found, self.lens[pos], zero),
        )

    def _expand(self, starts, lens) -> tuple[np.ndarray, np.ndarray]:
        """(pair_idx, gram) rows for one side of the whole batch."""
        tot = int(lens.sum())
        if tot == 0:
            return np.empty(0, np.int64), np.empty(0, np.uint64)
        pair_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        cum = np.cumsum(lens) - lens
        offs = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(cum, lens)
            + np.repeat(starts, lens)
        )
        return pair_idx, self.flat[offs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = pc.cast(batch.column("doc_id_a"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = pc.cast(batch.column("doc_id_b"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n = len(a)
        sa, n_a = self._lookup(a)
        sb, n_b = self._lookup(b)
        pi_a, g_a = self._expand(sa, n_a)
        pi_b, g_b = self._expand(sb, n_b)
        pi = np.concatenate([pi_a, pi_b])
        g = np.concatenate([g_a, g_b])
        order = np.lexsort((g, pi))
        pi, g = pi[order], g[order]
        dup = (pi[1:] == pi[:-1]) & (g[1:] == g[:-1])
        n_common = np.bincount(pi[1:][dup], minlength=n).astype(np.int64)
        union = np.maximum(n_a + n_b - n_common, 1)
        return pa.table(
            {
                "doc_id_a": pa.array(a, pa.int64()),
                "doc_id_b": pa.array(b, pa.int64()),
                "n_common": pa.array(n_common, pa.int64()),
                "n_a": pa.array(n_a, pa.int64()),
                "n_b": pa.array(n_b, pa.int64()),
                "jaccard": pa.array(
                    n_common.astype(np.float64) / union.astype(np.float64),
                    pa.float64(),
                ),
            }
        )


def jaccard_verify_pairs(
    ds: rd.Dataset,
    pairs: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    min_jaccard: float | None = None,
    concurrency: tuple[int, int] | int = (1, 8),
) -> rd.Dataset:
    """Exact k-gram Jaccard for every pair in ``pairs`` (columns
    ``doc_id_a``/``doc_id_b``). Verification state is bounded by the
    candidate docs, not the corpus; ``concurrency`` bounds how many
    verify actors replicate it (the gram-set SCAN runs as cached
    tasks and auto-scales)."""
    pairs = pairs.materialize()  # consumed twice: id scan + verify
    id_parts: list[np.ndarray] = []
    for b in pairs.iter_batches(batch_format="pyarrow", batch_size=65536):
        both = np.concatenate(
            [
                b.column("doc_id_a").to_numpy(zero_copy_only=False),
                b.column("doc_id_b").to_numpy(zero_copy_only=False),
            ]
        )
        if len(both):
            id_parts.append(np.unique(both))
    if not id_parts:
        return rd.from_arrow(_VERIFIED_SCHEMA.empty_table())
    cand = np.unique(np.concatenate(id_parts)).astype(np.int64)
    from .taskcache import cached_stage

    ids_ref = ray.put(cand)
    set_refs = (
        ds.map_batches(
            cached_stage(_GramSetStage, ids_ref, text_col, id_col, k),
            batch_format="pyarrow",
        )
        .materialize()
        .to_arrow_refs()
    )
    # the verify dict covers EVERY candidate doc's gram set — state too
    # heavy to replicate to every task worker, so this stage stays an
    # ACTOR POOL: ``concurrency`` bounds how many workers hold it.
    # Batch size fills the POOL, not one actor: a small candidate set
    # (≤ the 8192 expansion cap) would otherwise verify as ONE batch
    # on one actor while the rest idle; pairs is materialized, so
    # count() is free metadata.
    max_actors = (
        concurrency[1] if isinstance(concurrency, tuple) else concurrency
    )
    batch_size = int(
        max(256, min(8192, -(-pairs.count() // (2 * max_actors))))
    )
    out = pairs.map_batches(
        _VerifyStage,
        fn_constructor_args=(tuple(set_refs),),
        batch_format="pyarrow",
        # 8192 cap bounds the (pair, gram) expansion buffer: 8k pairs
        # × ~200 grams × 16 B ≈ 25 MB per in-flight batch
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if min_jaccard is not None:
        thr = float(min_jaccard)
        out = out.map_batches(
            lambda t: t.filter(
                pc.greater_equal(t.column("jaccard"), thr)
            ),
            batch_format="pyarrow",
        )
    return out


def ngram_containment_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    max_df: int = DEFAULT_MAX_DF,
    min_containment: float = 0.8,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """ASYMMETRIC n-gram containment pairs — C = |A∩B| / min(|A|,|B|)
    ≥ ``min_containment``: the quote / inclusion detector. A short
    page embedded verbatim inside a long one has containment 1.0 but
    Jaccard |A|/|B| ≪ threshold (the union term dilutes it), so the
    symmetric operator structurally misses exactly the pairs this one
    exists for. Same two bounded stages as ``ngram_jaccard_pairs``
    (rare-gram candidates, exact set-overlap verify); the threshold is
    an exact INTEGER comparison (n_common·1000 ≥ τ‰·min) so the
    decision is bit-identical to the SQL oracle's, and the reported
    float is one division of exact int64 counts."""
    thr_millis = int(round(min_containment * 1000))
    cand = rare_gram_candidate_pairs(
        ds, text_col, id_col, k, max_df, num_partitions
    ).drop_columns(["n_shared_rare"])
    verified = jaccard_verify_pairs(
        ds, cand, text_col, id_col, k, min_jaccard=None
    )

    def attach(t: pa.Table) -> pa.Table:
        ncom = t.column("n_common").to_numpy(zero_copy_only=False)
        na = t.column("n_a").to_numpy(zero_copy_only=False)
        nb = t.column("n_b").to_numpy(zero_copy_only=False)
        mn = np.minimum(na, nb)
        keep = (mn > 0) & (ncom * 1000 >= thr_millis * mn)
        idx = np.flatnonzero(keep)
        take = pa.array(idx, pa.int64())
        return pa.table(
            {
                "doc_id_a": t.column("doc_id_a").take(take),
                "doc_id_b": t.column("doc_id_b").take(take),
                "n_common": pa.array(ncom[idx], pa.int64()),
                "n_a": pa.array(na[idx], pa.int64()),
                "n_b": pa.array(nb[idx], pa.int64()),
                "containment": pa.array(
                    ncom[idx].astype(np.float64) / mn[idx].astype(np.float64),
                    pa.float64(),
                ),
            }
        )

    return verified.map_batches(attach, batch_format="pyarrow")


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    max_df: int = DEFAULT_MAX_DF,
    min_jaccard: float = 0.5,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """End-to-end exact n-gram Jaccard near-dup search: rare-gram
    candidates → exact verification → threshold filter."""
    cand = rare_gram_candidate_pairs(
        ds, text_col, id_col, k, max_df, num_partitions
    ).drop_columns(["n_shared_rare"])
    return jaccard_verify_pairs(
        ds, cand, text_col, id_col, k, min_jaccard=min_jaccard
    )
