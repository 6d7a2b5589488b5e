"""Distributed n-gram language-model estimation — corpus-wide word
bigram counts and conditional probabilities p(w2 | w1).

The perplexity gate stage (stages/perplexity.py) SCORES documents with
a model trained once per actor on a fixed synthetic corpus; this
operator is the TRAINING side at corpus scale — the "build the LM from
your own data" pass of a KenLM-style pipeline (count collection; the
reference has no analog, its checks are per-document).

ONE shuffle, partial-combined, context-complete by construction:

 - per batch: ONE canonical ``\\S+`` split (``tokens_with_doc_index``),
   bigrams formed positionally WITHIN each document (no cross-document
   bigrams), combined in-batch over the batch's unique (w1, w2)
   vocabulary (Zipf ⇒ partials ≪ token count);
 - partials are keyed by ``hash(w1) % n_parts`` — every bigram of a
   given CONTEXT word lands in one partition, so the per-partition
   pass computes exact context totals and ``p = n / total(w1)`` with
   no second shuffle and no broadcast. The division is one float64 op
   on exact int64 counts — bit-identical to the SQL oracle's.
 - ``min_count`` prunes the long tail AFTER totals are taken (the
   probabilities stay exact conditionals of the full distribution).

Python-call count is O(#partitions); everything per-partition is
Arrow ``group_by`` + numpy ``bincount`` over dictionary codes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .hashing import hash_str_arrow_u128
from .tokenize import tokens_with_doc_index

_LM_SCHEMA = pa.schema(
    [
        ("w1", pa.string()),
        ("w2", pa.string()),
        ("n", pa.int64()),
        ("p", pa.float64()),
    ]
)


def _batch_bigram_partials(
    arr: pa.Array | pa.ChunkedArray, n_parts: int
) -> pa.Table:
    """Per-batch (wpart, w1, w2, n) partial counts over the batch's
    unique bigram vocabulary."""
    empty = pa.table(
        {
            "wpart": pa.array([], pa.int64()),
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )
    doc_idx, denc = tokens_with_doc_index(arr)
    if denc is None or len(doc_idx) < 2:
        return empty
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    within = doc_idx[:-1] == doc_idx[1:]
    if not within.any():
        return empty
    c1, c2 = codes[:-1][within], codes[1:][within]
    v = len(denc.dictionary)
    pair, counts = np.unique(c1 * v + c2, return_counts=True)
    w1 = denc.dictionary.take(pa.array(pair // v, pa.int64()))
    w2 = denc.dictionary.take(pa.array(pair % v, pa.int64()))
    h, _ = hash_str_arrow_u128(w1)
    return pa.table(
        {
            "wpart": pa.array((h % np.uint64(n_parts)).astype(np.int64)),
            "w1": w1,
            "w2": w2,
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def _partition_lm(group: pa.Table, min_count: int) -> pa.Table:
    """One context partition: merge partials, take exact per-context
    totals, emit conditional probabilities, THEN prune."""
    if group.num_rows == 0:
        return _LM_SCHEMA.empty_table()
    g = group.group_by(["w1", "w2"]).aggregate([("n", "sum")])
    n = g.column("n_sum").to_numpy(zero_copy_only=False).astype(np.int64)
    w1 = g.column("w1")
    if isinstance(w1, pa.ChunkedArray):
        w1 = w1.combine_chunks()
    codes = w1.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    # exact int64 context totals (float bincount weights would round
    # past 2^53; the oracle's SUM is exact), then ONE float64 division
    totals = np.zeros(int(codes.max()) + 1, np.int64)
    np.add.at(totals, codes, n)
    p = n.astype(np.float64) / totals[codes].astype(np.float64)
    keep = n >= min_count
    return pa.table(
        {
            "w1": g.column("w1").filter(pa.array(keep)),
            "w2": g.column("w2").filter(pa.array(keep)),
            "n": pa.array(n[keep], pa.int64()),
            "p": pa.array(p[keep], pa.float64()),
        }
    )


def train_bigram_lm(
    ds: rd.Dataset,
    text_col: str = "text",
    min_count: int = 1,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(w1, w2, n, p) — corpus bigram counts and exact conditional
    probabilities, pruned to ``n >= min_count`` after totalling."""
    from ..partitioning import adaptive_partitions, parquet_rows_hint

    hint = parquet_rows_hint(ds)
    # partial rows are bounded by per-batch bigram vocabulary; ~40 B
    # per shuffled row (two short words + two ints)
    n_parts = num_partitions or adaptive_partitions(
        hint * 64 if hint else None, row_bytes=40
    )

    def partial(b: pa.Table) -> pa.Table:
        return _batch_bigram_partials(b.column(text_col), n_parts)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("wpart")
        .map_groups(
            lambda g: _partition_lm(g, min_count), batch_format="pyarrow"
        )
    )


# ---------------------------------------------------------------------------
# scoring: per-document negative log-likelihood under the trained LM —
# the "score the corpus with a model built FROM the corpus" loop of a
# perplexity-filter pipeline, exact end to end (the stages/perplexity.py
# gate scores with a FIXED per-actor model; this is the corpus-trained
# counterpart). Float discipline: every per-bigram term is floored to
# integer nano-log-units (functions/dsir.py's fixed-point trick, with
# math.log for DuckDB-ln bit parity), so per-doc sums are int64 and
# order-independent on both sides.
# ---------------------------------------------------------------------------

DEFAULT_FLOOR_P = 1e-9  # OOV / pruned-bigram probability floor
_FP = 1_000_000_000.0

_SEP = "\x1f"


def _bigram_keys(w1: pa.Array, w2: pa.Array) -> np.ndarray:
    """uint64 join key of a (w1, w2) pair — one vectorized hash of the
    separator-joined pair string (128-bit lane, first half; collision
    odds are the module-docstring birthday bound and a collision costs
    one bigram's probability, not a dedup decision)."""
    comb = pc.binary_join_element_wise(w1, w2, _SEP)
    h, _ = hash_str_arrow_u128(comb)
    return h


def score_bigram_lm(
    docs: rd.Dataset,
    lm: rd.Dataset | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    floor_p: float = DEFAULT_FLOOR_P,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(doc_id, n_bigrams, nll_fp): exact fixed-point negative
    log-likelihood of each document's bigrams under ``lm`` (trained on
    ``docs`` with ``min_count`` when not supplied; pruned/unseen
    bigrams take ``floor_p``). Docs with <2 tokens emit no row.

    No broadcast: the LM may be vocabulary²-large, so LM rows and
    per-(doc, bigram) count rows are co-partitioned by the bigram key
    hash in ONE shuffle; each partition probes with two sorted-array
    searchsorteds and emits per-doc partials, which a final (tiny)
    groupby(doc_id) sums."""
    import math

    from ray.data.aggregate import Sum as _Sum

    from .hashing import splitmix64_np
    from ..partitioning import adaptive_partitions, parquet_rows_hint

    if lm is None:
        lm = train_bigram_lm(docs, text_col=text_col, min_count=min_count)
    hint = parquet_rows_hint(docs)
    n_parts = num_partitions or adaptive_partitions(
        hint * 64 if hint else None, row_bytes=32
    )

    def lm_rows(b: pa.Table) -> pa.Table:
        key = _bigram_keys(
            b.column("w1").combine_chunks(), b.column("w2").combine_chunks()
        )
        return pa.table(
            {
                "part": pa.array(
                    (splitmix64_np(key) % n_parts).view(np.int64), pa.int64()
                ),
                "doc_id": pa.array(np.full(len(key), -1, np.int64), pa.int64()),
                "key": pa.array(key.view(np.int64), pa.int64()),
                "cnt": pa.array(np.zeros(len(key), np.int64), pa.int64()),
                "p": b.column("p"),
            }
        )

    def doc_rows(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "part": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "key": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "p": pa.array([], pa.float64()),
            }
        )
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and int(ids.min()) < 0:
            # -1 is the LM-row sentinel in the co-partitioned union; a
            # negative real id would be silently misclassified as LM
            # rows (and its NaN p would poison other docs' lookups)
            raise ValueError(
                "score_bigram_lm requires non-negative document ids"
            )
        doc_idx, denc = tokens_with_doc_index(b.column(text_col))
        if denc is None or len(doc_idx) < 2:
            return empty
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        within = doc_idx[:-1] == doc_idx[1:]
        if not within.any():
            return empty
        d = doc_idx[:-1][within]
        c1, c2 = codes[:-1][within], codes[1:][within]
        # per-(doc, bigram) combine: lexsort + run-length (no packing
        # overflow concerns at any vocabulary size)
        order = np.lexsort((c2, c1, d))
        d, c1, c2 = d[order], c1[order], c2[order]
        new = np.empty(len(d), dtype=bool)
        new[0] = True
        new[1:] = (d[1:] != d[:-1]) | (c1[1:] != c1[:-1]) | (c2[1:] != c2[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(d))).astype(np.int64)
        ud, uc1, uc2 = d[starts], c1[starts], c2[starts]
        w1 = denc.dictionary.take(pa.array(uc1, pa.int64()))
        w2 = denc.dictionary.take(pa.array(uc2, pa.int64()))
        key = _bigram_keys(w1, w2)
        return pa.table(
            {
                "part": pa.array(
                    (splitmix64_np(key) % n_parts).view(np.int64), pa.int64()
                ),
                "doc_id": pa.array(ids[ud], pa.int64()),
                "key": pa.array(key.view(np.int64), pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
                "p": pa.array(np.full(len(key), np.nan), pa.float64()),
            }
        )

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "nll_fp": pa.array([], pa.int64()),
            }
        )
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        cnt = g.column("cnt").to_numpy(zero_copy_only=False)
        pv = g.column("p").to_numpy(zero_copy_only=False)
        is_lm = did == -1
        dk, dd, dc = key[~is_lm], did[~is_lm], cnt[~is_lm]
        if len(dk) == 0:
            return empty
        lk, lp = key[is_lm], pv[is_lm]
        order = np.argsort(lk)
        lk, lp = lk[order], lp[order]
        pos = np.searchsorted(lk, dk)
        safe = np.minimum(pos, max(len(lk) - 1, 0))
        found = (pos < len(lk)) & (lk[safe] == dk) if len(lk) else (
            np.zeros(len(dk), bool)
        )
        p = np.where(found, lp[safe] if len(lk) else floor_p, floor_p)
        # math.log over the partition's DISTINCT probabilities — the
        # CPython-libm == DuckDB-ln bit-parity path
        uniq, inv = np.unique(p, return_inverse=True)
        logs = np.array([math.log(v) for v in uniq], np.float64)
        term = np.floor((-logs[inv]) * _FP).astype(np.int64)
        # per-doc partials within the partition
        udoc, dinv = np.unique(dd, return_inverse=True)
        nb = np.zeros(len(udoc), np.int64)
        fp = np.zeros(len(udoc), np.int64)
        np.add.at(nb, dinv, dc)
        np.add.at(fp, dinv, term * dc)
        return pa.table(
            {
                "doc_id": pa.array(udoc, pa.int64()),
                "n_bigrams": pa.array(nb, pa.int64()),
                "nll_fp": pa.array(fp, pa.int64()),
            }
        )

    union = lm.map_batches(lm_rows, batch_format="pyarrow").union(
        docs.map_batches(doc_rows, batch_format="pyarrow")
    )
    partials = union.groupby("part").map_groups(resolve, batch_format="pyarrow")
    return partials.groupby("doc_id").aggregate(
        _Sum("n_bigrams", alias_name="n_bigrams"),
        _Sum("nll_fp", alias_name="nll_fp"),
    )


def score_bigram_lm_pair(
    docs: rd.Dataset,
    lm_a: rd.Dataset,
    lm_b: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    floor_p: float = DEFAULT_FLOOR_P,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(doc_id, n_bigrams, nll_a_fp, nll_b_fp): every document scored
    under TWO LMs in ONE co-partitioned pass — the corpus is
    tokenized and shuffled once instead of twice, for consumers that
    need both scores per doc (Moore-Lewis contrastive selection).
    Same exact fixed-point discipline as :func:`score_bigram_lm`."""
    import math

    from ray.data.aggregate import Sum as _Sum

    from .hashing import splitmix64_np
    from ..partitioning import adaptive_partitions, parquet_rows_hint

    hint = parquet_rows_hint(docs)
    n_parts = num_partitions or adaptive_partitions(
        hint * 64 if hint else None, row_bytes=32
    )

    def lm_rows(src: int):
        def fn(b: pa.Table) -> pa.Table:
            key = _bigram_keys(
                b.column("w1").combine_chunks(),
                b.column("w2").combine_chunks(),
            )
            return pa.table(
                {
                    "part": pa.array(
                        (splitmix64_np(key) % n_parts).view(np.int64),
                        pa.int64(),
                    ),
                    "src": pa.array(np.full(len(key), src, np.int64)),
                    "doc_id": pa.array(
                        np.full(len(key), -1, np.int64), pa.int64()
                    ),
                    "key": pa.array(key.view(np.int64), pa.int64()),
                    "cnt": pa.array(np.zeros(len(key), np.int64), pa.int64()),
                    "p": b.column("p"),
                }
            )

        return fn

    def doc_rows(b: pa.Table) -> pa.Table:
        from .tokenize import tokens_with_doc_index

        empty = pa.table(
            {
                "part": pa.array([], pa.int64()),
                "src": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "key": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "p": pa.array([], pa.float64()),
            }
        )
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and int(ids.min()) < 0:
            raise ValueError(
                "score_bigram_lm_pair requires non-negative document ids"
            )
        doc_idx, denc = tokens_with_doc_index(b.column(text_col))
        if denc is None or len(doc_idx) < 2:
            return empty
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        within = doc_idx[:-1] == doc_idx[1:]
        if not within.any():
            return empty
        d = doc_idx[:-1][within]
        c1, c2 = codes[:-1][within], codes[1:][within]
        order = np.lexsort((c2, c1, d))
        d, c1, c2 = d[order], c1[order], c2[order]
        new = np.empty(len(d), dtype=bool)
        new[0] = True
        new[1:] = (d[1:] != d[:-1]) | (c1[1:] != c1[:-1]) | (c2[1:] != c2[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(d))).astype(np.int64)
        ud, uc1, uc2 = d[starts], c1[starts], c2[starts]
        w1 = denc.dictionary.take(pa.array(uc1, pa.int64()))
        w2 = denc.dictionary.take(pa.array(uc2, pa.int64()))
        key = _bigram_keys(w1, w2)
        return pa.table(
            {
                "part": pa.array(
                    (splitmix64_np(key) % n_parts).view(np.int64), pa.int64()
                ),
                "src": pa.array(np.zeros(len(key), np.int64)),
                "doc_id": pa.array(ids[ud], pa.int64()),
                "key": pa.array(key.view(np.int64), pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
                "p": pa.array(np.full(len(key), np.nan), pa.float64()),
            }
        )

    def resolve(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "nll_a_fp": pa.array([], pa.int64()),
                "nll_b_fp": pa.array([], pa.int64()),
            }
        )
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        src = g.column("src").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        cnt = g.column("cnt").to_numpy(zero_copy_only=False)
        pv = g.column("p").to_numpy(zero_copy_only=False)
        is_doc = src == 0
        dk, dd, dc = key[is_doc], did[is_doc], cnt[is_doc]
        if len(dk) == 0:
            return empty

        def probe(tag: int) -> np.ndarray:
            m = src == tag
            lk, lp = key[m], pv[m]
            order = np.argsort(lk)
            lk, lp = lk[order], lp[order]
            if len(lk) == 0:
                return np.full(len(dk), floor_p)
            pos = np.searchsorted(lk, dk)
            safe = np.minimum(pos, len(lk) - 1)
            found = (pos < len(lk)) & (lk[safe] == dk)
            return np.where(found, lp[safe], floor_p)

        udoc, dinv = np.unique(dd, return_inverse=True)
        nb = np.zeros(len(udoc), np.int64)
        np.add.at(nb, dinv, dc)
        cols = {
            "doc_id": pa.array(udoc, pa.int64()),
            "n_bigrams": pa.array(nb, pa.int64()),
        }
        for name, tag in (("nll_a_fp", 1), ("nll_b_fp", 2)):
            p = probe(tag)
            uniq, inv = np.unique(p, return_inverse=True)
            logs = np.array([math.log(v) for v in uniq], np.float64)
            term = np.floor((-logs[inv]) * _FP).astype(np.int64)
            fp = np.zeros(len(udoc), np.int64)
            np.add.at(fp, dinv, term * dc)
            cols[name] = pa.array(fp, pa.int64())
        return pa.table(cols)

    union = (
        lm_a.map_batches(lm_rows(1), batch_format="pyarrow")
        .union(lm_b.map_batches(lm_rows(2), batch_format="pyarrow"))
        .union(docs.map_batches(doc_rows, batch_format="pyarrow"))
    )
    partials = union.groupby("part").map_groups(
        resolve, batch_format="pyarrow"
    )
    return partials.groupby("doc_id").aggregate(
        _Sum("n_bigrams", alias_name="n_bigrams"),
        _Sum("nll_a_fp", alias_name="nll_a_fp"),
        _Sum("nll_b_fp", alias_name="nll_b_fp"),
    )
