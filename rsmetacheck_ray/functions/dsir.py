"""DSIR-style data-selection importance weights (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): score
every document by how much more likely its unigrams are under a
TARGET distribution (e.g. the English slice, a curated domain) than
under the RAW corpus distribution. The resampling step that follows
(keep the top quantile / sample ∝ weight) is `sampling.py` /
`mixture_sample` composition; this operator produces the weights.

Semantics (frozen, SQL-differential oracle ``importance_weights``):

 - token        = canonical whitespace token (``tokenize.WS_TOKEN_RE``)
 - c_r / c_t    = corpus-wide occurrence counts of the token over the
                  raw corpus / the target slice
 - V, N_r, N_t  = raw vocabulary size, total raw / target occurrences
 - term(tok)    = (ln(c_t+1) − ln(N_t+V)) − (ln(c_r+1) − ln(N_r+V))
                  — add-one-smoothed log likelihood ratio
 - log_weight   = Σ over the document's token OCCURRENCES of term(tok)

**Float discipline — the fixed-point sum trick.** A per-document sum
of float64 terms is summation-order-dependent (DuckDB's group SUM and
numpy's pairwise reduce associate differently), so the engine and the
oracle could disagree in the last ulps. Each term is therefore
quantized ONCE to integer nano-log-units — ``term_fp =
floor(term · 1e9)`` (floor, not round: round ties break differently
across engines) — and the per-document sum is an INTEGER sum,
order-independent and exact on both sides. ``ln`` itself is computed
with ``math.log`` over the few DISTINCT count values (bit-identical
to DuckDB's ``ln``, same libm; numpy's SIMD log is ≤1 ulp off — the
``tfidf.py`` discipline). Bound: |term| < 100 log-units ⇒ int64 holds
documents up to ~9·10¹⁶ nano-units ≈ 10⁹ tokens/doc.

Scale shape (100 TB discipline): two corpus passes, size-gated like
``tfidf.py``'s join plan:

 1. **count pass** (partial-combined): per batch one dictionary
    encode + bincount collapses occurrences to per-batch (token,
    n_raw, n_tgt) partials; the global ``groupby(token).sum`` ships
    partials only. V / N_r / N_t come from streaming aggregates over
    the counts table, never from a driver materialization of it.
 2. **score pass**:
    - *broadcast* (vocab ≤ ``broadcast_max_terms``): the sorted
      (token, term_fp) arrays ride the object store once; each batch
      scores its own documents (a document is one row) — no shuffle.
    - *shuffle* (web-scale vocabularies): per-(doc, token) count rows
      and model rows union with a side tag, ONE hashed-token partition
      joins them and pre-combines per-document partials, then ONE
      ``groupby(doc_id)`` sums ≤ n_parts partial rows per document.
    Zero-token documents enter through a 1-row-per-doc union so both
    paths emit every input document. Paths pinned identical by pytest.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .tokenize import tokens_with_doc_index

FP_SCALE = 1_000_000_000.0  # nano-log-units
BROADCAST_MAX_TERMS = 4_000_000  # ~24 B/term ⇒ ≈100 MB object payload

_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("log_weight_fp", pa.int64()),
        ("log_weight", pa.float64()),
    ]
)


def _ln_lut(values: np.ndarray) -> np.ndarray:
    """math.log over the DISTINCT int values, gathered — bit-identical
    to DuckDB ln(CAST(x AS DOUBLE))."""
    uniq, inv = np.unique(values, return_inverse=True)
    lut = np.array([math.log(int(v)) for v in uniq], dtype=np.float64)
    return lut[inv]


def _term_fp(
    c_t: np.ndarray, c_r: np.ndarray, v: int, n_t: int, n_r: int
) -> np.ndarray:
    """floor(term · 1e9) as int64 with the exact SQL association:
    (ln(c_t+1) − ln(N_t+V)) − (ln(c_r+1) − ln(N_r+V))."""
    ln_ntv = math.log(n_t + v)
    ln_nrv = math.log(n_r + v)
    term = (_ln_lut(c_t + 1) - ln_ntv) - (_ln_lut(c_r + 1) - ln_nrv)
    return np.floor(term * FP_SCALE).astype(np.int64)


def _batch_counts(
    b: pa.Table, text_col: str, target_col: str
) -> pa.Table:
    """Per-batch (token, n_raw, n_tgt) occurrence partials — one
    dictionary encode + two bincounts, no Python per token."""
    empty = pa.table(
        {
            "token": pa.array([], pa.string()),
            "n_raw": pa.array([], pa.int64()),
            "n_tgt": pa.array([], pa.int64()),
        }
    )
    doc_idx, denc = tokens_with_doc_index(b.column(text_col))
    if denc is None:
        return empty
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    tgt = (
        pc.fill_null(pc.cast(b.column(target_col), pa.bool_()), False)
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )
    nv = len(denc.dictionary)
    n_raw = np.bincount(codes, minlength=nv)
    n_tgt = np.bincount(codes[tgt[doc_idx]], minlength=nv)
    return pa.table(
        {
            "token": pc.cast(denc.dictionary, pa.string()),
            "n_raw": pa.array(n_raw.astype(np.int64)),
            "n_tgt": pa.array(n_tgt.astype(np.int64)),
        }
    )


def _doc_sums(
    ids: np.ndarray, doc_idx: np.ndarray, fp_per_occ: np.ndarray
) -> pa.Table:
    """Exact int64 per-document sums over the occurrence stream
    (doc_idx is doc-ordered: segment reduceat, zero-fill absent docs)."""
    n_docs = len(ids)
    n_tok = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    wfp = np.zeros(n_docs, dtype=np.int64)
    if len(doc_idx):
        starts = np.flatnonzero(
            np.concatenate(([True], doc_idx[1:] != doc_idx[:-1]))
        )
        segs = np.add.reduceat(fp_per_occ, starts)
        wfp[doc_idx[starts]] = segs
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok),
            "log_weight_fp": pa.array(wfp),
            "log_weight": pa.array(wfp / FP_SCALE, pa.float64()),
        }
    )


class _BroadcastScoreStage:
    """Score documents against the (sorted token, term_fp) model
    fetched once per worker (cached via taskcache)."""

    def __init__(self, model_ref, text_col, id_col):
        self.tokens, self.fps = ray.get(model_ref)
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        ids = pc.cast(b.column(self.id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        doc_idx, denc = tokens_with_doc_index(b.column(self.text_col))
        if denc is None:
            return _doc_sums(ids, np.empty(0, np.int64), np.empty(0, np.int64))
        vocab = denc.dictionary.to_numpy(zero_copy_only=False)
        pos = np.minimum(
            np.searchsorted(self.tokens, vocab), max(len(self.tokens) - 1, 0)
        )
        found = (
            self.tokens[pos] == vocab
            if len(self.tokens)
            else np.zeros(len(vocab), bool)
        )
        fp_by_code = np.where(found, self.fps[pos], 0).astype(np.int64)
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        return _doc_sums(ids, doc_idx, fp_by_code[codes])


def dsir_weights(
    ds: rd.Dataset,
    target_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_max_terms: int = BROADCAST_MAX_TERMS,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(doc_id, n_tokens, log_weight_fp, log_weight) per document.
    ``target_col`` is a boolean column marking the target slice (null
    ⇒ false)."""
    from ray.data.aggregate import Sum

    from ..partitioning import adaptive_partitions, parquet_rows_hint
    from .taskcache import cached_stage

    counts = (
        ds.map_batches(
            lambda b: _batch_counts(b, text_col, target_col),
            batch_format="pyarrow",
        )
        .groupby("token")
        .aggregate(Sum("n_raw", alias_name="n_raw"), Sum("n_tgt", alias_name="n_tgt"))
        .materialize()
    )
    v = counts.count()
    if v == 0:
        # token-free corpus: every doc scores 0
        return ds.map_batches(
            lambda b: _doc_sums(
                pc.cast(b.column(id_col), pa.int64()).to_numpy(
                    zero_copy_only=False
                ),
                np.empty(0, np.int64),
                np.empty(0, np.int64),
            ),
            batch_format="pyarrow",
        )
    totals = counts.aggregate(Sum("n_raw"), Sum("n_tgt"))
    n_r, n_t = int(totals["sum(n_raw)"]), int(totals["sum(n_tgt)"])

    def to_model(b: pa.Table) -> pa.Table:
        fp = _term_fp(
            b.column("n_tgt").to_numpy(zero_copy_only=False),
            b.column("n_raw").to_numpy(zero_copy_only=False),
            v,
            n_t,
            n_r,
        )
        return pa.table({"token": b.column("token"), "term_fp": pa.array(fp)})

    model = counts.map_batches(to_model, batch_format="pyarrow")

    if v <= broadcast_max_terms:
        parts = [
            (
                blk.column("token").to_numpy(zero_copy_only=False),
                blk.column("term_fp").to_numpy(zero_copy_only=False),
            )
            for blk in model.iter_batches(batch_format="pyarrow")
            if blk.num_rows
        ]
        tokens = np.concatenate([p[0] for p in parts])
        fps = np.concatenate([p[1] for p in parts]).astype(np.int64)
        order = np.argsort(tokens)
        model_ref = ray.put((tokens[order], fps[order]))
        return ds.map_batches(
            cached_stage(_BroadcastScoreStage, model_ref, text_col, id_col),
            batch_format="pyarrow",
        )

    # --- shuffle plan: token-keyed join with per-partition per-doc ---
    # --- pre-combine, then one groupby(doc_id) over partial rows   ---
    # ~40-60 per-(doc, token) rows per document enter the shuffle —
    # adaptive_partitions' contract wants the POST-fan-out row count
    n_parts = num_partitions or adaptive_partitions(
        (parquet_rows_hint(ds) or 0) * 48 or None, row_bytes=48
    )
    from .hashing import token_partitions

    def _token_parts(tokens: np.ndarray) -> np.ndarray:
        return token_partitions(tokens, n_parts)

    def tf_rows(b: pa.Table) -> pa.Table:
        """Per-(doc, token) occurrence counts, side 0 — the same
        collapse as tfidf's _batch_tf but keeping the count."""
        ids = pc.cast(b.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        doc_idx, denc = tokens_with_doc_index(b.column(text_col))
        if denc is None:
            return pa.table(
                {
                    "tpart": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((codes, doc_idx))
        d, c = doc_idx[order], codes[order]
        first = np.empty(len(d), dtype=bool)
        first[0] = True
        first[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(d))).astype(np.int64)
        vocab = denc.dictionary.to_numpy(zero_copy_only=False)
        tok = vocab[c[starts]]
        return pa.table(
            {
                "tpart": pa.array(_token_parts(tok)),
                "side": pa.array(np.zeros(len(tok), np.int64)),
                "doc_id": pa.array(ids[d[starts]], pa.int64()),
                "token": pa.array(tok.tolist(), pa.string()),
                "n": pa.array(cnt),
            }
        )

    def model_rows(b: pa.Table) -> pa.Table:
        tl = np.asarray(b.column("token").to_pylist(), dtype=object)
        return pa.table(
            {
                "tpart": pa.array(
                    _token_parts(tl) if b.num_rows else np.empty(0, np.int64)
                ),
                "side": pa.array(np.ones(b.num_rows, np.int64)),
                "doc_id": pa.array(np.full(b.num_rows, -1, np.int64)),
                "token": b.column("token"),
                "n": b.column("term_fp"),
            }
        )

    tagged = ds.map_batches(tf_rows, batch_format="pyarrow").union(
        model.map_batches(model_rows, batch_format="pyarrow")
    )

    def join_part(grp: pa.Table) -> pa.Table:
        """One token partition: lookup term_fp per tf row, pre-combine
        to ONE (doc_id, n_tokens, wfp) partial per document."""
        side = grp.column("side").to_numpy(zero_copy_only=False)
        tok = np.asarray(grp.column("token").to_pylist(), dtype=object)
        n = grp.column("n").to_numpy(zero_copy_only=False)
        doc = grp.column("doc_id").to_numpy(zero_copy_only=False)
        is_m = side == 1
        mtok, mfp = tok[is_m], n[is_m]
        order = np.argsort(mtok)
        mtok, mfp = mtok[order], mfp[order]
        tdoc, ttok, tcnt = doc[~is_m], tok[~is_m], n[~is_m]
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "wfp": pa.array([], pa.int64()),
            }
        )
        if len(tdoc) == 0:
            return empty
        pos = np.minimum(np.searchsorted(mtok, ttok), max(len(mtok) - 1, 0))
        found = mtok[pos] == ttok if len(mtok) else np.zeros(len(ttok), bool)
        fp = np.where(found, mfp[pos], 0).astype(np.int64)
        o = np.argsort(tdoc, kind="stable")
        d_s, c_s, w_s = tdoc[o], tcnt[o], (tcnt * fp)[o]
        starts = np.flatnonzero(np.concatenate(([True], d_s[1:] != d_s[:-1])))
        return pa.table(
            {
                "doc_id": pa.array(d_s[starts], pa.int64()),
                "n_tokens": pa.array(np.add.reduceat(c_s, starts)),
                "wfp": pa.array(np.add.reduceat(w_s, starts)),
            }
        )

    partials = tagged.groupby("tpart").map_groups(
        join_part, batch_format="pyarrow"
    )

    def zero_rows(b: pa.Table) -> pa.Table:
        ids = pc.cast(b.column(id_col), pa.int64())
        z = pa.nulls(b.num_rows, pa.int64()).fill_null(0)
        return pa.table({"doc_id": ids, "n_tokens": z, "wfp": z})

    summed = (
        partials.union(ds.map_batches(zero_rows, batch_format="pyarrow"))
        .groupby("doc_id")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("wfp", alias_name="log_weight_fp"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        wfp = pc.cast(b.column("log_weight_fp"), pa.int64())
        return pa.table(
            {
                "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                "n_tokens": pc.cast(b.column("n_tokens"), pa.int64()),
                "log_weight_fp": wfp,
                "log_weight": pa.array(
                    wfp.to_numpy(zero_copy_only=False) / FP_SCALE,
                    pa.float64(),
                ),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")
