"""Character-level Shannon entropy per document — the classic
low-information-content quality signal (near-zero entropy = repeated
filler/padding; unusually high = random bytes/base64 blobs). A
training-data pipeline filters or down-weights both tails; the gate's
repetition and symbol-ratio rules catch specific shapes, this scores
the whole distribution.

Semantics (frozen, SQL-differential oracle ``doc_char_entropy``):

 - character   = Unicode codepoint of the document text (NULL ⇒ "")
 - c_i, n      = per-document count of each distinct character / total
 - entropy     = ln(n) − (Σ c_i·ln(c_i)) / n   (nats; 0 for n == 0)

**Float discipline — the fixed-point sum trick (``dsir.py``):** the
inner sum quantizes each ln to integer nano-log-units FIRST —
``s_fp = Σ c_i · floor(ln(c_i)·1e9)`` — so the per-document sum is an
INTEGER sum, order-independent and exact on both sides; the only
float ops are the final ``ln(n) − (s_fp/1e9)/n``, written identically
in SQL. ``ln`` via ``math.log`` over DISTINCT counts (same libm as
DuckDB; numpy's SIMD log is ≤1 ulp off). Bound: c·ln(c)·1e9 per doc
sums below 2⁶³ for documents up to ~4·10⁸ chars.

Scale shape: pure ``map_batches`` — one row per document out, no
shuffle at any corpus size. Per batch, all documents' codepoints are
processed in ONE sorted pass (single combined (doc, char) key sort +
``reduceat``); ASCII-only batches read codepoints zero-copy off the
Arrow string buffer, non-ASCII batches pay one C-level utf-32
re-encode — no per-row Python logic either way.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

FP_SCALE = 1_000_000_000.0  # nano-log-units

_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_chars", pa.int64()),
        ("entropy", pa.float64()),
    ]
)


def _ln_lut(values: np.ndarray) -> np.ndarray:
    """math.log over the DISTINCT positive int values, gathered —
    bit-identical to DuckDB ln(CAST(x AS DOUBLE))."""
    uniq, inv = np.unique(values, return_inverse=True)
    lut = np.array([math.log(int(v)) for v in uniq], dtype=np.float64)
    return lut[inv]


def _codepoints(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(codepoints, per-doc char lengths) of a string array, NULLs as
    empty. ASCII fast path: byte buffer == codepoints, zero-copy."""
    texts = pc.fill_null(texts, "")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lengths = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    arr = texts.cast(pa.large_string())
    off = arr.buffers()[1]
    dat = arr.buffers()[2]
    offs = np.frombuffer(off, np.int64, len(arr) + 1)
    buf = (
        np.frombuffer(dat, np.uint8, offs[-1])
        if dat is not None
        else np.empty(0, np.uint8)
    )
    n_bytes = int(offs[-1] - offs[0])
    if int(lengths.sum()) == n_bytes:  # all-ASCII batch: bytes ARE chars
        codes = buf[offs[0] : offs[-1]].astype(np.uint32)
    else:
        joined = "".join(texts.to_pylist())  # one C-level pass
        codes = np.frombuffer(joined.encode("utf-32-le"), np.uint32)
    return codes, lengths


def char_entropy(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """(doc_id, n_chars, entropy) per input document."""

    def batch_fn(b: pa.Table) -> pa.Table:
        codes, lengths = _codepoints(b.column(text_col))
        n_docs = len(b)
        doc_ids = b.column("doc_id")
        if len(codes) == 0:
            return pa.table(
                {
                    "doc_id": doc_ids,
                    "n_chars": pa.array(lengths, pa.int64()),
                    "entropy": pa.array(
                        np.zeros(n_docs, np.float64), pa.float64()
                    ),
                }
            )
        doc_idx = np.repeat(
            np.arange(n_docs, dtype=np.int64), lengths
        )
        # one combined (doc, char) key → one sort handles the batch
        key = (doc_idx.astype(np.uint64) << np.uint64(32)) | codes.astype(
            np.uint64
        )
        key.sort()
        starts = np.flatnonzero(np.concatenate(([True], key[1:] != key[:-1])))
        counts = np.diff(np.append(starts, len(key))).astype(np.int64)
        grp_doc = (key[starts] >> np.uint64(32)).astype(np.int64)
        term_fp = counts * np.floor(_ln_lut(counts) * FP_SCALE).astype(
            np.int64
        )
        # grp_doc is sorted (the combined key was) — segment-reduce it
        doc_b = np.flatnonzero(
            np.concatenate(([True], grp_doc[1:] != grp_doc[:-1]))
        )
        s_fp = np.zeros(n_docs, np.int64)
        s_fp[grp_doc[doc_b]] = np.add.reduceat(term_fp, doc_b)
        ent = np.zeros(n_docs, np.float64)
        nz = lengths > 0
        if nz.any():
            ln_n = _ln_lut(lengths[nz])
            ent[nz] = ln_n - (s_fp[nz] / FP_SCALE) / lengths[nz]
        return pa.table(
            {
                "doc_id": doc_ids,
                "n_chars": pa.array(lengths, pa.int64()),
                "entropy": pa.array(ent, pa.float64()),
            }
        )

    return ds.map_batches(batch_fn, batch_format="pyarrow")


CHAR_ENTROPY_SQL = """
WITH chars AS (
  SELECT doc_id, unnest(string_split(COALESCE(text, ''), '')) AS ch
  FROM documents
),
cc AS (
  SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
  FROM chars WHERE ch <> '' GROUP BY 1, 2
),
s AS (
  SELECT doc_id,
    CAST(SUM(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000000) AS BIGINT))
      AS BIGINT) AS s_fp,
    CAST(SUM(c) AS BIGINT) AS n
  FROM cc GROUP BY 1
)
SELECT d.doc_id,
  COALESCE(s.n, 0) AS n_chars,
  CASE WHEN s.n > 0
    THEN ln(CAST(s.n AS DOUBLE)) - (CAST(s.s_fp AS DOUBLE) / 1000000000.0) / s.n
    ELSE 0.0 END AS entropy
FROM documents d LEFT JOIN s USING (doc_id)
"""
