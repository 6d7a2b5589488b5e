"""Deterministic train/val/test split assignment — the holdout-split
step every training-data pipeline runs after curation (and the shape of
the reference's fixed test-repo list, ``tests/conftest.py`` pinning a
frozen evaluation set).

Design: a pure per-batch map, NO shuffle — each document's split is a
function of its own id only, so the assignment is stable under any
partitioning, resumable for free, and identical across cluster sizes.
The bucket is the first two hex digits of ``md5(str(doc_id))``
(0..255) — the same machine-independent permutation as
``functions/shuffle.py`` / ``functions/sampling.py``, so DuckDB
reproduces it verbatim and the whole operator sits behind an exact SQL
oracle. Fractions are therefore resolved in 1/256 steps: the split is
*deterministic first*, approximate-in-fraction second (at 10¹² docs a
1/256 quantization error is irrelevant; a seeded RNG would not be
reproducible across engines).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from .sampling import _md5_ranks

_HEX = "0123456789abcdef"

# default ~80/10/10: buckets [0,205) train, [205,230) val, [230,256) test
DEFAULT_TRAIN_BUCKETS = 205
DEFAULT_VAL_BUCKETS = 25


def assign_splits(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    train_buckets: int = DEFAULT_TRAIN_BUCKETS,
    val_buckets: int = DEFAULT_VAL_BUCKETS,
) -> rd.Dataset:
    """(id, bucket, split): deterministic md5-bucket holdout split."""
    if not 0 < train_buckets + val_buckets <= 256:
        raise ValueError("train_buckets + val_buckets must be in (0, 256]")

    def tag(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ranks = _md5_ranks(ids)
        buckets = np.array([int(r[:2], 16) for r in ranks], dtype=np.int64)
        split = np.where(
            buckets < train_buckets,
            "train",
            np.where(buckets < train_buckets + val_buckets, "val", "test"),
        )
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "bucket": pa.array(buckets, pa.int64()),
                "split": pa.array(split, pa.string()),
            }
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def sql_bucket_expr(id_expr: str = "doc_id") -> str:
    """The 0..255 md5 bucket as DuckDB SQL (oracle side)."""
    c1 = f"strpos('{_HEX}', substr(md5(CAST({id_expr} AS VARCHAR)), 1, 1)) - 1"
    c2 = f"strpos('{_HEX}', substr(md5(CAST({id_expr} AS VARCHAR)), 2, 1)) - 1"
    return f"(({c1}) * 16 + ({c2}))"


def sql_split(
    id_expr: str = "doc_id",
    train_buckets: int = DEFAULT_TRAIN_BUCKETS,
    val_buckets: int = DEFAULT_VAL_BUCKETS,
) -> str:
    b = sql_bucket_expr(id_expr)
    return (
        f"CASE WHEN {b} < {train_buckets} THEN 'train' "
        f"WHEN {b} < {train_buckets + val_buckets} THEN 'val' "
        f"ELSE 'test' END"
    )
