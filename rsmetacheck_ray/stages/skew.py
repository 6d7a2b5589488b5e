"""Skew handling — salted aggregation over the host key (SURVEY §4
"Skew" row; the north rule's oversized-host requirement).

The web's host distribution is Zipf: a plain ``groupby(host)`` sends
every page of a mega-host to one reducer. The fix is the classic
two-phase salted aggregate:

  phase 1: ``groupby((host, salt))`` where ``salt = doc_id % S`` —
           a hot host's rows split across S reducers;
  phase 2: ``groupby(host)`` over the S partial rows per host — the
           second shuffle moves only #hosts × S tiny rows.

Combined with the in-batch Arrow ``group_by`` pre-combine (each map
task emits at most one row per (host, salt) per batch), the bytes
shuffled are O(#distinct hosts × S), independent of row count.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

# one pattern string for BOTH sides: pyarrow extract_regex requires a
# NAMED group; DuckDB's regexp_extract(url, pat, 1) addresses the same
# group positionally
HOST_RE = r"^(?:https?://)?(?P<host>[^/:?]+)"
N_SALT = 16


def _extract_host(url: pa.Array) -> pa.Array:
    ex = pc.extract_regex(url, HOST_RE)
    return pc.struct_field(ex, "host")


def salted_host_counts(
    ds: rd.Dataset, url_col: str = "url", id_col: str = "doc_id", n_salt: int = N_SALT
) -> rd.Dataset:
    """(host, n_pages) via the two-phase salted aggregate."""

    def phase1(batch: pa.Table) -> pa.Table:
        url = batch.column(url_col)
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        host = _extract_host(url)
        salt = pa.array(
            batch.column(id_col).to_numpy(zero_copy_only=False) % n_salt
        )
        t = pa.table({"host": host, "salt": salt})
        g = t.group_by(["host", "salt"]).aggregate([([], "count_all")])
        return g.rename_columns(["host", "salt", "n_pages"])

    partial = ds.map_batches(phase1, batch_format="pyarrow")
    salted = partial.groupby(["host", "salt"]).aggregate(
        Sum("n_pages", alias_name="n_pages")
    )
    final = salted.groupby("host").aggregate(Sum("n_pages", alias_name="n_pages"))
    return final


HOST_COUNTS_SQL_TEMPLATE = (
    """
WITH pages AS ({pages})
SELECT regexp_extract(url, '"""
    + HOST_RE
    + """', 1) AS host,
       COUNT(*) AS n_pages
FROM pages
GROUP BY 1
"""
)
