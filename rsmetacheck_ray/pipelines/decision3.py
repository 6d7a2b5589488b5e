"""Decision-support batch 3 (round 3): the remaining classic TPC-H
shapes — two-nation volume shipping (Q7: THREE-table big⋈big chain
with two bounded broadcast dimensions and a size-gated customer
side), urgency split counts across a big⋈big join (Q12's
conditional-count shape on the columns this lake has), tie-aware top
revenue supplier (Q15: aggregate → global scalar max → equality
filter), small-quantity revenue loss (Q17: correlated per-group
average as an EXACT integer predicate, two passes), dominant
suppliers (Q20: fraction-of-aggregate fair-share predicate),
rich-but-inactive customers (Q22: global scalar-subquery threshold +
anti-join + bounded group), and market-basket co-purchase pair counts
(within-key self-join by bounded pair distance, hot-basket capped).

Scale discipline (same as decision.py / decision2.py):

- big⋈big edges are single tagged-union shuffles on size-adaptive
  hashed key partitions (``adaptive_partitions``), with per-batch
  pre-combine so partials move, not tables;
- bounded sides (supplier→nation, one brand's part keys, nation
  names) travel once as sorted-array ``ray.put`` handles behind
  explicit size gates;
- money math is exact int64 cents; the Q17/Q22 "x < fraction·AVG(...)"
  predicates are evaluated as cross-multiplied INTEGER comparisons
  (5·qty·cnt < sum_qty; bal·cnt > sum) so engine and oracle agree
  bit-for-bit with no float-boundary ties;
- final group domains are bounded (nation², linestatus, mktsegment) ⇒
  driver-merged partials (``bounded_group_reduce``).

The reference has no relational engine (single-process JSON walk,
``src/cli.py`` + ``utils/pitfall_utils.py``); shapes per SURVEY
§2.6-2.8's aggregation/join axis.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..partitioning import adaptive_partitions, parquet_rows_hint
from .relational import (
    _cents,
    _part_of,
    _read_pq,
    bounded_group_reduce,
    bounded_group_table_strict,
)

# customer's (custkey → nationkey) projection is 16 B/row: 2M rows
# (the nation_order_stats gate) ≈ 32 MB broadcast — past it the
# second tagged-union shuffle joins the customer side distributively
_NV_CUST_BROADCAST_MAX = 2_000_000

# supplier travels as sorted (s_suppkey → s_nationkey) int arrays:
# 16 B/row, 160 KB at SF-1 (10k suppliers), ~160 MB at a 10⁷-supplier
# extreme — past the gate ``_li_supplier_copart`` joins
# lineitem⋈supplier distributively on a hashed suppkey partition
# instead (one extra tagged-union shuffle, never a driver pull).
_SUPPLIER_BROADCAST_MAX = 10_000_000


def _supplier_rows_hint(sf_dir: str) -> int:
    """Supplier row count from parquet footer metadata only — the
    broadcast-vs-co-partition gate must not read the table to decide."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(
        os.path.join(sf_dir, "supplier.parquet")
    ).metadata.num_rows


def _supplier_nation_ref(sf_dir: str):
    """ray.put a sorted (s_suppkey, s_nationkey) pair for per-batch
    searchsorted lookup. Callers gate on ``_supplier_rows_hint`` ≤
    ``_SUPPLIER_BROADCAST_MAX`` before building this handle."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    sk = t.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    sn = t.column("s_nationkey").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    order = np.argsort(sk, kind="stable")
    return ray.put((sk[order], sn[order]))


def _li_supplier_copart(
    li_rows: rd.Dataset,
    sf_dir: str,
    payload: list[str],
    n_parts: int,
) -> rd.Dataset:
    """Co-partitioned lineitem⋈supplier on suppkey — the
    past-the-broadcast-gate plan for the Q5/Q7 family. ``li_rows``
    batches carry ``skey`` (l_suppkey, int64) plus int64 ``payload``
    columns (already per-batch pre-combined by the caller); supplier
    ships as (key → nationkey) 16 B rows. ONE tagged-union all-to-all
    on hash(suppkey); the partition merge sorts its supplier slice
    (suppkey is a PK) and searchsorted-probes the line rows. Returns
    (snat, *payload) inner-join hits."""
    # internal tagged-union columns use a "_c" prefix so payload
    # names ("key", "okey", …) can never collide with them
    assert not any(c.startswith("_c") for c in payload), payload
    sup = _read_pq(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )

    def tag_sup(b: pa.Table) -> pa.Table:
        n = len(b)
        z = pa.array(np.zeros(n, np.int64), pa.int64())
        cols = {
            "_cpart": _part_of(b.column("s_suppkey"), n_parts),
            "_ckey": pc.cast(b.column("s_suppkey"), pa.int64()),
            "_ctag": pa.array(np.zeros(n, np.int8)),
            "_cnat": pc.cast(b.column("s_nationkey"), pa.int64()),
        }
        for c in payload:
            cols[c] = z
        return pa.table(cols)

    def tag_line(b: pa.Table) -> pa.Table:
        n = len(b)
        cols = {
            "_cpart": _part_of(b.column("skey"), n_parts),
            "_ckey": pc.cast(b.column("skey"), pa.int64()),
            "_ctag": pa.array(np.ones(n, np.int8)),
            "_cnat": pa.array(np.zeros(n, np.int64), pa.int64()),
        }
        for c in payload:
            cols[c] = pc.cast(b.column(c), pa.int64())
        return pa.table(cols)

    both = sup.map_batches(tag_sup, batch_format="pyarrow").union(
        li_rows.map_batches(tag_line, batch_format="pyarrow")
    )
    empty = pa.table(
        {
            "snat": pa.array([], pa.int64()),
            **{c: pa.array([], pa.int64()) for c in payload},
        }
    )

    def merge(g: pa.Table) -> pa.Table:
        tag = g.column("_ctag").to_numpy(zero_copy_only=False)
        key = g.column("_ckey").to_numpy(zero_copy_only=False)
        ssel = tag == 0
        sk = key[ssel]
        sn = g.column("_cnat").to_numpy(zero_copy_only=False)[ssel]
        lsel = ~ssel
        lk = key[lsel]
        if not len(sk) or not len(lk):
            return empty
        order = np.argsort(sk, kind="stable")  # suppkey is a PK: unique
        sk, sn = sk[order], sn[order]
        pos = np.minimum(np.searchsorted(sk, lk), len(sk) - 1)
        hit = sk[pos] == lk
        cols = {"snat": pa.array(sn[pos][hit], pa.int64())}
        for c in payload:
            cols[c] = pa.array(
                g.column(c).to_numpy(zero_copy_only=False)[lsel][hit],
                pa.int64(),
            )
        return pa.table(cols)

    return both.groupby("_cpart").map_groups(merge, batch_format="pyarrow")


def _nation_names(sf_dir: str) -> dict[int, str]:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    return dict(
        zip(
            t.column("n_nationkey").to_pylist(),
            t.column("n_name").to_pylist(),
        )
    )


def _year_of(ts: np.ndarray) -> np.ndarray:
    """Calendar year of a datetime64[us] array, as int64."""
    return ts.astype("M8[Y]").astype(np.int64) + 1970


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: volume shipping between nation pairs.
# ---------------------------------------------------------------------------

def nation_volume(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(supp_nation, cust_nation, l_year, rev_cents): line revenue per
    (supplier nation, customer nation, ship year) over the window.

    Plan: supplier→nation rides along as a sorted broadcast pair
    (size-gated); nation names are a 25-row driver map. The big⋈big
    chain lineitem⋈orders⋈customer is size-gated like
    ``nation_order_stats``: shuffle 1 (orderkey) always runs —
    lineitem batches pre-combine to one (orderkey, supp_nation, year)
    → cents partial per batch, orders carry (orderkey → custkey), and
    the partition merge rewrites orderkey→custkey. While the
    (custkey → c_nationkey) projection is bounded
    (≤ ``_NV_CUST_BROADCAST_MAX``) that same merge resolves the
    customer nation from a broadcast sorted pair and emits final
    (snat, cnat, year) partials — ONE shuffle total; past the bound a
    second tagged-union shuffle on custkey joins the (at-scale
    unbounded) customer side distributively.

    The final domain is |nations|² × years ⇒ driver-merged reduce."""
    use_sup_bcast = _supplier_rows_hint(sf_dir) <= _SUPPLIER_BROADCAST_MAX
    sup_ref = _supplier_nation_ref(sf_dir) if use_sup_bcast else None
    names = _nation_names(sf_dir)

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
            "l_shipdate",
        ],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(lo.item()))
            & (pc.field("l_shipdate") < pa.scalar(hi.item()))
        ),
    )
    orders = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
    )
    cust = _read_pq(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    n_parts = num_partitions or adaptive_partitions(
        max(parquet_rows_hint(orders) or 0, parquet_rows_hint(li) or 0)
        or None,
        row_bytes=56,
    )

    def tag_li(b: pa.Table) -> pa.Table:
        sk, sn = ray.get(sup_ref)
        lsk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        if len(sk):
            pos = np.minimum(np.searchsorted(sk, lsk), len(sk) - 1)
            snat = np.where(sk[pos] == lsk, sn[pos], -1)
        else:
            snat = np.full(len(lsk), -1, np.int64)
        rev = _cents(
            pc.multiply(
                b.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), b.column("l_discount")),
            )
        )
        yr = _year_of(
            b.column("l_shipdate").to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "key": b.column("l_orderkey"),
                "snat": pa.array(snat, pa.int64()),
                "year": pa.array(yr, pa.int64()),
                "cents": rev,
            }
        )
        t = t.filter(pc.greater_equal(t.column("snat"), 0))
        g = t.group_by(["key", "snat", "year"]).aggregate([("cents", "sum")])
        g = g.rename_columns(["key", "snat", "year", "cents"])
        n = g.num_rows
        z = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table(
            {
                "part": _part_of(g.column("key"), n_parts),
                "key": pc.cast(g.column("key"), pa.int64()),
                "tag": pa.array(np.zeros(n, np.int8)),
                "snat": g.column("snat"),
                "year": g.column("year"),
                "cents": g.column("cents"),
                "ckey": z,
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        n = len(b)
        z = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table(
            {
                "part": _part_of(b.column("o_orderkey"), n_parts),
                "key": pc.cast(b.column("o_orderkey"), pa.int64()),
                "tag": pa.array(np.ones(n, np.int8)),
                "snat": z,
                "year": z,
                "cents": z,
                "ckey": pc.cast(b.column("o_custkey"), pa.int64()),
            }
        )

    if use_sup_bcast:
        li_tagged = li.map_batches(tag_li, batch_format="pyarrow")
    else:
        # past the supplier broadcast gate: resolve l_suppkey →
        # s_nationkey with ONE extra co-partitioned suppkey shuffle
        # (per-batch pre-combined (skey, okey, year) → cents partials
        # move, never raw lines), then retag for the orderkey stage.
        def li_proj(b: pa.Table) -> pa.Table:
            rev = _cents(
                pc.multiply(
                    b.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), b.column("l_discount")),
                )
            )
            yr = _year_of(
                b.column("l_shipdate").to_numpy(zero_copy_only=False)
            )
            t = pa.table(
                {
                    "skey": pc.cast(b.column("l_suppkey"), pa.int64()),
                    "key": pc.cast(b.column("l_orderkey"), pa.int64()),
                    "year": pa.array(yr, pa.int64()),
                    "cents": rev,
                }
            )
            g = t.group_by(["skey", "key", "year"]).aggregate(
                [("cents", "sum")]
            )
            return g.rename_columns(["skey", "key", "year", "cents"])

        resolved = _li_supplier_copart(
            li.map_batches(li_proj, batch_format="pyarrow"),
            sf_dir,
            ["key", "year", "cents"],
            n_parts,
        )

        def retag(b: pa.Table) -> pa.Table:
            n = len(b)
            return pa.table(
                {
                    "part": _part_of(b.column("key"), n_parts),
                    "key": b.column("key"),
                    "tag": pa.array(np.zeros(n, np.int8)),
                    "snat": b.column("snat"),
                    "year": b.column("year"),
                    "cents": b.column("cents"),
                    "ckey": pa.array(np.zeros(n, np.int64), pa.int64()),
                }
            )

        li_tagged = resolved.map_batches(retag, batch_format="pyarrow")

    both = li_tagged.union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    empty_mid = pa.table(
        {
            "part": pa.array([], pa.int64()),
            "key": pa.array([], pa.int64()),
            "tag": pa.array([], pa.int8()),
            "snat": pa.array([], pa.int64()),
            "year": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
            "ckey": pa.array([], pa.int64()),
        }
    )
    empty_final = pa.table(
        {
            "snat": pa.array([], pa.int64()),
            "cnat": pa.array([], pa.int64()),
            "l_year": pa.array([], pa.int64()),
            "rev_cents": pa.array([], pa.int64()),
        }
    )

    def _lines_with_cust(g: pa.Table):
        """Shared partition merge: rewrite the group's line partials'
        orderkey → custkey via the group's order rows. Returns
        (ckey, snat, year, cents) numpy arrays, or None when either
        side is absent."""
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        osel = tag == 1
        ok = key[osel]
        oc = g.column("ckey").to_numpy(zero_copy_only=False)[osel]
        lsel = ~osel
        lk = key[lsel]
        if not len(ok) or not len(lk):
            return None
        order = np.argsort(ok, kind="stable")
        ok, oc = ok[order], oc[order]
        pos = np.minimum(np.searchsorted(ok, lk), len(ok) - 1)
        hit = ok[pos] == lk
        return (
            oc[pos][hit],
            g.column("snat").to_numpy(zero_copy_only=False)[lsel][hit],
            g.column("year").to_numpy(zero_copy_only=False)[lsel][hit],
            g.column("cents").to_numpy(zero_copy_only=False)[lsel][hit],
        )

    cust_hint = parquet_rows_hint(cust)
    if cust_hint is not None and cust_hint <= _NV_CUST_BROADCAST_MAX:
        # bounded customer projection: resolve c_nationkey inside the
        # ONE orderkey shuffle from a broadcast sorted pair
        import pyarrow.parquet as pq

        ct = pq.read_table(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_nationkey"],
        )
        bk = ct.column("c_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        bn = ct.column("c_nationkey").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        corder = np.argsort(bk, kind="stable")
        cust_ref = ray.put((bk[corder], bn[corder]))

        def merge_bcast(g: pa.Table) -> pa.Table:
            joined = _lines_with_cust(g)
            if joined is None:
                return empty_final
            ck, snat, year, cents = joined
            bk2, bn2 = ray.get(cust_ref)
            if not len(bk2):
                return empty_final
            pos = np.minimum(np.searchsorted(bk2, ck), len(bk2) - 1)
            hit = bk2[pos] == ck
            t = pa.table(
                {
                    "snat": pa.array(snat[hit], pa.int64()),
                    "cnat": pa.array(bn2[pos][hit], pa.int64()),
                    "l_year": pa.array(year[hit], pa.int64()),
                    "rev_cents": pa.array(cents[hit], pa.int64()),
                }
            )
            m = t.group_by(["snat", "cnat", "l_year"]).aggregate(
                [("rev_cents", "sum")]
            )
            return m.rename_columns(["snat", "cnat", "l_year", "rev_cents"])

        per_part = both.groupby("part").map_groups(
            merge_bcast, batch_format="pyarrow"
        )
    else:

        def merge_orders(g: pa.Table) -> pa.Table:
            joined = _lines_with_cust(g)
            if joined is None:
                return empty_mid
            ck, snat, year, cents = joined
            t = pa.table(
                {
                    "ckey": pa.array(ck, pa.int64()),
                    "snat": pa.array(snat, pa.int64()),
                    "year": pa.array(year, pa.int64()),
                    "cents": pa.array(cents, pa.int64()),
                }
            )
            m = t.group_by(["ckey", "snat", "year"]).aggregate(
                [("cents", "sum")]
            )
            m = m.rename_columns(["ckey", "snat", "year", "cents"])
            n = m.num_rows
            return pa.table(
                {
                    "part": _part_of(m.column("ckey"), n_parts),
                    "key": m.column("ckey"),
                    "tag": pa.array(np.zeros(n, np.int8)),
                    "snat": m.column("snat"),
                    "year": m.column("year"),
                    "cents": m.column("cents"),
                    "ckey": pa.array(np.zeros(n, np.int64), pa.int64()),
                }
            )

        mid = both.groupby("part").map_groups(
            merge_orders, batch_format="pyarrow"
        )

        def tag_cust(b: pa.Table) -> pa.Table:
            n = len(b)
            z = pa.array(np.zeros(n, np.int64), pa.int64())
            return pa.table(
                {
                    "part": _part_of(b.column("c_custkey"), n_parts),
                    "key": pc.cast(b.column("c_custkey"), pa.int64()),
                    "tag": pa.array(np.ones(n, np.int8)),
                    "snat": z,
                    "year": z,
                    "cents": z,
                    "ckey": pc.cast(b.column("c_nationkey"), pa.int64()),
                }
            )

        both2 = mid.union(cust.map_batches(tag_cust, batch_format="pyarrow"))

        def merge_cust(g: pa.Table) -> pa.Table:
            tag = g.column("tag").to_numpy(zero_copy_only=False)
            key = g.column("key").to_numpy(zero_copy_only=False)
            csel = tag == 1
            ck = key[csel]
            cn = g.column("ckey").to_numpy(zero_copy_only=False)[csel]
            lsel = ~csel
            lk = key[lsel]
            if not len(ck) or not len(lk):
                return empty_final
            order = np.argsort(ck, kind="stable")
            ck, cn = ck[order], cn[order]
            pos = np.minimum(np.searchsorted(ck, lk), len(ck) - 1)
            hit = ck[pos] == lk
            t = pa.table(
                {
                    "snat": pa.array(
                        g.column("snat").to_numpy(zero_copy_only=False)[
                            lsel
                        ][hit],
                        pa.int64(),
                    ),
                    "cnat": pa.array(cn[pos][hit], pa.int64()),
                    "l_year": pa.array(
                        g.column("year").to_numpy(zero_copy_only=False)[
                            lsel
                        ][hit],
                        pa.int64(),
                    ),
                    "rev_cents": pa.array(
                        g.column("cents").to_numpy(zero_copy_only=False)[
                            lsel
                        ][hit],
                        pa.int64(),
                    ),
                }
            )
            m = t.group_by(["snat", "cnat", "l_year"]).aggregate(
                [("rev_cents", "sum")]
            )
            return m.rename_columns(["snat", "cnat", "l_year", "rev_cents"])

        per_part = both2.groupby("part").map_groups(
            merge_cust, batch_format="pyarrow"
        )
    agg = bounded_group_table_strict(
        per_part, ["snat", "cnat", "l_year"], [("rev_cents", "sum")]
    )
    if agg is None or agg.num_rows == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "supp_nation": pa.array([], pa.string()),
                    "cust_nation": pa.array([], pa.string()),
                    "l_year": pa.array([], pa.int64()),
                    "rev_cents": pa.array([], pa.int64()),
                }
            )
        )
    sn = [names.get(k, "?") for k in agg.column("snat").to_pylist()]
    cn = [names.get(k, "?") for k in agg.column("cnat").to_pylist()]
    out = pa.table(
        {
            "supp_nation": pa.array(sn, pa.string()),
            "cust_nation": pa.array(cn, pa.string()),
            "l_year": agg.column("l_year"),
            "rev_cents": agg.column("rev_cents"),
        }
    )
    idx = pc.sort_indices(
        out,
        sort_keys=[
            ("supp_nation", "ascending"),
            ("cust_nation", "ascending"),
            ("l_year", "ascending"),
        ],
    )
    return rd.from_arrow(out.take(idx))


NATION_VOLUME_SQL = """
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                           + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: conditional counts across a big⋈big join — urgent
# vs non-urgent order lines per line status.
# ---------------------------------------------------------------------------

def urgent_lines_by_status(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(l_linestatus, n_urgent, n_other): order lines shipped in the
    window, counted per line status and split by whether their ORDER
    is high-priority ('1-URGENT' / '2-HIGH') — Q12's CASE-count shape
    on this lake's columns (no shipmode column exists).

    Plan: ONE tagged-union shuffle on orderkey. lineitem pre-combines
    per batch to (orderkey, status) line counts; orders carry one
    urgency bit. The partition merge splits the counts by the bit and
    emits ≤2 partial rows; final reduce on the driver (domain = 2)."""
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linestatus"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(lo.item()))
            & (pc.field("l_shipdate") < pa.scalar(hi.item()))
        ),
    )
    orders = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(orders), row_bytes=32
    )

    def tag_li(b: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "key": b.column("l_orderkey"),
                    "status": b.column("l_linestatus"),
                }
            )
            .group_by(["key", "status"])
            .aggregate([([], "count_all")])
        )
        g = g.rename_columns(["key", "status", "n"])
        return pa.table(
            {
                "part": _part_of(g.column("key"), n_parts),
                "key": pc.cast(g.column("key"), pa.int64()),
                "tag": pa.array(np.zeros(g.num_rows, np.int8)),
                "status": g.column("status"),
                "n": pc.cast(g.column("n"), pa.int64()),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        urgent = pc.is_in(
            b.column("o_orderpriority"),
            value_set=pa.array(["1-URGENT", "2-HIGH"]),
        )
        n = len(b)
        return pa.table(
            {
                "part": _part_of(b.column("o_orderkey"), n_parts),
                "key": pc.cast(b.column("o_orderkey"), pa.int64()),
                "tag": pa.array(np.ones(n, np.int8)),
                "status": pa.array([""] * n, pa.string()),
                "n": pc.cast(urgent, pa.int64()),
            }
        )

    both = li.map_batches(tag_li, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def merge(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        nn = g.column("n").to_numpy(zero_copy_only=False)
        osel = tag == 1
        ok = key[osel]
        ou = nn[osel]
        lsel = ~osel
        lk = key[lsel]
        if not len(ok) or not len(lk):
            return pa.table(
                {
                    "l_linestatus": pa.array([], pa.string()),
                    "n_urgent": pa.array([], pa.int64()),
                    "n_other": pa.array([], pa.int64()),
                }
            )
        order = np.argsort(ok, kind="stable")
        ok, ou = ok[order], ou[order]
        pos = np.minimum(np.searchsorted(ok, lk), len(ok) - 1)
        hit = ok[pos] == lk
        urgent = ou[pos] == 1
        cnt = nn[lsel]
        t = pa.table(
            {
                "l_linestatus": g.column("status")
                .filter(pa.array(lsel))
                .combine_chunks()
                .filter(pa.array(hit)),
                "n_urgent": pa.array(
                    np.where(urgent[hit], cnt[hit], 0), pa.int64()
                ),
                "n_other": pa.array(
                    np.where(urgent[hit], 0, cnt[hit]), pa.int64()
                ),
            }
        )
        m = t.group_by("l_linestatus").aggregate(
            [("n_urgent", "sum"), ("n_other", "sum")]
        )
        return m.rename_columns(["l_linestatus", "n_urgent", "n_other"])

    per_part = both.groupby("part").map_groups(merge, batch_format="pyarrow")
    agg = bounded_group_reduce(
        per_part, ["l_linestatus"], [("n_urgent", "sum"), ("n_other", "sum")]
    )
    return agg.sort("l_linestatus")


URGENT_LINES_SQL = """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_other
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
"""


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: top revenue supplier — aggregate, global max,
# tie-aware equality filter.
# ---------------------------------------------------------------------------

def top_supplier(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
) -> rd.Dataset:
    """(s_suppkey, s_name, total_cents): the supplier(s) with the MAX
    line revenue over the quarter — ALL ties kept, like Q15's view +
    scalar-subquery form.

    Plan: lineitem scans the window (parquet predicate) and
    pre-combines per batch to (suppkey → cents) partials; the reduce
    is driver-merged while the supplier domain stays bounded
    (strict gate raises past 4M suppliers — at that point the revenue
    view itself is the thing to keep distributed). The global max and
    the equality filter are O(|suppliers|) driver math; names come
    from the size-gated supplier broadcast."""
    import pyarrow.parquet as pq

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(lo.item()))
            & (pc.field("l_shipdate") < pa.scalar(hi.item()))
        ),
    )

    def partial(b: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(
                b.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), b.column("l_discount")),
            )
        )
        g = (
            pa.table({"s_suppkey": b.column("l_suppkey"), "cents": rev})
            .group_by("s_suppkey")
            .aggregate([("cents", "sum")])
        )
        return g.rename_columns(["s_suppkey", "total_cents"])

    per_supp = bounded_group_table_strict(
        li.map_batches(partial, batch_format="pyarrow"),
        ["s_suppkey"],
        [("total_cents", "sum")],
    )
    empty = pa.table(
        {
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "total_cents": pa.array([], pa.int64()),
        }
    )
    if per_supp is None or per_supp.num_rows == 0:
        return rd.from_arrow(empty)
    cents = per_supp.column("total_cents").to_numpy(zero_copy_only=False)
    best = cents.max()
    winners = per_supp.filter(pa.array(cents == best))
    # read ONLY the winners' name rows (pushed filter): the winner set
    # is ties-at-max, never the supplier table
    names = pq.read_table(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
        filters=[(
            "s_suppkey", "in",
            winners.column("s_suppkey").to_pylist(),
        )],
    )
    nk = names.column("s_suppkey").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    order = np.argsort(nk, kind="stable")
    nk = nk[order]
    nv = names.column("s_name").take(pa.array(order)).combine_chunks()
    wk = winners.column("s_suppkey").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    if not len(nk):
        return rd.from_arrow(empty)
    pos = np.minimum(np.searchsorted(nk, wk), len(nk) - 1)
    hit = nk[pos] == wk
    # inner-join semantics: a max-revenue suppkey with no supplier row
    # drops (matching the SQL join) rather than borrowing a neighbor's
    # name — the MAX itself is still computed over ALL revenue keys
    out = pa.table(
        {
            "s_suppkey": pa.array(wk[hit], pa.int64()),
            "s_name": nv.take(pa.array(pos[hit])),
            "total_cents": winners.column("total_cents").filter(
                pa.array(hit)
            ),
        }
    )
    return rd.from_arrow(out).sort("s_suppkey")


TOP_SUPPLIER_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                             + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT r.s_suppkey, s.s_name, r.total_cents
FROM revenue r JOIN supplier s ON r.s_suppkey = s.s_suppkey
WHERE r.total_cents = (SELECT MAX(total_cents) FROM revenue)
ORDER BY r.s_suppkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: small-quantity revenue — correlated per-part AVG as
# an exact integer predicate, two passes over lineitem.
# ---------------------------------------------------------------------------

# one brand's part keys broadcast as a sorted int64 array (8 B/key;
# the gate bounds the whole part table, an upper bound on the brand)
_BRAND_BROADCAST_MAX = 50_000_000


def _small_qty_revenue_copart(
    sf_dir: str, brand: str, num_partitions: int | None
) -> rd.Dataset:
    """Past the brand broadcast gate: the same two passes expressed on
    the generic join()'s co-partitioned partkey shuffles — brand
    membership as a semi join, the per-part thresholds re-joined
    distributively (never a driver table)."""
    from .join import join as _join

    pkeys = _read_pq(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey"],
        filter=(pc.field("p_brand") == brand),
    )
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pkey": pc.cast(b.column("l_partkey"), pa.int64()),
                "qty": pa.array(
                    b.column("l_quantity")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    pa.int64(),
                ),
                "cents": _cents(b.column("l_extendedprice")),
            }
        )

    rows = _join(
        li.map_batches(prep, batch_format="pyarrow"),
        pkeys,
        on=("pkey", "p_partkey"),
        how="semi",
        num_partitions=num_partitions,
    )

    def p1(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "pkey": b.column("pkey"),
                "sum_qty": b.column("qty"),
                "cnt": pa.array(np.ones(len(b), np.int64), pa.int64()),
            }
        )
        g = t.group_by("pkey").aggregate(
            [("sum_qty", "sum"), ("cnt", "sum")]
        )
        return g.rename_columns(["pkey", "sum_qty", "cnt"])

    stats = bounded_group_reduce(
        rows.map_batches(p1, batch_format="pyarrow"),
        ["pkey"],
        [("sum_qty", "sum"), ("cnt", "sum")],
    )
    joined = _join(
        rows, stats, on="pkey", how="inner", num_partitions=num_partitions
    )

    def p2(b: pa.Table) -> pa.Table:
        qty = b.column("qty").to_numpy(zero_copy_only=False)
        cnt = b.column("cnt").to_numpy(zero_copy_only=False)
        sq = b.column("sum_qty").to_numpy(zero_copy_only=False)
        small = 5 * qty * cnt < sq
        cents = b.column("cents").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "g": pa.array([0], pa.int8()),
                "n_lines": pa.array([int(small.sum())], pa.int64()),
                "total_cents": pa.array(
                    [int(cents[small].sum())], pa.int64()
                ),
            }
        )

    tot = bounded_group_table_strict(
        joined.map_batches(p2, batch_format="pyarrow"),
        ["g"],
        [("n_lines", "sum"), ("total_cents", "sum")],
    )
    n = int(tot.column("n_lines")[0].as_py()) if tot is not None else 0
    c = int(tot.column("total_cents")[0].as_py()) if tot is not None else 0
    return rd.from_arrow(
        pa.table(
            {
                "n_lines": pa.array([n], pa.int64()),
                "total_cents": pa.array([c], pa.int64()),
                "avg_yearly": pa.array([c / 700.0], pa.float64()),
            }
        )
    )


def small_qty_revenue(
    sf_dir: str, brand: str = "Brand#1", num_partitions: int | None = None
) -> rd.Dataset:
    """One row (n_lines, total_cents, avg_yearly): revenue of lines of
    ``brand`` parts whose quantity is below 20 % of that part's average
    line quantity (Q17).

    The correlated predicate ``l_quantity < 0.2 * AVG(l_quantity)`` is
    evaluated EXACTLY by cross-multiplication over integral
    quantities: ``5·qty·cnt < sum_qty`` (sum/cnt from pass 1) — no
    float division, so engine and oracle tie-break identically.

    Plan: the brand's part keys broadcast once (sorted int64,
    size-gated via the part gate pattern); pass 1 pre-combines
    (partkey → sum_qty, cnt) per batch with the reduce driver-merged
    (domain = one brand's parts, gate-checked); the thresholds then
    broadcast back for pass 2's filtered revenue partials (single
    scalar out)."""
    import pyarrow.parquet as pq

    # gate on the part TABLE's footer count (an upper bound on the
    # brand set) so the decision never reads data; past it the whole
    # query restructures onto the generic join()'s co-partitioned
    # path instead of raising
    part_rows = pq.ParquetFile(
        os.path.join(sf_dir, "part.parquet")
    ).metadata.num_rows
    if part_rows > _BRAND_BROADCAST_MAX:
        return _small_qty_revenue_copart(sf_dir, brand, num_partitions)
    keys = np.sort(
        pq.read_table(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey"],
            filters=[("p_brand", "=", brand)],
        )
        .column("p_partkey")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    keys_ref = ray.put(keys)

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]

    def pass1(b: pa.Table) -> pa.Table:
        bk = ray.get(keys_ref)
        lpk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        if len(bk):
            pos = np.minimum(np.searchsorted(bk, lpk), len(bk) - 1)
            hit = bk[pos] == lpk
        else:
            hit = np.zeros(len(lpk), bool)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)[
            hit
        ].astype(np.int64)
        t = pa.table(
            {
                "p": pa.array(lpk[hit], pa.int64()),
                "sum_qty": pa.array(qty, pa.int64()),
                "cnt": pa.array(np.ones(len(qty), np.int64), pa.int64()),
            }
        )
        g = t.group_by("p").aggregate([("sum_qty", "sum"), ("cnt", "sum")])
        return g.rename_columns(["p", "sum_qty", "cnt"])

    li1 = _read_pq(os.path.join(sf_dir, "lineitem.parquet"), columns=li_cols)
    stats = bounded_group_table_strict(
        li1.map_batches(pass1, batch_format="pyarrow"),
        ["p"],
        [("sum_qty", "sum"), ("cnt", "sum")],
    )
    empty = pa.table(
        {
            "n_lines": pa.array([0], pa.int64()),
            "total_cents": pa.array([0], pa.int64()),
            "avg_yearly": pa.array([0.0], pa.float64()),
        }
    )
    if stats is None or stats.num_rows == 0:
        return rd.from_arrow(empty)
    sp = stats.column("p").to_numpy(zero_copy_only=False)
    order = np.argsort(sp, kind="stable")
    thr_ref = ray.put(
        (
            sp[order],
            stats.column("sum_qty").to_numpy(zero_copy_only=False)[order],
            stats.column("cnt").to_numpy(zero_copy_only=False)[order],
        )
    )

    def pass2(b: pa.Table) -> pa.Table:
        tp, tsum, tcnt = ray.get(thr_ref)
        lpk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(tp, lpk), len(tp) - 1)
        hit = tp[pos] == lpk
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        small = hit & (5 * qty * tcnt[pos] < tsum[pos])
        cents = _cents(b.column("l_extendedprice")).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "n_lines": pa.array([int(small.sum())], pa.int64()),
                "total_cents": pa.array(
                    [int(cents[small].sum())], pa.int64()
                ),
            }
        )

    li2 = _read_pq(os.path.join(sf_dir, "lineitem.parquet"), columns=li_cols)
    tot = bounded_group_table_strict(
        li2.map_batches(pass2, batch_format="pyarrow").map_batches(
            lambda b: b.append_column(
                "g", pa.array([0] * len(b), pa.int8())
            ),
            batch_format="pyarrow",
        ),
        ["g"],
        [("n_lines", "sum"), ("total_cents", "sum")],
    )
    if tot is None or tot.num_rows == 0:
        return rd.from_arrow(empty)
    n = tot.column("n_lines")[0].as_py()
    c = tot.column("total_cents")[0].as_py()
    return rd.from_arrow(
        pa.table(
            {
                "n_lines": pa.array([n], pa.int64()),
                "total_cents": pa.array([c], pa.int64()),
                # same IEEE expression as the SQL `total_cents / 700.0`
                "avg_yearly": pa.array([c / 700.0], pa.float64()),
            }
        )
    )


SMALL_QTY_REVENUE_SQL = """
WITH pq AS (
  SELECT l.l_partkey AS p,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem l JOIN part pt ON l.l_partkey = pt.p_partkey
  WHERE pt.p_brand = 'Brand#1'
  GROUP BY 1
), small AS (
  SELECT CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem l JOIN pq ON l.l_partkey = pq.p
  -- l_quantity < 0.2 * AVG(l_quantity), cross-multiplied exactly
  WHERE 5 * CAST(l.l_quantity AS BIGINT) * pq.cnt < pq.sum_qty
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS total_cents,
       COALESCE(SUM(cents), 0) / 700.0 AS avg_yearly
FROM small
"""


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: global scalar-subquery threshold + anti-join +
# bounded group — rich customers with no orders, per market segment.
# ---------------------------------------------------------------------------

def rich_inactive_customers(
    sf_dir: str,
    cutoff: str = "2000-01-01",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(c_mktsegment, n_cust, bal_cents): customers whose balance
    exceeds the global average POSITIVE balance and who placed NO
    orders on/after ``cutoff``, counted per market segment (Q22 with
    mktsegment standing in for the phone prefix this lake doesn't
    have, and dormancy-since-cutoff for "no orders" — every customer
    in this lake has at least one lifetime order).

    The threshold ``c_acctbal > AVG(c_acctbal) WHERE c_acctbal > 0``
    is applied exactly by cross-multiplication in cents:
    ``bal_cents · cnt > sum_cents``.

    Plan: pass 1 is a two-int scalar reduce over customer. Pass 2 is
    ONE tagged-union anti-join shuffle on custkey — the orders side
    pre-shrunk to batch-distinct custkeys — with per-partition
    (segment, n, bal) partials and a driver-merged final reduce
    (domain = |segments|)."""
    cust_cols = ["c_custkey", "c_acctbal", "c_mktsegment"]
    cust1 = _read_pq(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_acctbal"],
        filter=pc.field("c_acctbal") > 0.0,
    )

    def scalar_partial(b: pa.Table) -> pa.Table:
        cents = _cents(b.column("c_acctbal")).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "sum_cents": pa.array([int(cents.sum())], pa.int64()),
                "cnt": pa.array([len(cents)], pa.int64()),
            }
        )

    sc = bounded_group_table_strict(
        cust1.map_batches(scalar_partial, batch_format="pyarrow").map_batches(
            lambda b: b.append_column(
                "g", pa.array([0] * len(b), pa.int8())
            ),
            batch_format="pyarrow",
        ),
        ["g"],
        [("sum_cents", "sum"), ("cnt", "sum")],
    )
    empty = pa.table(
        {
            "c_mktsegment": pa.array([], pa.string()),
            "n_cust": pa.array([], pa.int64()),
            "bal_cents": pa.array([], pa.int64()),
        }
    )
    if sc is None or sc.num_rows == 0:
        return rd.from_arrow(empty)
    sum_cents = sc.column("sum_cents")[0].as_py()
    cnt = sc.column("cnt")[0].as_py()

    cust = _read_pq(
        os.path.join(sf_dir, "customer.parquet"), columns=cust_cols
    )
    cut = np.datetime64(cutoff, "us")
    orders = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=pc.field("o_orderdate") >= pa.scalar(cut.item()),
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(cust), row_bytes=40
    )

    def tag_cust(b: pa.Table) -> pa.Table:
        cents = _cents(b.column("c_acctbal")).to_numpy(zero_copy_only=False)
        rich = cents * cnt > sum_cents
        t = pa.table(
            {
                "key": pc.cast(b.column("c_custkey"), pa.int64()),
                "seg": b.column("c_mktsegment"),
                "bal": pa.array(cents, pa.int64()),
            }
        ).filter(pa.array(rich))
        n = t.num_rows
        return pa.table(
            {
                "part": _part_of(t.column("key"), n_parts),
                "key": t.column("key"),
                "tag": pa.array(np.ones(n, np.int8)),
                "seg": t.column("seg"),
                "bal": t.column("bal"),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        keys = np.unique(
            b.column("o_custkey").to_numpy(zero_copy_only=False)
        )
        ka = pa.array(keys, pa.int64())
        return pa.table(
            {
                "part": _part_of(ka, n_parts),
                "key": ka,
                "tag": pa.array(np.zeros(len(keys), np.int8)),
                "seg": pa.array([""] * len(keys), pa.string()),
                "bal": pa.array(np.zeros(len(keys), np.int64), pa.int64()),
            }
        )

    both = cust.map_batches(tag_cust, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def merge(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        active = np.unique(key[tag == 0])
        csel = tag == 1
        ck = key[csel]
        if not len(ck):
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "n_cust": pa.array([], pa.int64()),
                    "bal_cents": pa.array([], pa.int64()),
                }
            )
        if len(active):
            pos = np.minimum(np.searchsorted(active, ck), len(active) - 1)
            inactive = active[pos] != ck
        else:
            inactive = np.ones(len(ck), bool)
        seg = (
            g.column("seg").filter(pa.array(csel)).combine_chunks()
        ).filter(pa.array(inactive))
        bal = g.column("bal").to_numpy(zero_copy_only=False)[csel][inactive]
        t = pa.table(
            {
                "c_mktsegment": seg,
                "n_cust": pa.array(np.ones(len(bal), np.int64), pa.int64()),
                "bal_cents": pa.array(bal, pa.int64()),
            }
        )
        m = t.group_by("c_mktsegment").aggregate(
            [("n_cust", "sum"), ("bal_cents", "sum")]
        )
        return m.rename_columns(["c_mktsegment", "n_cust", "bal_cents"])

    per_part = both.groupby("part").map_groups(merge, batch_format="pyarrow")
    agg = bounded_group_reduce(
        per_part,
        ["c_mktsegment"],
        [("n_cust", "sum"), ("bal_cents", "sum")],
    )
    return agg.sort("c_mktsegment")


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: share-of-group predicate — suppliers who shipped
# more than half of a part's total quantity.
# ---------------------------------------------------------------------------

def dominant_suppliers(
    sf_dir: str, num_partitions: int | None = None
) -> rd.Dataset:
    """(l_partkey, l_suppkey, n_supp, supp_qty, part_qty): (part,
    supplier) pairs where the supplier shipped more than 1.5× its FAIR
    SHARE of the part's total line quantity — Q20's
    fraction-of-aggregate predicate, made scale-stable by comparing to
    the fair share ``part_qty / n_supp`` (an absolute share threshold
    empties out as suppliers-per-part grows with SF). Evaluated
    exactly as ``2·supp_qty·n_supp > 3·part_qty`` over integral
    quantities.

    Plan: ONE hashed-partition shuffle on partkey of per-batch
    (partkey, suppkey, qty) partial sums; each partition computes both
    aggregation levels in one sorted pass (reduceat for part totals,
    group_by for pair totals) and applies the predicate locally —
    partials on the wire, at most one emitted row per part."""
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_quantity"],
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(li), row_bytes=32
    )

    def partial(b: pa.Table) -> pa.Table:
        qty = pc.cast(b.column("l_quantity"), pa.int64())
        g = (
            pa.table(
                {
                    "l_partkey": b.column("l_partkey"),
                    "l_suppkey": b.column("l_suppkey"),
                    "qty": qty,
                }
            )
            .group_by(["l_partkey", "l_suppkey"])
            .aggregate([("qty", "sum")])
        )
        g = g.rename_columns(["l_partkey", "l_suppkey", "qty"])
        return pa.table(
            {
                "part": _part_of(g.column("l_partkey"), n_parts),
                "l_partkey": pc.cast(g.column("l_partkey"), pa.int64()),
                "l_suppkey": pc.cast(g.column("l_suppkey"), pa.int64()),
                "qty": g.column("qty"),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        t = (
            g.select(["l_partkey", "l_suppkey", "qty"])
            .group_by(["l_partkey", "l_suppkey"])
            .aggregate([("qty", "sum")])
        )
        t = t.rename_columns(["l_partkey", "l_suppkey", "supp_qty"])
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        sq = t.column("supp_qty").to_numpy(zero_copy_only=False)
        order = np.argsort(pk, kind="stable")
        pk, sq = pk[order], sq[order]
        starts = np.flatnonzero(
            np.concatenate(([True], pk[1:] != pk[:-1]))
        )
        totals = np.add.reduceat(sq, starts)
        counts = np.diff(np.append(starts, len(pk)))
        # map each pair row back to its part total / supplier count
        seg = np.zeros(len(pk), np.int64)
        seg[starts] = 1
        seg = np.cumsum(seg) - 1
        part_qty = totals[seg]
        n_supp = counts[seg]
        dom = 2 * sq * n_supp > 3 * part_qty
        out = pa.table(
            {
                "l_partkey": pa.array(pk[dom], pa.int64()),
                "l_suppkey": t.column("l_suppkey")
                .take(pa.array(order))
                .combine_chunks()
                .filter(pa.array(dom)),
                "n_supp": pa.array(n_supp[dom], pa.int64()),
                "supp_qty": pa.array(sq[dom], pa.int64()),
                "part_qty": pa.array(part_qty[dom], pa.int64()),
            }
        )
        return out

    per_part = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pyarrow")
    )
    # presentation sort: the per-partition results are already final
    # (partitioned BY partkey), so a distributed Sort barrier buys
    # nothing — pull under the guard and sort on the driver; past the
    # guard (≥4M dominant pairs) keep the distributed sort
    import ray as _ray

    tables, pulled = [], 0
    refs = per_part.materialize().to_arrow_refs()
    for r in refs:
        t = _ray.get(r)
        if t.num_rows == 0:
            continue
        tables.append(t)
        pulled += t.num_rows
        if pulled > 4_000_000:
            return rd.from_arrow_refs(refs).sort(
                ["l_partkey", "l_suppkey"]
            )
    if not tables:
        return rd.from_arrow(
            pa.table(
                {
                    "l_partkey": pa.array([], pa.int64()),
                    "l_suppkey": pa.array([], pa.int64()),
                    "n_supp": pa.array([], pa.int64()),
                    "supp_qty": pa.array([], pa.int64()),
                    "part_qty": pa.array([], pa.int64()),
                }
            )
        )
    t = pa.concat_tables(tables)
    idx = pc.sort_indices(
        t,
        sort_keys=[("l_partkey", "ascending"), ("l_suppkey", "ascending")],
    )
    return rd.from_arrow(t.take(idx))


DOMINANT_SUPPLIERS_SQL = """
WITH pair AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
  FROM lineitem GROUP BY 1, 2
), tot AS (
  SELECT l_partkey, CAST(SUM(supp_qty) AS BIGINT) AS part_qty,
         CAST(COUNT(*) AS BIGINT) AS n_supp
  FROM pair GROUP BY 1
)
SELECT pair.l_partkey, pair.l_suppkey, tot.n_supp, pair.supp_qty,
       tot.part_qty
FROM pair JOIN tot ON pair.l_partkey = tot.l_partkey
-- supp share > 1.5x fair share (part_qty / n_supp), cross-multiplied
WHERE 2 * pair.supp_qty * tot.n_supp > 3 * tot.part_qty
ORDER BY pair.l_partkey, pair.l_suppkey
"""


RICH_INACTIVE_SQL = """
WITH avgbal AS (
  SELECT CAST(SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS bal_cents
FROM customer c, avgbal a
-- c_acctbal > AVG(positive c_acctbal), cross-multiplied exactly
WHERE CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) * a.cnt > a.sum_cents
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


# ---------------------------------------------------------------------------
# Market-basket shape: co-purchase pair counts — within-group pair
# expansion (a self-join INSIDE the key, not across keys).
# ---------------------------------------------------------------------------

# pair expansion is quadratic in the basket: one pathological 10⁵-line
# order would emit 5·10⁹ pairs. Baskets above the cap keep their
# first MAX_BASKET_LINES lines (deterministic: partkey order) with a
# logged truncation — the dedup hot-bucket discipline; ordinary
# baskets (≤ dozens of lines at every SF) never hit it.
MAX_BASKET_LINES = 1024


def part_copurchase(
    sf_dir: str,
    min_support: int = 2,
    num_partitions: int | None = None,
    max_basket_lines: int = MAX_BASKET_LINES,
    max_pair_rows: int = 4_000_000,
) -> rd.Dataset:
    """(p1, p2, n): how many line PAIRS put parts p1 < p2 in the same
    order, for pairs with support ≥ ``min_support`` — the
    market-basket co-occurrence count (frequent-itemset mining's
    candidate table). Matches the SQL self-join's multiplicity: a part
    appearing on two lines of one order pairs twice with each
    co-ordered part; equal-part line pairs are excluded (strict <).

    Plan: ONE orderkey-hashed shuffle of (orderkey, partkey) line rows;
    each partition lexsorts by (order, part) once and expands pairs by
    looping over the pair DISTANCE d = 1..max_lines_per_order
    (bounded by the basket size, ~a dozen — never by row count), each
    iteration one vectorized same-segment mask over the whole
    partition. Per-partition pair counts pre-combine before the final
    (p1, p2) groupby; support filters AFTER the global sum."""
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(li), row_bytes=24
    )

    def tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part": _part_of(b.column("l_orderkey"), n_parts),
                "okey": pc.cast(b.column("l_orderkey"), pa.int64()),
                "pkey": pc.cast(b.column("l_partkey"), pa.int64()),
            }
        )

    empty = pa.table(
        {
            "p1": pa.array([], pa.int64()),
            "p2": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def expand(g: pa.Table) -> pa.Table:
        ok = g.column("okey").to_numpy(zero_copy_only=False)
        pk = g.column("pkey").to_numpy(zero_copy_only=False)
        n = len(ok)
        if n < 2:
            return empty
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        seg = np.cumsum(
            np.concatenate(([True], ok[1:] != ok[:-1]))
        ) - 1  # segment id per row
        sizes = np.bincount(seg)
        if sizes.max() > max_basket_lines:
            # cap pathological baskets: keep each order's first
            # max_basket_lines lines (partkey order — deterministic)
            pos_in_seg = np.arange(len(seg)) - np.repeat(
                np.concatenate(([0], np.cumsum(sizes)[:-1])), sizes
            )
            keep = pos_in_seg < max_basket_lines
            n_trunc = int((sizes > max_basket_lines).sum())
            print(
                f"[part_copurchase] {n_trunc} basket(s) truncated to "
                f"{max_basket_lines} lines (max was {int(sizes.max())})"
            )
            ok, pk = ok[keep], pk[keep]
            seg = seg[keep]
        max_k = int(np.bincount(seg).max())
        p1s, p2s = [], []
        for d in range(1, max_k):
            same = seg[d:] == seg[:-d]
            diff = pk[d:] != pk[:-d]
            m = same & diff
            if m.any():
                p1s.append(pk[:-d][m])
                p2s.append(pk[d:][m])
        if not p1s:
            return empty
        t = pa.table(
            {
                "p1": pa.array(np.concatenate(p1s), pa.int64()),
                "p2": pa.array(np.concatenate(p2s), pa.int64()),
            }
        )
        cnt = t.group_by(["p1", "p2"]).aggregate([([], "count_all")])
        cnt = cnt.rename_columns(["p1", "p2", "n"])
        return cnt.set_column(2, "n", pc.cast(cnt.column("n"), pa.int64()))

    per_part = (
        li.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(expand, batch_format="pyarrow")
    )
    # the orderkey exchange above is the ONE distributed barrier; the
    # pair-count merge is per-partition partials (≤ distinct pairs per
    # partition), driver-merged under the 4M guard and a distributed
    # groupby past it — three sequential all-to-all barriers here
    # measured 16.8s of fixed exchange cost on 0.7s of compute
    from .relational import bounded_group_table

    agg = bounded_group_table(
        per_part, ["p1", "p2"], [("n", "sum")], max_rows=max_pair_rows
    )
    if agg is None:
        return rd.from_arrow(empty)
    if isinstance(agg, rd.Dataset):  # > 4M distinct pairs: stay distributed
        return agg.filter(expr=f"n >= {min_support}").sort(["p1", "p2"])
    agg = agg.filter(
        pc.greater_equal(agg.column("n"), pa.scalar(min_support, pa.int64()))
    )
    idx = pc.sort_indices(
        agg, sort_keys=[("p1", "ascending"), ("p2", "ascending")]
    )
    return rd.from_arrow(agg.take(idx))


PART_COPURCHASE_SQL = """
SELECT a.l_partkey AS p1, b.l_partkey AS p2,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem a
JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING COUNT(*) >= 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Association rules over baskets — support / confidence / lift on
# DISTINCT-part co-occurrence (part_copurchase counts line-pair
# multiplicity; rules need basket-level sets). The orderkey-hashed
# exchange makes both the distinct-(order, part) projection and the
# within-order pair expansion partition-local; part supports and the
# basket count are bounded side reduces; the metric arithmetic is
# single divisions of exact int64 counts, expression-identical to
# the oracle.
# ---------------------------------------------------------------------------

def basket_rules(
    sf_dir: str,
    min_support: int = 2,
    num_partitions: int | None = None,
    max_pair_rows: int = 4_000_000,
) -> pa.Table:
    """(p1, p2, n_ab, n_a, n_b, confidence_12, confidence_21, lift)
    for part pairs co-occurring in ≥ min_support baskets."""
    from .relational import bounded_group_table_strict

    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey"],
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(li), row_bytes=24
    )

    def tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part": _part_of(b.column("l_orderkey"), n_parts),
                "okey": pc.cast(b.column("l_orderkey"), pa.int64()),
                "pkey": pc.cast(b.column("l_partkey"), pa.int64()),
            }
        )

    def expand(g: pa.Table) -> pa.Table:
        """Partition-local: distinct (order, part), then per-order
        pair expansion (sorted parts ⇒ p1 < p2 for free), plus the
        partition's (pkey, basket-count) and basket-count partials."""
        empty = pa.table(
            {
                "kind": pa.array([], pa.int64()),
                "p1": pa.array([], pa.int64()),
                "p2": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        ok = g.column("okey").to_numpy(zero_copy_only=False)
        pk = g.column("pkey").to_numpy(zero_copy_only=False)
        key = np.stack([ok, pk], axis=1)
        key = np.unique(key, axis=0)          # distinct (order, part)
        ok, pk = key[:, 0], key[:, 1]
        seg = np.cumsum(np.concatenate(([True], ok[1:] != ok[:-1]))) - 1
        kinds, p1s, p2s, ns = [], [], [], []
        max_k = int(np.bincount(seg).max()) if len(seg) else 0
        pair_1, pair_2 = [], []
        for d in range(1, max_k):
            same = seg[d:] == seg[:-d]
            if same.any():
                pair_1.append(pk[:-d][same])
                pair_2.append(pk[d:][same])
        if pair_1:
            t = pa.table(
                {
                    "p1": pa.array(np.concatenate(pair_1), pa.int64()),
                    "p2": pa.array(np.concatenate(pair_2), pa.int64()),
                }
            )
            cnt = (
                t.group_by(["p1", "p2"]).aggregate([([], "count_all")])
                .rename_columns(["p1", "p2", "n"])
            )
            kinds.append(
                pa.table(
                    {
                        "kind": pa.array([0] * cnt.num_rows, pa.int64()),
                        "p1": cnt.column("p1"),
                        "p2": cnt.column("p2"),
                        "n": pc.cast(cnt.column("n"), pa.int64()),
                    }
                )
            )
        # part supports (kind 1) and the basket count (kind 2)
        up, uc = np.unique(pk, return_counts=True)
        kinds.append(
            pa.table(
                {
                    "kind": pa.array([1] * len(up), pa.int64()),
                    "p1": pa.array(up, pa.int64()),
                    "p2": pa.array(np.zeros(len(up), np.int64), pa.int64()),
                    "n": pa.array(uc.astype(np.int64), pa.int64()),
                }
            )
        )
        n_orders = int(seg[-1]) + 1 if len(seg) else 0
        kinds.append(
            pa.table(
                {
                    "kind": pa.array([2], pa.int64()),
                    "p1": pa.array([0], pa.int64()),
                    "p2": pa.array([0], pa.int64()),
                    "n": pa.array([n_orders], pa.int64()),
                }
            )
        )
        return pa.concat_tables(kinds) if kinds else empty

    per_part = (
        li.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(expand, batch_format="pyarrow")
    )
    agg = bounded_group_table_strict(
        per_part, ["kind", "p1", "p2"], [("n", "sum")],
        max_rows=max_pair_rows,
    )
    empty_out = pa.table(
        {
            "p1": pa.array([], pa.int64()),
            "p2": pa.array([], pa.int64()),
            "n_ab": pa.array([], pa.int64()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "confidence_12": pa.array([], pa.float64()),
            "confidence_21": pa.array([], pa.float64()),
            "lift": pa.array([], pa.float64()),
        }
    )
    if agg is None or not agg.num_rows:
        return empty_out
    kind = agg.column("kind").to_numpy(zero_copy_only=False)
    p1 = agg.column("p1").to_numpy(zero_copy_only=False)
    p2 = agg.column("p2").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    support = dict(zip(p1[kind == 1].tolist(), n[kind == 1].tolist()))
    n_orders = int(n[kind == 2].sum())
    sel = (kind == 0) & (n >= min_support)
    if not sel.any():
        return empty_out
    a, b_, ab = p1[sel], p2[sel], n[sel]
    na = np.array([support[x] for x in a.tolist()], np.int64)
    nb = np.array([support[x] for x in b_.tolist()], np.int64)
    abf, naf, nbf = (
        ab.astype(np.float64), na.astype(np.float64), nb.astype(np.float64)
    )
    nof = np.float64(n_orders)
    return pa.table(
        {
            "p1": pa.array(a, pa.int64()),
            "p2": pa.array(b_, pa.int64()),
            "n_ab": pa.array(ab, pa.int64()),
            "n_a": pa.array(na, pa.int64()),
            "n_b": pa.array(nb, pa.int64()),
            "confidence_12": pa.array(abf / naf, pa.float64()),
            "confidence_21": pa.array(abf / nbf, pa.float64()),
            "lift": pa.array((nof * abf) / (naf * nbf), pa.float64()),
        }
    )


BASKET_RULES_SQL = """
WITH bp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
na AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM bp GROUP BY p),
no AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM bp),
pairs AS (
  SELECT a.p AS p1, b.p AS p2, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM bp a JOIN bp b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
)
SELECT p1, p2, n_ab, na1.n AS n_a, na2.n AS n_b,
  CAST(n_ab AS DOUBLE) / CAST(na1.n AS DOUBLE) AS confidence_12,
  CAST(n_ab AS DOUBLE) / CAST(na2.n AS DOUBLE) AS confidence_21,
  (CAST(no.n AS DOUBLE) * CAST(n_ab AS DOUBLE))
    / (CAST(na1.n AS DOUBLE) * CAST(na2.n AS DOUBLE)) AS lift
FROM pairs
JOIN na na1 ON na1.p = p1
JOIN na na2 ON na2.p = p2
CROSS JOIN no
WHERE n_ab >= 2
"""
