"""Decision-support batch 4 (round 4): the remaining classic TPC-H
shapes — waiting suppliers (Q21: the multi-EXISTS / NOT-EXISTS
anti-join decorrelated to per-order supplier counts), min-cost
supplier per part (Q2: correlated scalar-min subquery over a
four-table dimension chain, re-joined on the min), product-type
profit (Q9: wide five-table rollup with a computed cost term), and
national market share (Q8: conditional-share rollup across the full
seven-table chain).

These four are deliberately built ON the generic join API
(pipelines/join.py) rather than bespoke tagged unions: every
big⋈small edge routes through ``join()``'s size gate (broadcast probe
while the right side is bounded, co-partitioned shuffle past it), and
every big⋈big edge ships per-batch pre-combined partials into the
join, so the shuffled volume is partial rows, never raw lines.

The lake has no partsupp table and no l_commitdate/l_receiptdate
columns (TESTDATA.md), so the shapes are adapted onto the columns it
has, preserving the decorrelation structure exactly:

- Q21's "kept waiting" becomes ``max(l_shipdate) per (order, supplier)
  > o_orderdate + late_days`` — same per-order EXISTS/NOT-EXISTS
  counts over supplier groups;
- Q2's ``ps_supplycost`` becomes the minimum observed line price
  (exact cents) per part among the region's suppliers;
- Q9's ``ps_supplycost * l_quantity`` cost term becomes
  ``p_retailprice * l_quantity`` (exact cents either way).

Money math is exact int64 cents; counts are int64; the only float in
any output is Q8's ``mkt_share``, computed as the SAME int/int double
division the oracle performs.

The reference has no relational engine (single-process JSON walk,
``src/cli.py`` + ``utils/pitfall_utils.py``); shapes per SURVEY
§2.5-2.7's join/aggregation axis.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..partitioning import adaptive_partitions, parquet_rows_hint
from .join import join
from .relational import (
    _cents,
    _read_pq,
    bounded_group_reduce,
    bounded_group_table_strict,
)


def _year_np(ts: np.ndarray) -> np.ndarray:
    return ts.astype("M8[Y]").astype(np.int64) + 1970


def _region_nation_keys(sf_dir: str, region: str) -> tuple[np.ndarray, dict]:
    """(sorted nationkeys of ``region``, nationkey → name map for ALL
    nations) — two fixed ≤25-row dimensions, read on the driver."""
    import pyarrow.parquet as pq

    reg = pq.read_table(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    )
    rkeys = {
        r["r_regionkey"] for r in reg.to_pylist() if r["r_name"] == region
    }
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pylist()
    keys = np.asarray(
        sorted(n["n_nationkey"] for n in nat if n["n_regionkey"] in rkeys),
        np.int64,
    )
    names = {n["n_nationkey"]: n["n_name"] for n in nat}
    return keys, names


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who kept orders waiting.
# ---------------------------------------------------------------------------

def waiting_suppliers(
    sf_dir: str,
    late_days: int = 90,
    k: int = 100,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(s_name, numwait): per supplier, the number of 'F' orders where
    that supplier's latest line shipped more than ``late_days`` after
    the order date (late), at least one OTHER supplier contributed a
    line (EXISTS), and NO other supplier was late (NOT EXISTS) —
    TPC-H Q21's double-correlated anti-join, decorrelated to per-order
    supplier/late-supplier counts inside one orderkey shuffle.

    Plan: lineitem pre-combines per batch to (okey, skey) →
    max(shipdate) rows (24 B each); ``join()`` co-partitions them with
    the 'F' orders on okey (orders is the smaller side only at driver
    scale — the gate decides); the per-partition probe then derives
    per-order counts with ONE np.unique + two bincounts and emits
    (skey, numwait) partials. The supplier-name attach is another
    size-gated ``join()``; the final top-k is a per-block
    ``select_k_unstable`` prune into a tiny global sort."""
    orders = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
        filter=(pc.field("o_orderstatus") == "F"),
    )
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(li), row_bytes=24
    )

    def li_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "okey": pc.cast(b.column("l_orderkey"), pa.int64()),
                "skey": pc.cast(b.column("l_suppkey"), pa.int64()),
                "ship": pc.cast(b.column("l_shipdate"), pa.int64()),
            }
        )
        g = t.group_by(["okey", "skey"]).aggregate([("ship", "max")])
        return g.rename_columns(["okey", "skey", "ship"])

    # orders is the LEFT side: a join's output co-locates each left
    # row with ALL its right matches, so every (order, supplier) pair
    # of an order lands in one block and the per-order EXISTS /
    # NOT-EXISTS counts below are complete. (pairs-as-left would
    # scatter an order's pairs across the pair blocks.)
    pairs = li.map_batches(li_partial, batch_format="pyarrow")
    joined = join(
        orders,
        pairs,
        on=("o_orderkey", "okey"),
        how="inner",
        num_partitions=num_partitions,
    )
    late_us = np.int64(late_days) * 86_400_000_000

    def order_counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "skey": pa.array([], pa.int64()),
                    "numwait": pa.array([], pa.int64()),
                }
            )
        okey = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        skey = b.column("skey").to_numpy(zero_copy_only=False)
        ship = b.column("ship").to_numpy(zero_copy_only=False)
        odate = (
            pc.cast(b.column("o_orderdate"), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        # re-combine across source batches: one (okey, skey) row each
        comb = pa.table(
            {
                "okey": pa.array(okey, pa.int64()),
                "skey": pa.array(skey, pa.int64()),
                "ship": pa.array(ship, pa.int64()),
                "odate": pa.array(odate, pa.int64()),
            }
        ).group_by(["okey", "skey", "odate"]).aggregate([("ship", "max")])
        okey = comb.column("okey").to_numpy(zero_copy_only=False)
        skey = comb.column("skey").to_numpy(zero_copy_only=False)
        ship = comb.column("ship_max").to_numpy(zero_copy_only=False)
        odate = comb.column("odate").to_numpy(zero_copy_only=False)
        late = ship > odate + late_us
        _, inv, n_supp = np.unique(
            okey, return_inverse=True, return_counts=True
        )
        n_late = np.bincount(inv, weights=late).astype(np.int64)
        ok = late & (n_supp[inv] > 1) & (n_late[inv] == 1)
        t = pa.table(
            {
                "skey": pa.array(skey[ok], pa.int64()),
                "numwait": pa.array(np.ones(int(ok.sum()), np.int64)),
            }
        )
        g = t.group_by("skey").aggregate([("numwait", "sum")])
        return g.rename_columns(["skey", "numwait"])

    partials = joined.map_batches(order_counts, batch_format="pyarrow")
    counts = bounded_group_reduce(partials, ["skey"], [("numwait", "sum")])

    sup = _read_pq(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
    )
    named = join(counts, sup, on=("skey", "s_suppkey"), how="inner")

    def name_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("s_name").aggregate([("numwait", "sum")])
        return g.rename_columns(["s_name", "numwait"])

    by_name = bounded_group_reduce(
        named.map_batches(name_partial, batch_format="pyarrow"),
        ["s_name"],
        [("numwait", "sum")],
    )

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            b, k, [("numwait", "descending"), ("s_name", "ascending")]
        )
        return b.take(idx)

    return (
        by_name.map_batches(local_topk, batch_format="pyarrow")
        .sort(["numwait", "s_name"], descending=[True, False])
        .limit(k)
    )


WAITING_SUPPLIERS_SQL = """
WITH pairs AS (
  SELECT l_orderkey AS okey, l_suppkey AS skey,
         MAX(l_shipdate) AS maxship, o.o_orderdate AS odate
  FROM lineitem JOIN orders o ON l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY 1, 2, 4
),
flagged AS (
  SELECT okey, skey,
         (maxship > odate + INTERVAL 90 DAY) AS late
  FROM pairs
),
per_order AS (
  SELECT okey, COUNT(*) AS n_supp,
         SUM(CASE WHEN late THEN 1 ELSE 0 END) AS n_late
  FROM flagged GROUP BY okey
)
SELECT s.s_name, COUNT(*) AS numwait
FROM flagged f
JOIN per_order p ON p.okey = f.okey
JOIN supplier s ON s.s_suppkey = f.skey
WHERE f.late AND p.n_supp > 1 AND p.n_late = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: minimum-cost supplier per part.
# ---------------------------------------------------------------------------

def min_cost_supplier(
    sf_dir: str,
    region: str = "EUROPE",
    ptype: str = "LARGE",
    max_size: int = 10,
    k: int = 100,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(s_acctbal_cents, s_name, n_name, p_partkey, p_name, min_cents):
    for each part of ``ptype`` with size ≤ ``max_size``, the suppliers
    in ``region`` achieving the MINIMUM observed line price — TPC-H
    Q2's correlated scalar-min subquery, decorrelated to a per-part
    min re-joined against per-(part, supplier) mins.

    Plan: lineitem semi-joins the filtered part keys and inner-joins
    the region's suppliers (both ``join()``-gated); per-batch (pkey,
    skey) → min(cents) partials reduce once; the per-part global min
    derives from the pair mins (never from raw lines); the equality
    re-join, dimension attaches, and top-k all ride the same gates."""
    nat_keys, nat_names = _region_nation_keys(sf_dir, region)

    pset = _read_pq(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name"],
        filter=(
            (pc.field("p_type") == ptype)
            & (pc.field("p_size") <= max_size)
        ),
    )
    sup = _read_pq(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"],
        filter=pc.field("s_nationkey").isin(
            pa.array(nat_keys, pa.int32())
        ),
    )
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )

    def li_prep(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "pkey": pc.cast(b.column("l_partkey"), pa.int64()),
                "skey": pc.cast(b.column("l_suppkey"), pa.int64()),
                "price": _cents(b.column("l_extendedprice")),
            }
        )
        g = t.group_by(["pkey", "skey"]).aggregate([("price", "min")])
        return g.rename_columns(["pkey", "skey", "price"])

    cand = li.map_batches(li_prep, batch_format="pyarrow")
    cand = join(
        cand,
        pset.map_batches(
            lambda b: b.select(["p_partkey"]), batch_format="pyarrow"
        ),
        on=("pkey", "p_partkey"),
        how="semi",
        num_partitions=num_partitions,
    )
    cand = join(
        cand,
        sup.map_batches(
            lambda b: b.select(["s_suppkey"]), batch_format="pyarrow"
        ),
        on=("skey", "s_suppkey"),
        how="semi",
        num_partitions=num_partitions,
    )
    pair_mins = bounded_group_reduce(
        cand, ["pkey", "skey"], [("price", "min")]
    )

    def pkey_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("pkey").aggregate([("price", "min")])
        return g.rename_columns(["pkey", "min_cents"])

    mins = bounded_group_reduce(
        pair_mins.map_batches(pkey_partial, batch_format="pyarrow"),
        ["pkey"],
        [("min_cents", "min")],
    )
    def keep_min(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(b.column("price"), b.column("min_cents"))
        )

    at_min = join(pair_mins, mins, on="pkey", how="inner").map_batches(
        keep_min, batch_format="pyarrow"
    )
    withsup = join(at_min, sup, on=("skey", "s_suppkey"), how="inner")
    withpart = join(
        withsup, pset, on=("pkey", "p_partkey"), how="inner"
    )

    name_list = [""] * (int(max(nat_names) + 1) if nat_names else 0)
    for kk, v in nat_names.items():
        name_list[kk] = v
    name_arr = pa.array(name_list, pa.string())

    def finish(b: pa.Table) -> pa.Table:
        nk = pc.cast(b.column("s_nationkey"), pa.int64())
        return pa.table(
            {
                "s_acctbal_cents": _cents(b.column("s_acctbal")),
                "s_name": b.column("s_name"),
                "n_name": name_arr.take(nk),
                "p_partkey": b.column("pkey"),
                "p_name": b.column("p_name"),
                "min_cents": b.column("min_cents"),
            }
        )

    out = withpart.map_batches(finish, batch_format="pyarrow")

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            b,
            k,
            [
                ("s_acctbal_cents", "descending"),
                ("n_name", "ascending"),
                ("s_name", "ascending"),
                ("p_partkey", "ascending"),
            ],
        )
        return b.take(idx)

    return (
        out.map_batches(local_topk, batch_format="pyarrow")
        .sort(
            ["s_acctbal_cents", "n_name", "s_name", "p_partkey"],
            descending=[True, False, False, False],
        )
        .limit(k)
    )


MIN_COST_SUPPLIER_SQL = """
WITH pset AS (
  SELECT p_partkey, p_name FROM part
  WHERE p_type = 'LARGE' AND p_size <= 10
),
eur AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
pair_mins AS (
  SELECT l_partkey AS pkey, l_suppkey AS skey,
         MIN(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS pair_min
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM pset)
    AND l_suppkey IN (SELECT s_suppkey FROM eur)
  GROUP BY 1, 2
),
mins AS (SELECT pkey, MIN(pair_min) AS min_cents FROM pair_mins GROUP BY 1)
SELECT CAST(floor(e.s_acctbal * 100 + 0.5) AS BIGINT) AS s_acctbal_cents,
       e.s_name, e.n_name, p.p_partkey, p.p_name, m.min_cents
FROM pair_mins pm
JOIN mins m ON pm.pkey = m.pkey AND pm.pair_min = m.min_cents
JOIN eur e ON e.s_suppkey = pm.skey
JOIN pset p ON p.p_partkey = pm.pkey
ORDER BY s_acctbal_cents DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: product-type profit by nation and year.
# ---------------------------------------------------------------------------

def product_type_profit(
    sf_dir: str,
    needle: str = "red",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(nation, o_year, profit_cents): line profit (revenue cents minus
    retail-cost cents) for parts whose name contains ``needle``,
    rolled up by supplier nation and order year — TPC-H Q9's wide
    five-table rollup.

    Plan: lineitem inner-joins the filtered (pkey → retailprice)
    projection and the (skey → nationkey) projection (both
    ``join()``-gated); profit is computed per line and pre-combined
    per batch by okey; ONE more gated join attaches the order year;
    the final domain is |nations| × years ⇒ driver-merged reduce."""
    _, nat_names = _region_nation_keys(sf_dir, "")

    pset = _read_pq(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_retailprice"],
        filter=pc.match_substring(pc.field("p_name"), needle),
    )
    sup = _read_pq(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount", "l_quantity",
        ],
    )
    orders = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
    )

    def li_prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pkey": pc.cast(b.column("l_partkey"), pa.int64()),
                "skey": pc.cast(b.column("l_suppkey"), pa.int64()),
                "okey": pc.cast(b.column("l_orderkey"), pa.int64()),
                "rev": _cents(
                    pc.multiply(
                        b.column("l_extendedprice"),
                        pc.subtract(
                            pa.scalar(1.0), b.column("l_discount")
                        ),
                    )
                ),
                "qty": b.column("l_quantity"),
            }
        )

    rows = li.map_batches(li_prep, batch_format="pyarrow")
    rows = join(
        rows, pset, on=("pkey", "p_partkey"), how="inner",
        num_partitions=num_partitions,
    )
    rows = join(
        rows, sup, on=("skey", "s_suppkey"), how="inner",
        num_partitions=num_partitions,
    )

    def profit_partial(b: pa.Table) -> pa.Table:
        cost = _cents(
            pc.multiply(b.column("p_retailprice"), b.column("qty"))
        )
        profit = pc.subtract(b.column("rev"), cost)
        t = pa.table(
            {
                "okey": b.column("okey"),
                "snat": pc.cast(b.column("s_nationkey"), pa.int64()),
                "profit": profit,
            }
        )
        g = t.group_by(["okey", "snat"]).aggregate([("profit", "sum")])
        return g.rename_columns(["okey", "snat", "profit"])

    partials = rows.map_batches(profit_partial, batch_format="pyarrow")
    dated = join(
        partials, orders, on=("okey", "o_orderkey"), how="inner",
        num_partitions=num_partitions,
    )

    def year_partial(b: pa.Table) -> pa.Table:
        yr = _year_np(
            b.column("o_orderdate").to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "snat": b.column("snat"),
                "o_year": pa.array(yr, pa.int64()),
                "profit_cents": b.column("profit"),
            }
        )
        g = t.group_by(["snat", "o_year"]).aggregate(
            [("profit_cents", "sum")]
        )
        return g.rename_columns(["snat", "o_year", "profit_cents"])

    agg = bounded_group_reduce(
        dated.map_batches(year_partial, batch_format="pyarrow"),
        ["snat", "o_year"],
        [("profit_cents", "sum")],
    )

    name_list = [""] * (int(max(nat_names) + 1) if nat_names else 0)
    for kk, v in nat_names.items():
        name_list[kk] = v
    name_arr = pa.array(name_list, pa.string())

    def finish(b: pa.Table) -> pa.Table:
        nk = pc.cast(b.column("snat"), pa.int64())
        return pa.table(
            {
                "nation": name_arr.take(nk),
                "o_year": b.column("o_year"),
                "profit_cents": b.column("profit_cents"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["nation", "o_year"], descending=[False, True]
    )


PRODUCT_TYPE_PROFIT_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)
              - CAST(floor(p_retailprice * l_quantity * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS profit_cents
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON o_orderkey = l_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: national market share.
# ---------------------------------------------------------------------------

def nation_market_share(
    sf_dir: str,
    region: str = "AMERICA",
    nation: str = "NATION_1",
    ptype: str = "ECONOMY",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(o_year, nat_cents, total_cents, mkt_share): per order year in
    the window, ``nation``'s share of line revenue for parts of
    ``ptype`` sold to customers in ``region`` — TPC-H Q8.

    Plan: lineitem semi-joins the filtered part keys and inner-joins
    the (skey → nationkey) projection (gated ``join()``s); per-batch
    (okey → total, nat) revenue partials join the window-filtered
    orders (okey → custkey, year), then semi-join the region's
    customer keys on custkey; the final domain is the window's years
    ⇒ driver-merged reduce. The share is the oracle-identical
    int/int double division."""
    nat_keys, nat_names = _region_nation_keys(sf_dir, region)
    target = next(
        (kk for kk, v in nat_names.items() if v == nation), -1
    )

    pset = _read_pq(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey"],
        filter=(pc.field("p_type") == ptype),
    )
    sup = _read_pq(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount",
        ],
    )
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    orders = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pc.field("o_orderdate") >= pa.scalar(lo.item()))
            & (pc.field("o_orderdate") < pa.scalar(hi.item()))
        ),
    )
    cust = _read_pq(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey"],
        filter=pc.field("c_nationkey").isin(
            pa.array(nat_keys, pa.int32())
        ),
    )

    def li_prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pkey": pc.cast(b.column("l_partkey"), pa.int64()),
                "skey": pc.cast(b.column("l_suppkey"), pa.int64()),
                "okey": pc.cast(b.column("l_orderkey"), pa.int64()),
                "rev": _cents(
                    pc.multiply(
                        b.column("l_extendedprice"),
                        pc.subtract(
                            pa.scalar(1.0), b.column("l_discount")
                        ),
                    )
                ),
            }
        )

    rows = li.map_batches(li_prep, batch_format="pyarrow")
    rows = join(
        rows, pset, on=("pkey", "p_partkey"), how="semi",
        num_partitions=num_partitions,
    )
    rows = join(
        rows, sup, on=("skey", "s_suppkey"), how="inner",
        num_partitions=num_partitions,
    )

    def rev_partial(b: pa.Table) -> pa.Table:
        is_nat = pc.cast(
            pc.equal(
                pc.cast(b.column("s_nationkey"), pa.int64()),
                pa.scalar(target, pa.int64()),
            ),
            pa.int64(),
        )
        t = pa.table(
            {
                "okey": b.column("okey"),
                "total": b.column("rev"),
                "nat": pc.multiply(b.column("rev"), is_nat),
            }
        )
        g = t.group_by("okey").aggregate(
            [("total", "sum"), ("nat", "sum")]
        )
        return g.rename_columns(["okey", "total", "nat"])

    partials = rows.map_batches(rev_partial, batch_format="pyarrow")
    dated = join(
        partials, orders, on=("okey", "o_orderkey"), how="inner",
        num_partitions=num_partitions,
    )
    dated = join(
        dated, cust, on=("o_custkey", "c_custkey"), how="semi",
        num_partitions=num_partitions,
    )

    def year_partial(b: pa.Table) -> pa.Table:
        yr = _year_np(
            b.column("o_orderdate").to_numpy(zero_copy_only=False)
        )
        t = pa.table(
            {
                "o_year": pa.array(yr, pa.int64()),
                "nat_cents": b.column("nat"),
                "total_cents": b.column("total"),
            }
        )
        g = t.group_by("o_year").aggregate(
            [("nat_cents", "sum"), ("total_cents", "sum")]
        )
        return g.rename_columns(["o_year", "nat_cents", "total_cents"])

    agg = bounded_group_table_strict(
        dated.map_batches(year_partial, batch_format="pyarrow"),
        ["o_year"],
        [("nat_cents", "sum"), ("total_cents", "sum")],
    )
    if agg is None:
        return rd.from_arrow(
            pa.table(
                {
                    "o_year": pa.array([], pa.int64()),
                    "nat_cents": pa.array([], pa.int64()),
                    "total_cents": pa.array([], pa.int64()),
                    "mkt_share": pa.array([], pa.float64()),
                }
            )
        )
    agg = agg.sort_by("o_year")
    nat_np = agg.column("nat_cents").to_numpy(zero_copy_only=False)
    tot_np = agg.column("total_cents").to_numpy(zero_copy_only=False)
    share = nat_np.astype(np.float64) / tot_np.astype(np.float64)
    return rd.from_arrow(
        agg.append_column("mkt_share", pa.array(share, pa.float64()))
    )


NATION_MARKET_SHARE_SQL = """
WITH rows AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
    CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
         AS BIGINT) AS rev,
    CASE WHEN n_name = 'NATION_1' THEN 1 ELSE 0 END AS is_nat
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')
    AND o_custkey IN (
      SELECT c_custkey FROM customer
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA')
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_year,
  CAST(SUM(rev * is_nat) AS BIGINT) AS nat_cents,
  CAST(SUM(rev) AS BIGINT) AS total_cents,
  CAST(SUM(rev * is_nat) AS DOUBLE) / CAST(SUM(rev) AS DOUBLE)
    AS mkt_share
FROM rows
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item reporting.
# ---------------------------------------------------------------------------

def returned_item_customers(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
    k: int = 20,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(c_custkey, c_name, rev_cents, acctbal_cents, n_name): the top
    ``k`` customers by revenue lost to returned lines ('R' flag) on
    orders placed in the quarter — TPC-H Q10's four-table rollup with
    a top-k head.

    Plan: lineitem pre-combines per batch to (okey → returned-revenue
    cents) partials and ``join()``s the window-filtered orders (okey →
    custkey); per-batch custkey partials reduce once (distributed
    fallback past the bounded-domain gate); the customer dimension
    attaches through the gated ``join()``; nation is a 25-row driver
    map; the head is the per-block select_k prune into a tiny global
    sort. Revenue partials are associative, so no co-location is
    required anywhere."""
    _, nat_names = _region_nation_keys(sf_dir, "")

    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_returnflag") == "R"),
    )
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    orders = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
        filter=(
            (pc.field("o_orderdate") >= pa.scalar(lo.item()))
            & (pc.field("o_orderdate") < pa.scalar(hi.item()))
        ),
    )
    cust = _read_pq(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )

    def li_prep(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "okey": pc.cast(b.column("l_orderkey"), pa.int64()),
                "rev": _cents(
                    pc.multiply(
                        b.column("l_extendedprice"),
                        pc.subtract(
                            pa.scalar(1.0), b.column("l_discount")
                        ),
                    )
                ),
            }
        )
        g = t.group_by("okey").aggregate([("rev", "sum")])
        return g.rename_columns(["okey", "rev"])

    partials = li.map_batches(li_prep, batch_format="pyarrow")
    dated = join(
        partials, orders, on=("okey", "o_orderkey"), how="inner",
        num_partitions=num_partitions,
    )

    def cust_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("o_custkey").aggregate([("rev", "sum")])
        return g.rename_columns(["c_custkey", "rev_cents"])

    by_cust = bounded_group_reduce(
        dated.map_batches(cust_partial, batch_format="pyarrow"),
        ["c_custkey"],
        [("rev_cents", "sum")],
    )
    named = join(by_cust, cust, on="c_custkey", how="inner")

    name_list = [""] * (int(max(nat_names) + 1) if nat_names else 0)
    for kk, v in nat_names.items():
        name_list[kk] = v
    name_arr = pa.array(name_list, pa.string())

    def finish(b: pa.Table) -> pa.Table:
        nk = pc.cast(b.column("c_nationkey"), pa.int64())
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "c_name": b.column("c_name"),
                "rev_cents": b.column("rev_cents"),
                "acctbal_cents": _cents(b.column("c_acctbal")),
                "n_name": name_arr.take(nk),
            }
        )

    out = named.map_batches(finish, batch_format="pyarrow")

    def local_topk(b: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            b, k, [("rev_cents", "descending"), ("c_custkey", "ascending")]
        )
        return b.take(idx)

    return (
        out.map_batches(local_topk, batch_format="pyarrow")
        .sort(["rev_cents", "c_custkey"], descending=[True, False])
        .limit(k)
    )


RETURNED_ITEM_CUSTOMERS_SQL = """
SELECT c_custkey, c_name,
  CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                AS BIGINT)) AS BIGINT) AS rev_cents,
  CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
  n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, acctbal_cents, n_name
ORDER BY rev_cents DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: important stock (fraction-of-global-total filter).
# ---------------------------------------------------------------------------

def important_parts(
    sf_dir: str,
    nation: str = "NATION_3",
    frac_denom: int = 2000,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(p_partkey, value_cents): parts whose line revenue from
    ``nation``'s suppliers exceeds 1/``frac_denom`` of that nation's
    total — TPC-H Q11's group-vs-global-scalar-subquery shape. The
    predicate is the cross-multiplied INTEGER comparison
    ``value · frac_denom > total`` so engine and oracle agree
    bit-for-bit with no float boundary.

    Plan: supplier filters to the nation at the parquet scan and
    semi-``join()``s lineitem; per-batch (pkey → cents) partials
    reduce once; the global total folds from the SAME reduced table
    (never a second pass); the filter and final ordering are
    driver-side on the bounded filtered output, distributed past the
    reduce gate."""
    import pyarrow.parquet as pq

    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    keys = [
        r["n_nationkey"]
        for r in nat.to_pylist()
        if r["n_name"] == nation
    ]
    sup = _read_pq(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey"],
        filter=pc.field("s_nationkey").isin(pa.array(keys, pa.int32())),
    )
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )

    def li_prep(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "pkey": pc.cast(b.column("l_partkey"), pa.int64()),
                "skey": pc.cast(b.column("l_suppkey"), pa.int64()),
                "cents": _cents(b.column("l_extendedprice")),
            }
        )
        return t

    rows = join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        sup,
        on=("skey", "s_suppkey"),
        how="semi",
        num_partitions=num_partitions,
    )

    def pkey_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("pkey").aggregate([("cents", "sum")])
        return g.rename_columns(["p_partkey", "value_cents"])

    vals = bounded_group_table_strict(
        rows.map_batches(pkey_partial, batch_format="pyarrow"),
        ["p_partkey"],
        [("value_cents", "sum")],
    )
    if vals is None:
        return rd.from_arrow(
            pa.table(
                {
                    "p_partkey": pa.array([], pa.int64()),
                    "value_cents": pa.array([], pa.int64()),
                }
            )
        )
    v = vals.column("value_cents").to_numpy(zero_copy_only=False)
    total = int(v.sum())
    keep = v * frac_denom > total
    kept = vals.filter(pa.array(keep))
    order = pc.sort_indices(
        kept,
        sort_keys=[("value_cents", "descending"), ("p_partkey", "ascending")],
    )
    return rd.from_arrow(kept.take(order))


IMPORTANT_PARTS_SQL = """
WITH vals AS (
  SELECT l_partkey AS p_partkey,
    CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
         AS BIGINT) AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY 1
)
SELECT p_partkey, value_cents FROM vals
WHERE value_cents * 2000 > (SELECT SUM(value_cents) FROM vals)
ORDER BY value_cents DESC, p_partkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: order priority checking (EXISTS semi-aggregate).
# ---------------------------------------------------------------------------

def order_priority_check(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
    late_days: int = 60,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(o_orderpriority, order_count): orders placed in the quarter
    that have AT LEAST ONE line shipped more than ``late_days`` after
    the order date, counted per priority — TPC-H Q4's EXISTS
    decorrelated to a per-order any() over co-located line maxima
    (the lake has no commit/receipt dates; lateness vs o_orderdate
    preserves the correlated-EXISTS structure).

    Plan: lineitem pre-combines per batch to (okey → max ship);
    orders ride LEFT through the gated ``join()`` so every order's
    partial maxima land in one block; the per-block pass re-maxes per
    order, tests the strict lateness, and emits bounded (priority,
    count) partials (priorities are a 5-value domain ⇒ driver
    reduce)."""
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    orders = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(
            (pc.field("o_orderdate") >= pa.scalar(lo.item()))
            & (pc.field("o_orderdate") < pa.scalar(hi.item()))
        ),
    )
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    )

    def li_prep(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "okey": pc.cast(b.column("l_orderkey"), pa.int64()),
                "ship": pc.cast(b.column("l_shipdate"), pa.int64()),
            }
        )
        g = t.group_by("okey").aggregate([("ship", "max")])
        return g.rename_columns(["okey", "ship"])

    joined = join(
        orders,
        li.map_batches(li_prep, batch_format="pyarrow"),
        on=("o_orderkey", "okey"),
        how="inner",
        num_partitions=num_partitions,
    )
    late_us = np.int64(late_days) * 86_400_000_000

    def count_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "order_count": pa.array([], pa.int64()),
                }
            )
        okey = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        ship = b.column("ship").to_numpy(zero_copy_only=False)
        odate = pc.cast(
            b.column("o_orderdate"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        late = ship > odate + late_us
        if not late.any():
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "order_count": pa.array([], pa.int64()),
                }
            )
        idx = np.flatnonzero(late)
        # one row per DISTINCT late order (an order's partial maxima
        # can appear once per source batch) — complete per block
        # because orders rode LEFT through the join
        _, first = np.unique(okey[idx], return_index=True)
        sel = pa.array(idx[first], pa.int64())
        t = pa.table(
            {
                "o_orderpriority": b.column("o_orderpriority").take(sel),
                "order_count": pa.array(
                    np.ones(len(first), np.int64), pa.int64()
                ),
            }
        )
        g = t.group_by("o_orderpriority").aggregate(
            [("order_count", "sum")]
        )
        return g.rename_columns(["o_orderpriority", "order_count"])

    agg = bounded_group_reduce(
        joined.map_batches(count_partial, batch_format="pyarrow"),
        ["o_orderpriority"],
        [("order_count", "sum")],
    )
    return agg.sort("o_orderpriority")


ORDER_PRIORITY_CHECK_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: forecasting revenue change (filtered scan aggregate).
# ---------------------------------------------------------------------------

def forecast_revenue_change(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    disc_lo: float = 0.04,
    disc_hi: float = 0.06,
    max_qty: float = 24.0,
) -> rd.Dataset:
    """One row (revenue_cents): the revenue that would be gained if
    discounts in [disc_lo, disc_hi] on small-quantity lines were
    dropped — TPC-H Q6, the pure filtered-scan aggregate. All
    predicates push into the parquet scan; per-batch cents partials
    fold to one driver row (the q1_pricing combiner discipline)."""
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_discount"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(lo.item()))
            & (pc.field("l_shipdate") < pa.scalar(hi.item()))
            & (pc.field("l_discount") >= disc_lo)
            & (pc.field("l_discount") <= disc_hi)
            & (pc.field("l_quantity") < max_qty)
        ),
    )

    def partial(b: pa.Table) -> pa.Table:
        rev = _cents(
            pc.multiply(b.column("l_extendedprice"), b.column("l_discount"))
        )
        s = pc.sum(rev)
        return pa.table(
            {
                "revenue_cents": pa.array(
                    [s.as_py() if s.is_valid else 0], pa.int64()
                )
            }
        )

    agg = bounded_group_table_strict(
        li.map_batches(partial, batch_format="pyarrow").map_batches(
            lambda b: b.append_column(
                "one", pa.array(np.ones(len(b), np.int64))
            ),
            batch_format="pyarrow",
        ),
        ["one"],
        [("revenue_cents", "sum")],
    )
    total = (
        int(agg.column("revenue_cents")[0].as_py())
        if agg is not None and agg.num_rows
        else 0
    )
    return rd.from_arrow(
        pa.table({"revenue_cents": pa.array([total], pa.int64())})
    )


FORECAST_REVENUE_SQL = """
SELECT CAST(COALESCE(SUM(CAST(floor(l_extendedprice * l_discount * 100
                                    + 0.5) AS BIGINT)), 0) AS BIGINT)
  AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.04 AND l_discount <= 0.06
  AND l_quantity < 24
"""
