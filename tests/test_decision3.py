"""Edge-case tests for decision-support batch 3
(pipelines/decision3.py): Q7 nation-pair volume (inner-join drop
semantics, window bounds, partition invariance), Q12 urgency split
(line multiplicity), Q15 top supplier (tie keeping), Q17 small-quantity
revenue (exact 0.2·AVG boundary via cross-multiplication), and Q22
rich-inactive customers (strict > threshold, dormancy cutoff)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsmetacheck_ray.pipelines import decision3 as d3


def _write(d, name, cols):
    pq.write_table(pa.table(cols), os.path.join(d, f"{name}.parquet"))


def _ts(s):
    return np.datetime64(s, "us").item()


def _mini_lake(d):
    _write(d, "nation", {
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["ALPHA", "BETA"], pa.string()),
        "n_regionkey": pa.array([0, 0], pa.int32()),
    })
    _write(d, "supplier", {
        "s_suppkey": pa.array([5, 6], pa.int64()),
        "s_name": pa.array(["S5", "S6"], pa.string()),
        "s_nationkey": pa.array([0, 1], pa.int32()),
        "s_acctbal": pa.array([0.0, 0.0], pa.float64()),
    })
    _write(d, "customer", {
        "c_custkey": pa.array([10, 11, 12], pa.int64()),
        "c_name": pa.array(["C10", "C11", "C12"], pa.string()),
        "c_nationkey": pa.array([1, 0, 0], pa.int32()),
        "c_acctbal": pa.array([100.0, 200.0, 300.0], pa.float64()),
        "c_mktsegment": pa.array(["AUTO", "AUTO", "BLDG"], pa.string()),
    })
    _write(d, "orders", {
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 11, 12], pa.int64()),
        "o_orderstatus": pa.array(["F"] * 3, pa.string()),
        "o_totalprice": pa.array([1.0] * 3, pa.float64()),
        "o_orderdate": pa.array(
            [_ts("1996-02-01"), _ts("1996-03-01"), _ts("2000-06-01")],
            pa.timestamp("us"),
        ),
        "o_orderpriority": pa.array(
            ["1-URGENT", "3-MEDIUM", "2-HIGH"], pa.string()
        ),
    })
    # lines: (order 1, supp 5) 1996 in-window ×2, (order 1, supp 6)
    # 1997 in-window, (order 2, supp 5) out-of-window (1995),
    # (order 3, supp 99) unknown supplier => dropped by inner join.
    _write(d, "lineitem", {
        "l_orderkey": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "l_partkey": pa.array([100, 100, 101, 100, 101], pa.int64()),
        "l_suppkey": pa.array([5, 5, 6, 5, 99], pa.int64()),
        "l_linenumber": pa.array([1, 2, 3, 1, 1], pa.int32()),
        "l_quantity": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], pa.float64()),
        "l_extendedprice": pa.array(
            [10.0, 20.0, 30.0, 40.0, 50.0], pa.float64()
        ),
        "l_discount": pa.array([0.0, 0.5, 0.0, 0.0, 0.0], pa.float64()),
        "l_tax": pa.array([0.0] * 5, pa.float64()),
        "l_returnflag": pa.array(["N"] * 5, pa.string()),
        "l_linestatus": pa.array(["O", "F", "O", "O", "F"], pa.string()),
        "l_shipdate": pa.array(
            [
                _ts("1996-06-01"), _ts("1996-07-01"), _ts("1997-01-15"),
                _ts("1995-06-01"), _ts("1996-08-01"),
            ],
            pa.timestamp("us"),
        ),
    })


def test_nation_volume_joins_window_partitions(ray_session, tmp_path):
    _mini_lake(str(tmp_path))
    # order 1 -> cust 10 (BETA). supp 5 = ALPHA: 1000 + 1000 cents
    # (20.0 at 50% discount) in 1996; supp 6 = ALPHA->BETA? supp 6 is
    # BETA, cust 10 BETA: 3000 cents in 1997. order 2's line is out of
    # window; order 3's line has no supplier row.
    want = [
        {"supp_nation": "ALPHA", "cust_nation": "BETA",
         "l_year": 1996, "rev_cents": 2000},
        {"supp_nation": "BETA", "cust_nation": "BETA",
         "l_year": 1997, "rev_cents": 3000},
    ]
    for parts in (1, 4):
        got = d3.nation_volume(
            str(tmp_path), num_partitions=parts
        ).take_all()
        assert got == want, got
    # force the distributed customer-join path (the at-scale plan)
    # and require the identical result
    import unittest.mock as mock

    with mock.patch.object(d3, "_NV_CUST_BROADCAST_MAX", 0):
        got = d3.nation_volume(str(tmp_path), num_partitions=3).take_all()
        assert got == want, got
    # force the co-partitioned supplier-join path (past the supplier
    # broadcast gate), alone and combined with the customer fallback
    with mock.patch.object(d3, "_SUPPLIER_BROADCAST_MAX", 0):
        got = d3.nation_volume(str(tmp_path), num_partitions=3).take_all()
        assert got == want, got
        with mock.patch.object(d3, "_NV_CUST_BROADCAST_MAX", 0):
            got = d3.nation_volume(
                str(tmp_path), num_partitions=2
            ).take_all()
            assert got == want, got


def test_urgent_lines_by_status_multiplicity(ray_session, tmp_path):
    _mini_lake(str(tmp_path))
    # window 1996: order 1 lines 1,2 (URGENT -> urgent), order 3 line
    # (2-HIGH -> urgent, status F), order 2's line shipped 1995 (out).
    for parts in (1, 3):
        got = d3.urgent_lines_by_status(
            str(tmp_path),
            date_lo="1996-01-01",
            date_hi="1997-01-01",
            num_partitions=parts,
        ).take_all()
        assert got == [
            {"l_linestatus": "F", "n_urgent": 2, "n_other": 0},
            {"l_linestatus": "O", "n_urgent": 1, "n_other": 0},
        ], got


def test_top_supplier_keeps_ties(ray_session, tmp_path):
    _mini_lake(str(tmp_path))
    # Window covering 1996 only: supp 5 has 1000+1000=2000 cents,
    # supp 99 (no supplier row — still a revenue key) 5000 cents.
    # Widen: pick window [1996-01-01, 1996-07-02) => supp5: line1
    # (1000) + line2 (1000) = 2000; supp99's line ships 1996-08-01,
    # outside. Single winner supp 5.
    got = d3.top_supplier(
        str(tmp_path), date_lo="1996-01-01", date_hi="1996-07-02"
    ).take_all()
    assert got == [{"s_suppkey": 5, "s_name": "S5", "total_cents": 2000}]
    # A window where two suppliers tie: add supp 6's 1997 line (3000)
    # vs nothing else -> single; instead test tie by equal revenue:
    # [1997-01-01, 1998-01-01) has only supp 6.
    got = d3.top_supplier(
        str(tmp_path), date_lo="1997-01-01", date_hi="1998-01-01"
    ).take_all()
    assert got == [{"s_suppkey": 6, "s_name": "S6", "total_cents": 3000}]


def test_top_supplier_tie_rows(ray_session, tmp_path):
    d = str(tmp_path)
    _write(d, "supplier", {
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["A", "B", "C"], pa.string()),
        "s_nationkey": pa.array([0, 0, 0], pa.int32()),
        "s_acctbal": pa.array([0.0] * 3, pa.float64()),
    })
    _write(d, "lineitem", {
        "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_partkey": pa.array([1] * 4, pa.int64()),
        "l_suppkey": pa.array([1, 2, 2, 3], pa.int64()),
        "l_linenumber": pa.array([1] * 4, pa.int32()),
        "l_quantity": pa.array([1.0] * 4, pa.float64()),
        "l_extendedprice": pa.array([30.0, 10.0, 20.0, 5.0], pa.float64()),
        "l_discount": pa.array([0.0] * 4, pa.float64()),
        "l_tax": pa.array([0.0] * 4, pa.float64()),
        "l_returnflag": pa.array(["N"] * 4, pa.string()),
        "l_linestatus": pa.array(["O"] * 4, pa.string()),
        "l_shipdate": pa.array([_ts("1996-02-01")] * 4, pa.timestamp("us")),
    })
    got = d3.top_supplier(d, date_lo="1996-01-01", date_hi="1996-04-01")
    assert got.take_all() == [
        {"s_suppkey": 1, "s_name": "A", "total_cents": 3000},
        {"s_suppkey": 2, "s_name": "B", "total_cents": 3000},
    ]


def test_top_supplier_unknown_suppkey_drops(ray_session, tmp_path):
    """A max-revenue suppkey with no supplier row drops at the name
    join (SQL inner-join semantics) — but still participates in the
    global MAX, so a lesser known supplier does NOT get promoted."""
    d = str(tmp_path)
    _write(d, "supplier", {
        "s_suppkey": pa.array([1], pa.int64()),
        "s_name": pa.array(["A"], pa.string()),
        "s_nationkey": pa.array([0], pa.int32()),
        "s_acctbal": pa.array([0.0], pa.float64()),
    })
    _write(d, "lineitem", {
        "l_orderkey": pa.array([1, 2], pa.int64()),
        "l_partkey": pa.array([1, 1], pa.int64()),
        "l_suppkey": pa.array([1, 99], pa.int64()),  # 99 unknown, max rev
        "l_linenumber": pa.array([1, 1], pa.int32()),
        "l_quantity": pa.array([1.0, 1.0], pa.float64()),
        "l_extendedprice": pa.array([10.0, 50.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0], pa.float64()),
        "l_tax": pa.array([0.0, 0.0], pa.float64()),
        "l_returnflag": pa.array(["N", "N"], pa.string()),
        "l_linestatus": pa.array(["O", "O"], pa.string()),
        "l_shipdate": pa.array([_ts("1996-02-01")] * 2, pa.timestamp("us")),
    })
    got = d3.top_supplier(d, date_lo="1996-01-01", date_hi="1996-04-01")
    assert got.take_all() == []


def test_small_qty_revenue_exact_boundary(ray_session, tmp_path):
    d = str(tmp_path)
    _write(d, "part", {
        "p_partkey": pa.array([100, 200], pa.int64()),
        "p_name": pa.array(["x", "y"], pa.string()),
        "p_brand": pa.array(["Brand#1", "Brand#2"], pa.string()),
        "p_type": pa.array(["T", "T"], pa.string()),
        "p_size": pa.array([1, 1], pa.int32()),
        "p_retailprice": pa.array([1.0, 1.0], pa.float64()),
    })
    # part 100 quantities: 1, 9 -> sum 10, cnt 2, 0.2*avg = 1.0.
    # qty 1 is NOT < 1.0 (strict) -> excluded. Add qty 0? quantities
    # start at 1 in the lake; use sum 15, cnt 2 (qty 1 and 14):
    # 0.2*avg = 1.5 -> qty 1 counts (price 7.0 -> 700 cents).
    # part 200 is the wrong brand -> never counted.
    _write(d, "lineitem", {
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_partkey": pa.array([100, 100, 200], pa.int64()),
        "l_suppkey": pa.array([1] * 3, pa.int64()),
        "l_linenumber": pa.array([1] * 3, pa.int32()),
        "l_quantity": pa.array([1.0, 14.0, 1.0], pa.float64()),
        "l_extendedprice": pa.array([7.0, 100.0, 9.0], pa.float64()),
        "l_discount": pa.array([0.0] * 3, pa.float64()),
        "l_tax": pa.array([0.0] * 3, pa.float64()),
        "l_returnflag": pa.array(["N"] * 3, pa.string()),
        "l_linestatus": pa.array(["O"] * 3, pa.string()),
        "l_shipdate": pa.array([_ts("1996-02-01")] * 3, pa.timestamp("us")),
    })
    got = d3.small_qty_revenue(d, brand="Brand#1").take_all()
    assert got == [
        {"n_lines": 1, "total_cents": 700, "avg_yearly": 700 / 700.0}
    ]
    # exact boundary: quantities 1 and 9 -> 0.2*avg = 1.0; 5*1*2 == 10
    # is NOT < 10 -> zero lines.
    _write(d, "lineitem", {
        "l_orderkey": pa.array([1, 2], pa.int64()),
        "l_partkey": pa.array([100, 100], pa.int64()),
        "l_suppkey": pa.array([1] * 2, pa.int64()),
        "l_linenumber": pa.array([1] * 2, pa.int32()),
        "l_quantity": pa.array([1.0, 9.0], pa.float64()),
        "l_extendedprice": pa.array([7.0, 100.0], pa.float64()),
        "l_discount": pa.array([0.0] * 2, pa.float64()),
        "l_tax": pa.array([0.0] * 2, pa.float64()),
        "l_returnflag": pa.array(["N"] * 2, pa.string()),
        "l_linestatus": pa.array(["O"] * 2, pa.string()),
        "l_shipdate": pa.array([_ts("1996-02-01")] * 2, pa.timestamp("us")),
    })
    got = d3.small_qty_revenue(d, brand="Brand#1").take_all()
    assert got == [{"n_lines": 0, "total_cents": 0, "avg_yearly": 0.0}]


def test_dominant_suppliers_fair_share_boundary(ray_session, tmp_path):
    d = str(tmp_path)
    # part 100: supp 1 ships 10 of 12 with 2 suppliers ->
    # 2*10*2=40 > 3*12=36 (dominant); supp 2: 8 > 36 false.
    # part 200: supp 1 ships exactly 1.5x fair share (3 of 4, 2
    # suppliers): 2*3*2=12 > 3*4=12 is FALSE (strict) -> excluded.
    _write(d, "lineitem", {
        "l_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "l_partkey": pa.array([100, 100, 100, 200, 200], pa.int64()),
        "l_suppkey": pa.array([1, 1, 2, 1, 2], pa.int64()),
        "l_linenumber": pa.array([1] * 5, pa.int32()),
        "l_quantity": pa.array([4.0, 6.0, 2.0, 3.0, 1.0], pa.float64()),
        "l_extendedprice": pa.array([1.0] * 5, pa.float64()),
        "l_discount": pa.array([0.0] * 5, pa.float64()),
        "l_tax": pa.array([0.0] * 5, pa.float64()),
        "l_returnflag": pa.array(["N"] * 5, pa.string()),
        "l_linestatus": pa.array(["O"] * 5, pa.string()),
        "l_shipdate": pa.array([_ts("1996-02-01")] * 5, pa.timestamp("us")),
    })
    for parts in (1, 3):
        got = d3.dominant_suppliers(d, num_partitions=parts).take_all()
        assert got == [
            {"l_partkey": 100, "l_suppkey": 1, "n_supp": 2,
             "supp_qty": 10, "part_qty": 12}
        ], got


def test_part_copurchase_multiplicity(ray_session, tmp_path):
    d = str(tmp_path)
    # order 1: part 5 on TWO lines + part 7 -> pair (5,7) twice (the
    # SQL self-join multiplicity); the (5,5) line pair is excluded by
    # the strict <. order 2: (5,7) once more -> n=3. order 3: (7,9)
    # once -> below min_support=2, filtered.
    _write(d, "lineitem", {
        "l_orderkey": pa.array([1, 1, 1, 2, 2, 3, 3], pa.int64()),
        "l_partkey": pa.array([5, 5, 7, 7, 5, 7, 9], pa.int64()),
        "l_suppkey": pa.array([1] * 7, pa.int64()),
        "l_linenumber": pa.array([1] * 7, pa.int32()),
        "l_quantity": pa.array([1.0] * 7, pa.float64()),
        "l_extendedprice": pa.array([1.0] * 7, pa.float64()),
        "l_discount": pa.array([0.0] * 7, pa.float64()),
        "l_tax": pa.array([0.0] * 7, pa.float64()),
        "l_returnflag": pa.array(["N"] * 7, pa.string()),
        "l_linestatus": pa.array(["O"] * 7, pa.string()),
        "l_shipdate": pa.array([_ts("1996-02-01")] * 7, pa.timestamp("us")),
    })
    for parts in (1, 3):
        got = d3.part_copurchase(d, num_partitions=parts).take_all()
        assert got == [{"p1": 5, "p2": 7, "n": 3}], got


def test_part_copurchase_hot_basket_cap(ray_session, tmp_path):
    """A pathological giant basket is truncated to its first
    max_basket_lines lines (partkey order) instead of expanding
    quadratically; normal baskets are untouched."""
    d = str(tmp_path)
    n_big = 50
    okeys = [1] * n_big + [2, 2, 2]
    pkeys = list(range(100, 100 + n_big)) + [7, 9, 7]
    _write(d, "lineitem", {
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(pkeys, pa.int64()),
        "l_suppkey": pa.array([1] * len(okeys), pa.int64()),
        "l_linenumber": pa.array([1] * len(okeys), pa.int32()),
        "l_quantity": pa.array([1.0] * len(okeys), pa.float64()),
        "l_extendedprice": pa.array([1.0] * len(okeys), pa.float64()),
        "l_discount": pa.array([0.0] * len(okeys), pa.float64()),
        "l_tax": pa.array([0.0] * len(okeys), pa.float64()),
        "l_returnflag": pa.array(["N"] * len(okeys), pa.string()),
        "l_linestatus": pa.array(["O"] * len(okeys), pa.string()),
        "l_shipdate": pa.array(
            [_ts("1996-02-01")] * len(okeys), pa.timestamp("us")
        ),
    })
    # cap 10: order 1 keeps parts 100..109 -> C(10,2)=45 pairs each
    # n=1 (below min_support=2); order 2's (7,9) pairs twice (7 twice).
    got = d3.part_copurchase(
        d, min_support=2, num_partitions=1, max_basket_lines=10
    ).take_all()
    assert got == [{"p1": 7, "p2": 9, "n": 2}], got
    # uncapped: order 1 contributes C(50,2) distinct single-count
    # pairs, still filtered by support; result identical
    got = d3.part_copurchase(d, min_support=2, num_partitions=1).take_all()
    assert got == [{"p1": 7, "p2": 9, "n": 2}], got


def test_rich_inactive_threshold_and_cutoff(ray_session, tmp_path):
    d = str(tmp_path)
    # balances (cents): 10000, 20000, 30000, -500 (ignored in avg).
    # avg over positive = 20000. Strict >: only cust 12 (30000).
    _write(d, "customer", {
        "c_custkey": pa.array([10, 11, 12, 13], pa.int64()),
        "c_name": pa.array(["a", "b", "c", "d"], pa.string()),
        "c_nationkey": pa.array([0] * 4, pa.int32()),
        "c_acctbal": pa.array([100.0, 200.0, 300.0, -5.0], pa.float64()),
        "c_mktsegment": pa.array(["AUTO", "AUTO", "BLDG", "AUTO"], pa.string()),
    })
    # cust 12 ordered only BEFORE the cutoff -> inactive; cust 11
    # ordered after -> active (but below threshold anyway).
    _write(d, "orders", {
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([12, 11], pa.int64()),
        "o_orderstatus": pa.array(["F", "F"], pa.string()),
        "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
        "o_orderdate": pa.array(
            [_ts("1999-06-01"), _ts("2000-06-01")], pa.timestamp("us")
        ),
        "o_orderpriority": pa.array(["5-LOW", "5-LOW"], pa.string()),
    })
    for parts in (1, 3):
        got = d3.rich_inactive_customers(
            d, cutoff="2000-01-01", num_partitions=parts
        ).take_all()
        assert got == [
            {"c_mktsegment": "BLDG", "n_cust": 1, "bal_cents": 30000}
        ], got
    # boundary: bal == avg is NOT counted. custs 10/11 at exactly avg
    # when all equal -> empty result.
    _write(d, "customer", {
        "c_custkey": pa.array([10, 11], pa.int64()),
        "c_name": pa.array(["a", "b"], pa.string()),
        "c_nationkey": pa.array([0] * 2, pa.int32()),
        "c_acctbal": pa.array([100.0, 100.0], pa.float64()),
        "c_mktsegment": pa.array(["AUTO", "AUTO"], pa.string()),
    })
    got = d3.rich_inactive_customers(d, cutoff="2000-01-01").take_all()
    assert got == []


def test_small_qty_revenue_copart_fallback(ray_session):
    """Past the brand broadcast gate small_qty_revenue restructures
    onto the generic join()'s co-partitioned path and returns the
    identical row."""
    import unittest.mock as mock

    sf = "/root/testdata/sf0.001"
    a = d3.small_qty_revenue(sf).take_all()
    with mock.patch.object(d3, "_BRAND_BROADCAST_MAX", 0):
        b = d3.small_qty_revenue(sf).take_all()
    assert a == b and len(a) == 1


def test_basket_rules_planted(ray_session, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from rsmetacheck_ray.pipelines.decision3 import basket_rules

    # 4 baskets: {1,2} x3 (one with a REPEATED line of part 1 — the
    # distinct projection must collapse it), {1,3} x1.
    rows = [
        (100, 1), (100, 2), (100, 1),
        (101, 1), (101, 2),
        (102, 1), (102, 2),
        (103, 1), (103, 3),
    ]
    t = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "lineitem.parquet"))
    outs = []
    for parts in (1, 3):
        res = basket_rules(str(tmp_path), num_partitions=parts).to_pandas()
        outs.append(res.sort_values(["p1", "p2"], ignore_index=True))
    assert outs[0].equals(outs[1])
    got = outs[0].set_index(["p1", "p2"])
    r = got.loc[(1, 2)]
    assert r["n_ab"] == 3 and r["n_a"] == 4 and r["n_b"] == 3
    assert r["confidence_12"] == 3 / 4.0
    assert r["confidence_21"] == 1.0
    assert r["lift"] == (4.0 * 3.0) / (4.0 * 3.0)  # == 1.0
    # pair (1,3) has support 1 < min_support: excluded
    assert (1, 3) not in got.index
