"""Planted-boundary tests for the round-4 decision-support batch
(pipelines/decision4.py): Q21's EXISTS / NOT-EXISTS edges (single-
supplier orders, two-late-supplier orders, the strict late boundary),
Q2's min-price ties, Q9's negative-profit rounding, Q8's share
arithmetic — plus partition invariance on every query."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsmetacheck_ray.pipelines import decision4 as d4


def _write(d, name, cols):
    pq.write_table(pa.table(cols), os.path.join(d, f"{name}.parquet"))


def _ts(s):
    return np.datetime64(s, "us").item()


def _mini_lake(d):
    _write(d, "region", {
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["ASIA", "EUROPE"], pa.string()),
    })
    _write(d, "nation", {
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
        "n_name": pa.array(["ALPHA", "BETA", "GAMMA"], pa.string()),
        "n_regionkey": pa.array([0, 0, 1], pa.int32()),
    })
    _write(d, "customer", {
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["a", "b"], pa.string()),
        "c_nationkey": pa.array([0, 2], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
        "c_mktsegment": pa.array(["BUILDING"] * 2, pa.string()),
    })
    _write(d, "supplier", {
        "s_suppkey": pa.array([5, 6, 7], pa.int64()),
        "s_name": pa.array(["S5", "S6", "S7"], pa.string()),
        "s_nationkey": pa.array([0, 1, 2], pa.int32()),
        "s_acctbal": pa.array([100.005, 50.0, 75.0], pa.float64()),
    })
    _write(d, "part", {
        "p_partkey": pa.array([11, 12, 13], pa.int64()),
        "p_name": pa.array(["red widget", "blue bolt", "red gear"], pa.string()),
        "p_brand": pa.array(["Brand#1"] * 3, pa.string()),
        "p_type": pa.array(["LARGE", "LARGE", "ECONOMY"], pa.string()),
        "p_size": pa.array([5, 20, 5], pa.int32()),
        "p_retailprice": pa.array([10.0, 20.0, 30.0], pa.float64()),
    })
    # orders 100/101/102 status F; 103 status O (excluded from Q21)
    _write(d, "orders", {
        "o_orderkey": pa.array([100, 101, 102, 103], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 2], pa.int64()),
        "o_orderstatus": pa.array(["F", "F", "F", "O"], pa.string()),
        "o_totalprice": pa.array([1.0] * 4, pa.float64()),
        "o_orderdate": pa.array([_ts("1996-01-01")] * 4, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4, pa.string()),
    })
    # Q21 plants (late = shipped > orderdate + 90d = after 1996-03-31):
    #  order 100: S5 late (ship 1996-06-01), S6 on time → S5 waits.
    #  order 101: S5 late AND S6 late → two late suppliers, nobody.
    #  order 102: S7 late but the ONLY supplier → no EXISTS, nobody.
    #  order 103: S5 late but status O → excluded.
    # boundary: order 100's S6 ships exactly at +90d → NOT late.
    _write(d, "lineitem", {
        "l_orderkey": pa.array(
            [100, 100, 101, 101, 102, 103], pa.int64()),
        "l_partkey": pa.array([11, 12, 11, 12, 13, 11], pa.int64()),
        "l_suppkey": pa.array([5, 6, 5, 6, 7, 5], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 2, 1, 1], pa.int32()),
        "l_quantity": pa.array([1.0, 2.0, 1.0, 1.0, 3.0, 1.0], pa.float64()),
        "l_extendedprice": pa.array(
            [100.0, 50.0, 10.0, 20.0, 30.0, 40.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.5, 0.0, 0.0, 0.0], pa.float64()),
        "l_tax": pa.array([0.0] * 6, pa.float64()),
        "l_returnflag": pa.array(["N"] * 6, pa.string()),
        "l_linestatus": pa.array(["O"] * 6, pa.string()),
        "l_shipdate": pa.array(
            [
                _ts("1996-06-01"),  # 100/S5 late
                _ts("1996-03-31"),  # 100/S6 exactly +90d → NOT late
                _ts("1996-06-01"),  # 101/S5 late
                _ts("1996-07-01"),  # 101/S6 late
                _ts("1996-06-01"),  # 102/S7 late, single supplier
                _ts("1996-06-01"),  # 103/S5 late, status O
            ],
            pa.timestamp("us"),
        ),
    })


def test_waiting_suppliers_exists_not_exists(ray_session, tmp_path):
    d = str(tmp_path)
    _mini_lake(d)
    for parts in (1, 3):
        got = d4.waiting_suppliers(d, num_partitions=parts).take_all()
        assert got == [{"s_name": "S5", "numwait": 1}], got


def test_waiting_suppliers_boundary_is_strict(ray_session, tmp_path):
    d = str(tmp_path)
    _mini_lake(d)
    # ship deltas: order 100 S5 +152d, S6 +90d; order 101 S5 +152d,
    # S6 +182d. At 151: o100 → S5 waits, o101 has TWO late → nobody.
    got = d4.waiting_suppliers(d, late_days=151).take_all()
    assert got == [{"s_name": "S5", "numwait": 1}]
    # at 152 (strict >): o100 nobody late; o101 only S6 late → S6.
    got = d4.waiting_suppliers(d, late_days=152).take_all()
    assert got == [{"s_name": "S6", "numwait": 1}]
    # at 182 (strict >): nothing is late anywhere.
    assert d4.waiting_suppliers(d, late_days=182).take_all() == []


def test_min_cost_supplier_ties_and_filters(ray_session, tmp_path):
    d = str(tmp_path)
    _mini_lake(d)
    # region ASIA, type LARGE size<=10 → part 11 only (12 fails size).
    # Suppliers 5 (ALPHA) and 6 (BETA) are in ASIA; part 11 lines from
    # S5: 10000, 500 (order 101 discounted 10.0*0.5=5.00), 4000 cents
    # wait — discounts: order 101 S5 line extendedprice 10.0 disc 0.5
    # → price = cents(10.0) = 1000 (Q2 uses l_extendedprice, no
    # discount). S5 prices for part 11: 10000, 1000, 4000; S6: none
    # (S6 lines are parts 12). min = 1000 by S5.
    for parts in (1, 2):
        got = d4.min_cost_supplier(
            d, region="ASIA", ptype="LARGE", max_size=10,
            num_partitions=parts,
        ).take_all()
        assert got == [{
            "s_acctbal_cents": 10001, "s_name": "S5", "n_name": "ALPHA",
            "p_partkey": 11, "p_name": "red widget", "min_cents": 1000,
        }], got
    # plant a tie: S6 sells part 11 at the same 10.00 → both rows,
    # ordered by acctbal desc
    li = pq.read_table(os.path.join(d, "lineitem.parquet"))
    extra = pa.table({
        "l_orderkey": pa.array([102], pa.int64()),
        "l_partkey": pa.array([11], pa.int64()),
        "l_suppkey": pa.array([6], pa.int64()),
        "l_linenumber": pa.array([9], pa.int32()),
        "l_quantity": pa.array([1.0], pa.float64()),
        "l_extendedprice": pa.array([10.0], pa.float64()),
        "l_discount": pa.array([0.0], pa.float64()),
        "l_tax": pa.array([0.0], pa.float64()),
        "l_returnflag": pa.array(["N"], pa.string()),
        "l_linestatus": pa.array(["O"], pa.string()),
        "l_shipdate": pa.array([_ts("1996-02-01")], pa.timestamp("us")),
    })
    pq.write_table(
        pa.concat_tables([li, extra]), os.path.join(d, "lineitem.parquet")
    )
    got = d4.min_cost_supplier(
        d, region="ASIA", ptype="LARGE", max_size=10
    ).take_all()
    assert [(r["s_name"], r["min_cents"]) for r in got] == [
        ("S5", 1000), ("S6", 1000),
    ]


def test_product_type_profit_rounding_and_sign(ray_session, tmp_path):
    d = str(tmp_path)
    _mini_lake(d)
    # needle 'red' → parts 11 (retail 10.0) and 13 (retail 30.0).
    # lines on part 11: (o100 S5 100.0 q1) → rev 10000 − cost 1000 =
    # 9000; (o101 S5 10.0 disc .5 q1) → rev 500 − 1000 = −500;
    # (o103 S5 40.0 q1) → 4000 − 1000 = 3000. part 13: (o102 S7 30.0
    # q3) → 3000 − 9000 = −6000. S5=ALPHA year 1996: 9000−500+3000 =
    # 11500; S7=GAMMA 1996: −6000.
    for parts in (1, 3):
        got = d4.product_type_profit(d, num_partitions=parts).take_all()
        assert got == [
            {"nation": "ALPHA", "o_year": 1996, "profit_cents": 11500},
            {"nation": "GAMMA", "o_year": 1996, "profit_cents": -6000},
        ], got


def test_nation_market_share_ints_and_ratio(ray_session, tmp_path):
    d = str(tmp_path)
    _mini_lake(d)
    # region ASIA customers → custkey 1 (nation ALPHA); ECONOMY part →
    # 13, but order 102 belongs to custkey 2 (GAMMA, not ASIA) → no
    # rows → empty result with stable schema.
    out = d4.nation_market_share(
        d, region="ASIA", nation="ALPHA", ptype="ECONOMY"
    )
    assert out.count() == 0
    assert set(out.schema().names) == {
        "o_year", "nat_cents", "total_cents", "mkt_share",
    }
    # LARGE parts sold to custkey 1 in window: orders 100 (part 11 S5
    # ALPHA rev 10000; part 12 S6 BETA rev 5000) and 101 (part 11 S5
    # 500; part 12 S6 2000). ALPHA share 1996 = 10500/17500 = 0.6
    got = d4.nation_market_share(
        d, region="ASIA", nation="ALPHA", ptype="LARGE"
    ).take_all()
    assert got == [{
        "o_year": 1996, "nat_cents": 10500, "total_cents": 17500,
        "mkt_share": 0.6,
    }], got


def test_returned_item_customers_filters_and_topk(ray_session, tmp_path):
    d = str(tmp_path)
    _mini_lake(d)
    # window [1996-01-01, 1996-04-01): all 4 orders are in-window, but
    # only 'R' lines count — none are; expect empty
    assert d4.returned_item_customers(d).take_all() == []
    # flip two lines to 'R': order 100 (cust 1) line of 100.0 and
    # order 102 (cust 2) line of 30.0
    li = pq.read_table(os.path.join(d, "lineitem.parquet"))
    rf = ["R", "N", "N", "N", "R", "N"]
    li = li.set_column(
        li.schema.get_field_index("l_returnflag"),
        "l_returnflag",
        pa.array(rf, pa.string()),
    )
    pq.write_table(li, os.path.join(d, "lineitem.parquet"))
    for parts in (1, 3):
        got = d4.returned_item_customers(
            d, num_partitions=parts
        ).take_all()
        assert [(r["c_custkey"], r["rev_cents"], r["n_name"]) for r in got] == [
            (1, 10000, "ALPHA"), (2, 3000, "GAMMA"),
        ], got
    # k=1 keeps only the top customer
    got = d4.returned_item_customers(d, k=1).take_all()
    assert [r["c_custkey"] for r in got] == [1]


def test_important_parts_integer_threshold(ray_session, tmp_path):
    d = str(tmp_path)
    _mini_lake(d)
    # nation ALPHA suppliers = S5. S5's lines: part 11 prices
    # 10000+1000+4000 = 15000; part 12: none (S5 never sells 12).
    # Wait: lineitem S5 rows are parts 11,11,11 → value(11)=15000,
    # total=15000; with frac_denom=2 the filter is 15000*2 > 15000 ⇒
    # kept. A single part always survives any frac_denom ≥ 2.
    got = d4.important_parts(d, nation="ALPHA", frac_denom=2).take_all()
    assert got == [{"p_partkey": 11, "value_cents": 15000}]
    # BETA suppliers = S6: parts 12 (5000+2000=7000). strictness: with
    # one part and frac_denom=1 the predicate is value*1 > total ⇒
    # 7000 > 7000 is FALSE — strict inequality drops it
    assert d4.important_parts(d, nation="BETA", frac_denom=1).take_all() == []
    # empty nation: no suppliers ⇒ empty with stable schema
    out = d4.important_parts(d, nation="NO_SUCH")
    assert out.count() == 0
    assert out.schema().names == ["p_partkey", "value_cents"]


def test_order_priority_check_exists_boundary(ray_session, tmp_path):
    d = str(tmp_path)
    _mini_lake(d)
    # window covers all orders (1996-01-01). late_days=60: orders with
    # ANY line shipped > +60d: 100 (S5 +152), 101 (+152/+182), 102
    # (+152), 103 (+152). Each counted ONCE despite multiple late
    # lines. All orders are 1-URGENT.
    for parts in (1, 3):
        got = d4.order_priority_check(
            d, late_days=60, num_partitions=parts
        ).take_all()
        assert got == [{"o_orderpriority": "1-URGENT", "order_count": 4}]
    # +90d exactly is NOT late (strict >): order 100's S6 line at +90
    # doesn't matter (its S5 line is later anyway); at 182 nothing
    # qualifies except order 101's +182? strict > drops it too
    assert d4.order_priority_check(d, late_days=182).take_all() == []
    # at 181: only order 101 (+182) qualifies
    got = d4.order_priority_check(d, late_days=181).take_all()
    assert got == [{"o_orderpriority": "1-URGENT", "order_count": 1}]


def test_forecast_revenue_change_filters(ray_session, tmp_path):
    d = str(tmp_path)
    _mini_lake(d)
    # only the o101/S5 line has discount 0.5; with the band set around
    # it and qty < 24, revenue = cents(10.0 * 0.5) = 500
    got = d4.forecast_revenue_change(
        d, disc_lo=0.5, disc_hi=0.5, max_qty=24.0
    ).take_all()
    assert got == [{"revenue_cents": 500}]
    # empty band -> zero row, stable schema
    got = d4.forecast_revenue_change(
        d, disc_lo=0.9, disc_hi=0.95
    ).take_all()
    assert got == [{"revenue_cents": 0}]
