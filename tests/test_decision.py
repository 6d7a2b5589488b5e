"""Edge-case tests for the decision-support batch
(pipelines/decision.py): TPC-H Q5 nation agreement, decorrelated
correlated aggregate, per-group top-k pruning, first/last frames,
histogram-backed PERCENT_RANK / CUME_DIST, exact MAD, and the OLS
moments — boundary semantics the sf-dir oracle sweep can't isolate
(ties, single-row groups, partition invariance, the supplier
broadcast size gate)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsmetacheck_ray.pipelines import decision as dec


def _write(d, name, cols):
    pq.write_table(pa.table(cols), os.path.join(d, f"{name}.parquet"))


def _mini_q5(d):
    """2 regions, 3 nations; customer 1 (nation 0) and 2 (nation 1);
    supplier 10 (nation 0), 11 (nation 1), 12 (nation 2, other region)."""
    _write(d, "region", {
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["ASIA", "EUROPE"], pa.string()),
    })
    _write(d, "nation", {
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
        "n_name": pa.array(["CHINA", "JAPAN", "FRANCE"], pa.string()),
        "n_regionkey": pa.array([0, 0, 1], pa.int32()),
    })
    _write(d, "customer", {
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["a", "b"], pa.string()),
        "c_nationkey": pa.array([0, 1], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
        "c_mktsegment": pa.array(["BUILDING"] * 2, pa.string()),
    })
    _write(d, "supplier", {
        "s_suppkey": pa.array([10, 11, 12], pa.int64()),
        "s_name": pa.array(["s10", "s11", "s12"], pa.string()),
        "s_nationkey": pa.array([0, 1, 2], pa.int32()),
        "s_acctbal": pa.array([0.0, 0.0, 0.0], pa.float64()),
    })
    ts = np.datetime64("1996-06-01", "us").item()
    _write(d, "orders", {
        "o_orderkey": pa.array([100, 101], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderstatus": pa.array(["O", "O"], pa.string()),
        "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
        "o_orderdate": pa.array([ts, ts], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 2, pa.string()),
    })
    # order 100 (cust nation 0): lines from supplier 10 (agrees, kept),
    # 11 (nation 1, disagrees), 12 (out of region). order 101 (nation
    # 1): line from supplier 11 (agrees).
    ship = np.datetime64("1996-07-01", "us").item()
    _write(d, "lineitem", {
        "l_orderkey": pa.array([100, 100, 100, 101], pa.int64()),
        "l_partkey": pa.array([1, 1, 1, 1], pa.int64()),
        "l_suppkey": pa.array([10, 11, 12, 11], pa.int64()),
        "l_linenumber": pa.array([1, 2, 3, 1], pa.int32()),
        "l_quantity": pa.array([1.0] * 4, pa.float64()),
        "l_extendedprice": pa.array([100.0, 50.0, 25.0, 40.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.5], pa.float64()),
        "l_tax": pa.array([0.0] * 4, pa.float64()),
        "l_returnflag": pa.array(["N"] * 4, pa.string()),
        "l_linestatus": pa.array(["O"] * 4, pa.string()),
        "l_shipdate": pa.array([ship] * 4, pa.timestamp("us")),
    })


def test_q5_keeps_only_agreeing_nation_pairs(ray_session, tmp_path):
    d = str(tmp_path)
    _mini_q5(d)
    out = dec.local_supplier_volume(d).to_pandas()
    got = dict(zip(out["n_name"], out["rev_cents"]))
    # CHINA: only the supplier-10 line (10000¢); the supplier-11 line on
    # the same order disagrees with the customer nation, supplier 12 is
    # out of region. JAPAN: 40.0·(1−0.5) = 2000¢.
    assert got == {"CHINA": 10000, "JAPAN": 2000}


def test_q5_date_window_excludes(ray_session, tmp_path):
    d = str(tmp_path)
    _mini_q5(d)
    out = dec.local_supplier_volume(
        d, date_lo="1997-01-01", date_hi="1998-01-01"
    ).to_pandas()
    assert len(out) == 0


def test_q5_supplier_copart_fallback(ray_session, tmp_path, monkeypatch):
    """Past the supplier broadcast gate Q5 falls back to the
    co-partitioned suppkey shuffle and returns identical rows — on the
    planted mini-lake AND (below, via the sf0.001 paths-agree test)
    against the real tables."""
    d = str(tmp_path)
    _mini_q5(d)
    monkeypatch.setattr(dec, "_SUPPLIER_BROADCAST_MAX", 0)
    for parts in (1, 3):
        out = dec.local_supplier_volume(d, num_partitions=parts).to_pandas()
        got = dict(zip(out["n_name"], out["rev_cents"]))
        assert got == {"CHINA": 10000, "JAPAN": 2000}


def _write_orders(d, rows):
    """rows: (okey, custkey, price)."""
    ts = np.datetime64("1996-06-01", "us").item()
    _write(d, "orders", {
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
        "o_orderdate": pa.array([ts] * len(rows), pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(rows), pa.string()),
    })


def test_above_avg_strict_inequality(ray_session, tmp_path):
    d = str(tmp_path)
    # customer 1: 10, 20, 30 → avg 20; only 30 is strictly above.
    # customer 2: single order → never above its own average.
    _write_orders(d, [(1, 1, 0.10), (2, 1, 0.20), (3, 1, 0.30), (4, 2, 5.0)])
    out = dec.orders_above_customer_avg(d).to_pandas()
    assert sorted(out["o_orderkey"]) == [3]
    assert out.iloc[0]["n_orders"] == 3 and out.iloc[0]["sum_cents"] == 60


def test_above_avg_partition_invariance(ray_session, tmp_path):
    d = str(tmp_path)
    rows = [(i, i % 7, float(i % 13) + 0.01) for i in range(1, 300)]
    _write_orders(d, rows)
    a = dec.orders_above_customer_avg(d, num_partitions=1).to_pandas()
    b = dec.orders_above_customer_avg(d, num_partitions=5).to_pandas()
    key = ["o_orderkey"]
    assert a.sort_values(key, ignore_index=True).equals(
        b.sort_values(key, ignore_index=True)
    )


def test_top_k_ties_break_by_orderkey(ray_session, tmp_path):
    d = str(tmp_path)
    # four orders for one customer, all the same price: top-3 must be
    # the three smallest orderkeys with ranks 1..3.
    _write_orders(d, [(4, 1, 2.0), (3, 1, 2.0), (2, 1, 2.0), (1, 1, 2.0)])
    out = dec.top_orders_per_customer(d, k=3).to_pandas().sort_values("rk")
    assert list(out["o_orderkey"]) == [1, 2, 3]
    assert list(out["rk"]) == [1, 2, 3]


def test_top_k_prunes_across_batches(ray_session, tmp_path):
    d = str(tmp_path)
    # 500 orders for customer 1 with ascending prices: global top-2 are
    # the two largest regardless of batch boundaries.
    rows = [(i, 1, i * 0.01) for i in range(1, 501)]
    _write_orders(d, rows)
    out = dec.top_orders_per_customer(d, k=2, num_partitions=3).to_pandas()
    assert sorted(out["o_orderkey"]) == [499, 500]


def _write_events(d, rows):
    """rows: (event_id, ts_us, user_id, event_type, value)."""
    _write(d, "events", {
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })


def test_first_last_tiebreak_on_event_id(ray_session, tmp_path):
    d = str(tmp_path)
    # user 1: two events at the SAME ts — event_id breaks the tie both
    # ways; a third later event is the true last.
    _write_events(d, [
        (5, 1_000_000, 1, "b", 1.0),
        (2, 1_000_000, 1, "a", 1.0),
        (9, 2_000_000, 1, "c", 1.0),
        (7, 3_000_000, 2, "solo", 1.0),
    ])
    out = (
        dec.events_first_last(d).to_pandas().set_index("user_id").sort_index()
    )
    assert out.loc[1, "first_type"] == "a" and out.loc[1, "last_type"] == "c"
    assert out.loc[1, "n_events"] == 3
    # single-event user: first == last
    assert out.loc[2, "first_type"] == "solo" == out.loc[2, "last_type"]
    assert out.loc[2, "first_ts"] == out.loc[2, "last_ts"]


def test_percent_rank_definitions(ray_session, tmp_path):
    d = str(tmp_path)
    # type "t": values 1,2,2,4 → pr = (rank-1)/3, cd = cume/4
    _write_events(d, [
        (1, 1, 1, "t", 0.01),
        (2, 2, 1, "t", 0.02),
        (3, 3, 1, "t", 0.02),
        (4, 4, 1, "t", 0.04),
        (5, 5, 2, "solo", 9.99),
    ])
    out = dec.events_percent_rank(d).to_pandas().set_index("event_id")
    assert out.loc[1, "pr"] == 0.0 and out.loc[1, "cd"] == 0.25
    assert out.loc[2, "pr"] == pytest.approx(1 / 3) and out.loc[2, "cd"] == 0.75
    assert out.loc[3, "pr"] == pytest.approx(1 / 3) and out.loc[3, "cd"] == 0.75
    assert out.loc[4, "pr"] == 1.0 and out.loc[4, "cd"] == 1.0
    # single-row partition: PERCENT_RANK is 0 by definition, CUME_DIST 1
    assert out.loc[5, "pr"] == 0.0 and out.loc[5, "cd"] == 1.0


def test_mad_even_count_interpolates(ray_session, tmp_path):
    d = str(tmp_path)
    # values 1,2,3,4 ¢ → median 2.5¢; devs 1.5,0.5,0.5,1.5 → MAD 1.0¢;
    # outliers need dev > 3¢: none.
    _write_events(d, [
        (1, 1, 1, "t", 0.01),
        (2, 2, 1, "t", 0.02),
        (3, 3, 1, "t", 0.03),
        (4, 4, 1, "t", 0.04),
    ])
    out = dec.events_mad_outliers(d).to_pandas().set_index("event_type")
    assert out.loc["t", "median_cents"] == 2.5
    assert out.loc["t", "mad_cents"] == 1.0
    assert out.loc["t", "n_outliers"] == 0


def test_mad_flags_far_point(ray_session, tmp_path):
    d = str(tmp_path)
    # 5 points at 10¢ and one at 100¢: median 10, MAD 0 → the far point
    # is the only strict outlier (90 > 0).
    rows = [(i, i, 1, "t", 0.10) for i in range(5)] + [(9, 9, 1, "t", 1.00)]
    _write_events(d, rows)
    out = dec.events_mad_outliers(d).to_pandas().set_index("event_type")
    assert out.loc["t", "mad_cents"] == 0.0
    assert out.loc["t", "n_outliers"] == 1


def test_regr_recovers_planted_line(ray_session, tmp_path):
    d = str(tmp_path)
    # y = 3x + 7 exactly (x = epoch day): slope/intercept recovered,
    # r2 == 1.
    day_us = 86_400_000_000
    rows = [
        (i, i * day_us, 1, "t", (3 * i + 7) / 100.0) for i in range(1, 30)
    ]
    _write_events(d, rows)
    out = dec.events_regr_trend(d).to_pandas().set_index("event_type")
    assert out.loc["t", "slope"] == pytest.approx(3.0)
    assert out.loc["t", "intercept"] == pytest.approx(7.0)
    assert out.loc["t", "r2"] == pytest.approx(1.0)


def test_funnel_requires_strict_order(ray_session, tmp_path):
    d = str(tmp_path)
    # user 1: view@1 then purchase@2 → converts with (1, 2)
    # user 2: purchase@1 then view@2 → does NOT convert
    # user 3: view@5 and purchase@5 (same instant) → strict > fails
    # user 4: purchase@1, view@2, purchase@9 → converts with (2, 9)
    _write_events(d, [
        (1, 1, 1, "view", 1.0), (2, 2, 1, "purchase", 1.0),
        (3, 1, 2, "purchase", 1.0), (4, 2, 2, "view", 1.0),
        (5, 5, 3, "view", 1.0), (6, 5, 3, "purchase", 1.0),
        (7, 1, 4, "purchase", 1.0), (8, 2, 4, "view", 1.0),
        (9, 9, 4, "purchase", 1.0),
    ])
    out = dec.user_funnel(d).to_pandas().set_index("user_id").sort_index()
    assert list(out.index) == [1, 4]
    assert out.loc[1, "first_view_ts"].value == 1_000   # 1 us in ns
    assert out.loc[1, "first_purchase_ts"].value == 2_000
    assert out.loc[4, "first_view_ts"].value == 2_000
    assert out.loc[4, "first_purchase_ts"].value == 9_000


def test_retention_cohort_cells(ray_session, tmp_path):
    d = str(tmp_path)
    wk = 604_800_000_000
    # user 1: first week 0, active weeks 0,1,3; user 2: first week 1,
    # active weeks 1,1 (dup),2; user 3: only week 0.
    _write_events(d, [
        (1, 0, 1, "a", 1.0), (2, wk, 1, "a", 1.0), (3, 3 * wk, 1, "a", 1.0),
        (4, wk, 2, "a", 1.0), (5, wk + 5, 2, "a", 1.0), (6, 2 * wk, 2, "a", 1.0),
        (7, 10, 3, "a", 1.0),
    ])
    out = dec.user_retention(d).to_pandas()
    cells = {
        (int(r.cohort_week), int(r.week_offset)): int(r.n_users)
        for r in out.itertuples(index=False)
    }
    assert cells == {
        (0, 0): 2,  # users 1 and 3 in cohort 0 at offset 0
        (0, 1): 1, (0, 3): 1,       # user 1 returns
        (1, 0): 1, (1, 1): 1,       # user 2 (dup week deduped)
    }


def test_retention_packed_range_guard(ray_session, tmp_path):
    d = str(tmp_path)
    _write_events(d, [(1, 0, 1 << 44, "a", 1.0)])
    with pytest.raises(Exception, match="packed-pair range"):
        dec.user_retention(d).to_pandas()


def test_props_stats_skips_missing_and_malformed(ray_session, tmp_path):
    d = str(tmp_path)
    # props: valid k, missing field, malformed JSON fragment, negative
    _write(d, "events", {
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([0, 0, 0, 0], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_type": pa.array(["t", "t", "t", "t"], pa.string()),
        "value": pa.array([1.0] * 4, pa.float64()),
        "props": pa.array(
            ['{"k": 7}', '{"x": 1}', "not json", '{"k": -3}'], pa.string()
        ),
    })
    out = dec.events_props_stats(d).to_pandas().set_index("event_type")
    assert out.loc["t", "n"] == 2
    assert out.loc["t", "sum_k"] == 4
    assert out.loc["t", "min_k"] == -3 and out.loc["t", "max_k"] == 7


def test_props_stats_excludes_floats_and_matches_oracle(ray_session, tmp_path):
    """'k': 7.5 must be EXCLUDED (not truncated to 7) on both sides —
    the integer-field contract."""
    import duckdb

    d = str(tmp_path)
    _write(d, "events", {
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": pa.array([0, 0], pa.timestamp("us")),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array(["t", "t"], pa.string()),
        "value": pa.array([1.0, 1.0], pa.float64()),
        "props": pa.array(['{"k": 7.5}', '{"k": 3}'], pa.string()),
    })
    out = dec.events_props_stats(d).to_pandas().set_index("event_type")
    assert out.loc["t", "n"] == 1 and out.loc["t", "sum_k"] == 3
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    sql = dec.EVENTS_PROPS_SQL
    got = con.execute(sql).fetchall()
    assert got == [("t", 1, 3, 3, 3)]


def test_q5_empty_supplier_returns_empty(ray_session, tmp_path):
    d = str(tmp_path)
    _mini_q5(d)
    # overwrite supplier with an empty (schema-true) table
    _write(d, "supplier", {
        "s_suppkey": pa.array([], pa.int64()),
        "s_name": pa.array([], pa.string()),
        "s_nationkey": pa.array([], pa.int32()),
        "s_acctbal": pa.array([], pa.float64()),
    })
    out = dec.local_supplier_volume(d).to_pandas()
    assert len(out) == 0


def test_forward_fill_leading_nulls_and_segments(ray_session, tmp_path):
    d = str(tmp_path)
    # user 1: leading null (eid 7), then 5¢, then null (eid 14) filled
    # with 5; user 2: all nulls stay null; fills never cross users.
    _write_events(d, [
        (7, 1, 1, "a", 9.99),     # null by eid rule, leading → stays null
        (8, 2, 1, "a", 0.05),
        (14, 3, 1, "a", 9.99),    # null, filled with 5
        (21, 1, 2, "a", 9.99),    # user 2: only nulls
    ])
    out = dec.events_value_fill(d).to_pandas().set_index("event_id")
    assert out.loc[7].isna()["filled_cents"]
    assert out.loc[8, "filled_cents"] == 5
    assert out.loc[14, "filled_cents"] == 5
    assert out.loc[21].isna()["filled_cents"]


def test_sliding_distinct_interval_merge(ray_session, tmp_path):
    d = str(tmp_path)
    hr = 3_600_000_000
    # user 1 active hours 0 and 4 (disjoint trailing-3h coverage:
    # [0,2] and [4,6]); user 2 active hours 1 and 2 (merged [1,4]).
    _write_events(d, [
        (1, 0, 1, "a", 1.0), (2, 4 * hr, 1, "a", 1.0),
        (3, 1 * hr, 2, "a", 1.0), (4, 2 * hr, 2, "a", 1.0),
    ])
    out = (
        dec.events_sliding_distinct_users(d)
        .to_pandas()
        .set_index("hour")["n_users"]
    )
    # anchors = hours with events: 0, 1, 2, 4
    assert out.to_dict() == {0: 1, 1: 2, 2: 2, 4: 2}
    # hour 4: user 1 (present at 4) + user 2 (present at hour 2 ∈ [2,4])


def test_transitions_respect_user_and_order(ray_session, tmp_path):
    d = str(tmp_path)
    # user 1: a → b → a; user 2: b (no transition across users)
    _write_events(d, [
        (1, 1, 1, "a", 1.0), (2, 2, 1, "b", 1.0), (3, 3, 1, "a", 1.0),
        (4, 4, 2, "b", 1.0),
    ])
    out = dec.event_transitions(d).to_pandas()
    got = {
        (r.prev_type, r.next_type): int(r.n) for r in out.itertuples(index=False)
    }
    assert got == {("a", "b"): 1, ("b", "a"): 1}


def test_pareto_tie_semantics(ray_session, tmp_path):
    d = str(tmp_path)
    import duckdb

    # (cents, day) points exercising every tie case:
    # (1000, day0) front; duplicate (1000, day0) also front;
    # (1000, day1) dominated (same cents, later); (900, day0)
    # dominated (lower cents, same day); (900, day-1) front
    # (earlier); (800, day-1) dominated by (900, day-1).
    ts0 = np.datetime64("1996-06-02", "us").item()
    tsm = np.datetime64("1996-06-01", "us").item()
    ts1 = np.datetime64("1996-06-03", "us").item()
    _write(d, "orders", {
        "o_orderkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "o_custkey": pa.array([1] * 6, pa.int64()),
        "o_orderstatus": pa.array(["O"] * 6, pa.string()),
        "o_totalprice": pa.array([10.0, 10.0, 10.0, 9.0, 9.0, 8.0], pa.float64()),
        "o_orderdate": pa.array([ts0, ts0, ts1, ts0, tsm, tsm], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 6, pa.string()),
    })
    out = dec.orders_pareto(d).to_pandas()
    assert sorted(out["o_orderkey"]) == [1, 2, 5]
    # and the NOT EXISTS oracle agrees on this planted corpus
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet'")
    got = sorted(r[0] for r in con.execute(dec.ORDERS_PARETO_SQL).fetchall())
    assert got == [1, 2, 5]


def test_chi2_includes_structural_zero_cells(ray_session, tmp_path):
    d = str(tmp_path)
    import duckdb

    day = 86_400_000_000
    # type a only on Thursday(epoch day 0), type b only on Friday —
    # maximal dependence; the zero cells MUST contribute e to chi2.
    _write_events(d, [
        (1, 0, 1, "a", 1.0), (2, 0, 2, "a", 1.0),
        (3, day, 1, "b", 1.0), (4, day, 2, "b", 1.0),
    ])
    out = dec.events_type_dow_chi2(d).to_pandas()
    # 2x2 with perfect separation: chi2 = N = 4 → 4e9 nano-units
    assert out.iloc[0]["chi2_fp_nano"] == 4_000_000_000 - 1 or \
           out.iloc[0]["chi2_fp_nano"] == 4_000_000_000
    assert out.iloc[0]["dof"] == 1 and out.iloc[0]["n"] == 4
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    got = con.execute(dec.EVENTS_CHI2_SQL).fetchall()
    assert got[0] == tuple(out.iloc[0])


def test_q5_broadcast_and_shuffle_paths_agree(ray_session):
    """local_supplier_volume's size-gated customer plan: the broadcast
    path (default at test scale) and the forced tagged-union shuffle
    path return identical rows on sf0.001."""
    import unittest.mock as mock

    sf = "/root/testdata/sf0.001"
    a = dec.local_supplier_volume(sf).take_all()
    with mock.patch.object(dec, "_Q5_CUST_BROADCAST_MAX", 0):
        b = dec.local_supplier_volume(sf).take_all()
    assert a == b and len(a) > 0
    # the supplier side's fallback (co-partitioned suppkey shuffle)
    # must agree too — alone and combined with the customer fallback
    with mock.patch.object(dec, "_SUPPLIER_BROADCAST_MAX", 0):
        c = dec.local_supplier_volume(sf).take_all()
        with mock.patch.object(dec, "_Q5_CUST_BROADCAST_MAX", 0):
            e = dec.local_supplier_volume(sf).take_all()
    assert a == c and a == e
