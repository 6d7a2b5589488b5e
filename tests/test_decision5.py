"""Planted-boundary tests for the round-4 continuation batch
(pipelines/decision5.py): cohort month truncation and same-month
dedup, the sweep-line +1/−1 boundary (open through the close day, −1
the day after), HHI monopoly/even-split exactness, and inter-arrival
gap attribution (later event's type, event_id tie order) — plus
partition invariance on every query."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsmetacheck_ray.pipelines import decision5 as d5


def _write(d, name, cols):
    pq.write_table(pa.table(cols), os.path.join(d, f"{name}.parquet"))


def _ts(s):
    return np.datetime64(s, "us").item()


def _month(s):
    return int(np.datetime64(s, "M").astype(np.int64))


def _orders(d, rows):
    keys, custs, dates = zip(*rows)
    _write(d, "orders", {
        "o_orderkey": pa.array(keys, pa.int64()),
        "o_custkey": pa.array(custs, pa.int64()),
        "o_orderstatus": pa.array(["F"] * len(rows), pa.string()),
        "o_totalprice": pa.array([1.0] * len(rows), pa.float64()),
        "o_orderdate": pa.array([_ts(x) for x in dates], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(rows), pa.string()),
    })


def _lineitem(d, rows):
    """rows: (orderkey, partkey, suppkey, extendedprice, discount, ship)."""
    ok, pk, sk, ep, disc, ship = zip(*rows)
    n = len(rows)
    _write(d, "lineitem", {
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
        "l_suppkey": pa.array(sk, pa.int64()),
        "l_linenumber": pa.array(list(range(1, n + 1)), pa.int32()),
        "l_quantity": pa.array([1.0] * n, pa.float64()),
        "l_extendedprice": pa.array(ep, pa.float64()),
        "l_discount": pa.array(disc, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": pa.array(["N"] * n, pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
        "l_shipdate": pa.array([_ts(x) for x in ship], pa.timestamp("us")),
    })


# ---------------------------------------------------------------------------
# customer_cohorts
# ---------------------------------------------------------------------------

def test_customer_cohorts_dedup_and_offsets(ray_session, tmp_path):
    d = str(tmp_path)
    # cust 1: first 1996-01, again twice in 1996-03 (same-month dedup),
    # and 1996-01-31 (same cohort month as the first → offset 0 dedup).
    # cust 2: first 1996-03 only. cust 3: 1996-01 and 1996-02.
    _orders(d, [
        (1, 1, "1996-01-05"), (2, 1, "1996-01-31"),
        (3, 1, "1996-03-02"), (4, 1, "1996-03-30"),
        (5, 2, "1996-03-15"),
        (6, 3, "1996-01-20"), (7, 3, "1996-02-01"),
    ])
    m0 = _month("1996-01")
    m2 = _month("1996-03")
    want = [
        {"cohort_month": m0, "month_offset": 0, "n_customers": 2},
        {"cohort_month": m0, "month_offset": 1, "n_customers": 1},
        {"cohort_month": m0, "month_offset": 2, "n_customers": 1},
        {"cohort_month": m2, "month_offset": 0, "n_customers": 1},
    ]
    for parts in (1, 3):
        got = d5.customer_cohorts(d, num_partitions=parts).take_all()
        assert got == want, got


# ---------------------------------------------------------------------------
# orders_backlog
# ---------------------------------------------------------------------------

def test_orders_backlog_sweep_line(ray_session, tmp_path):
    d = str(tmp_path)
    # order 10: open 01-01 → 01-03 (two lines, max ship wins)
    # order 11: open 01-02 → 01-02 (same-day close: open exactly 1 day)
    # order 12: in orders but has NO lineitem rows → drops (inner join)
    _orders(d, [
        (10, 1, "1996-01-01"), (11, 1, "1996-01-02"), (12, 2, "1996-01-01"),
    ])
    _lineitem(d, [
        (10, 1, 1, 10.0, 0.0, "1996-01-02"),
        (10, 1, 1, 10.0, 0.0, "1996-01-03"),
        (11, 1, 1, 10.0, 0.0, "1996-01-02"),
    ])
    want = [
        {"day": _ts("1996-01-01"), "open_orders": 1},   # 10 opens
        {"day": _ts("1996-01-02"), "open_orders": 2},   # 11 opens
        {"day": _ts("1996-01-03"), "open_orders": 1},   # 11 closed yesterday
        {"day": _ts("1996-01-04"), "open_orders": 0},   # 10 closed yesterday
    ]
    for parts in (1, 3):
        got = d5.orders_backlog(d, num_partitions=parts).take_all()
        assert got == want, got


# ---------------------------------------------------------------------------
# part_brand_hhi
# ---------------------------------------------------------------------------

def test_part_brand_hhi_monopoly_and_even_split(ray_session, tmp_path):
    d = str(tmp_path)
    _write(d, "part", {
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_name": pa.array(["a", "b", "c"], pa.string()),
        "p_brand": pa.array(["Brand#1", "Brand#2", "Brand#2"], pa.string()),
        "p_type": pa.array(["T"] * 3, pa.string()),
        "p_size": pa.array([1, 1, 1], pa.int32()),
        "p_retailprice": pa.array([1.0] * 3, pa.float64()),
    })
    # Brand#1: only supplier 5 → HHI 1.0, top_share 1.0.
    # Brand#2: suppliers 6 and 7 with 10.00 each (7's is 20.00 at 50%
    # discount → cents rounding must hit exactly 1000) → HHI 0.5.
    _lineitem(d, [
        (100, 1, 5, 7.0, 0.0, "1996-01-01"),
        (101, 2, 6, 10.0, 0.0, "1996-01-01"),
        (102, 3, 7, 20.0, 0.5, "1996-01-01"),
    ])
    for parts in (1, 3):
        got = d5.part_brand_hhi(d, num_partitions=parts).take_all()
        assert got == [
            {"p_brand": "Brand#1", "n_suppliers": 1, "total_cents": 700,
             "hhi": 1.0, "top_share": 1.0},
            {"p_brand": "Brand#2", "n_suppliers": 2, "total_cents": 2000,
             "hhi": 0.5, "top_share": 0.5},
        ], got


def test_part_brand_hhi_empty(ray_session, tmp_path):
    d = str(tmp_path)
    _write(d, "part", {
        "p_partkey": pa.array([], pa.int64()),
        "p_name": pa.array([], pa.string()),
        "p_brand": pa.array([], pa.string()),
        "p_type": pa.array([], pa.string()),
        "p_size": pa.array([], pa.int32()),
        "p_retailprice": pa.array([], pa.float64()),
    })
    _lineitem(d, [(100, 1, 5, 7.0, 0.0, "1996-01-01")])
    assert d5.part_brand_hhi(d).take_all() == []


# ---------------------------------------------------------------------------
# user_interarrival_stats
# ---------------------------------------------------------------------------

def _events(d, rows):
    """rows: (event_id, ts, user_id, event_type)."""
    eid, ts, uid, et = zip(*rows)
    _write(d, "events", {
        "event_id": pa.array(eid, pa.int64()),
        "ts": pa.array([_ts(x) for x in ts], pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })


def test_interarrival_attribution_and_ties(ray_session, tmp_path):
    d = str(tmp_path)
    # user 1: click @0s → view @10s (gap 10 → view) → click @10s
    # (SAME ts, event_id tie-break orders view(id=2) before click(id=3),
    # gap 0 → click) → buy @70s (gap 60 → buy).
    # user 2: single event → contributes nothing.
    _events(d, [
        (1, "1996-01-01T00:00:00", 1, "click"),
        (2, "1996-01-01T00:00:10", 1, "view"),
        (3, "1996-01-01T00:00:10", 1, "click"),
        (4, "1996-01-01T00:01:10", 1, "buy"),
        (5, "1996-01-01T00:00:00", 2, "view"),
    ])
    want = [
        {"event_type": "buy", "n_gaps": 1, "sum_gap_us": 60_000_000,
         "max_gap_us": 60_000_000, "avg_gap_s": 60.0},
        {"event_type": "click", "n_gaps": 1, "sum_gap_us": 0,
         "max_gap_us": 0, "avg_gap_s": 0.0},
        {"event_type": "view", "n_gaps": 1, "sum_gap_us": 10_000_000,
         "max_gap_us": 10_000_000, "avg_gap_s": 10.0},
    ]
    for parts in (1, 3):
        got = d5.user_interarrival_stats(d, num_partitions=parts).take_all()
        assert got == want, got


def test_interarrival_no_gaps(ray_session, tmp_path):
    d = str(tmp_path)
    _events(d, [
        (1, "1996-01-01T00:00:00", 1, "view"),
        (2, "1996-01-01T00:00:00", 2, "view"),
    ])
    assert d5.user_interarrival_stats(d).take_all() == []


def test_winsorized_stats_clipping(ray_session, tmp_path):
    d = str(tmp_path)
    # type "a", n=200: 2×1.00, 196×10.00, 2×100.00.
    # quantile_disc: lo = element ceil(0.01·200)=2 → 1.00 (100 cents),
    # hi = element ceil(0.99·200)=198 → 10.00 (1000 cents).
    # Only the two 100.00 values clip (high); mean = 991.0 cents.
    vals = [1.0] * 2 + [10.0] * 196 + [100.0] * 2
    rows = [(i + 1, "1996-01-01T00:00:00", i + 1, "a") for i in range(200)]
    eid, ts, uid, et = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "ts": pa.array([_ts(x) for x in ts], pa.timestamp("us")),
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(et, pa.string()),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * 200, pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    got = d5.events_winsorized_stats(d).take_all()
    assert got == [
        {"event_type": "a", "lo_cents": 100, "hi_cents": 1000, "n": 200,
         "winsorized_mean_cents": 991.0,
         "n_clipped_low": 0, "n_clipped_high": 2}
    ], got


def test_order_fill_times_histogram(ray_session, tmp_path):
    d = str(tmp_path)
    _orders(d, [
        (10, 1, "1996-01-01"), (11, 1, "1996-01-02"), (12, 2, "1996-01-01"),
    ])
    # order 10 fills in 2 days (max of two lines), 11 in 0 days,
    # order 12 has no lines → dropped
    _lineitem(d, [
        (10, 1, 1, 10.0, 0.0, "1996-01-02"),
        (10, 1, 1, 10.0, 0.0, "1996-01-03"),
        (11, 1, 1, 10.0, 0.0, "1996-01-02"),
    ])
    for parts in (1, 3):
        got = d5.order_fill_times(d, num_partitions=parts).take_all()
        assert got == [
            {"fill_days": 0, "n_orders": 1},
            {"fill_days": 2, "n_orders": 1},
        ], got


def test_events_hourly_anomaly_spike(ray_session, tmp_path):
    d = str(tmp_path)
    # hour 3 over two days: day1 has 6 events, day2 has 2 → total 8,
    # n_days 2, baseline 4.0; day1 ratio 1.5 (<2 → out).
    # hour 5: day1 has 8, day2 has 0-rows (absent) → total 8 but only
    # day1 row exists; n_days counts DISTINCT days across all rows = 2,
    # so day1 hour5: 8·2 = 16 ≥ 2·8 → spike, ratio 2.0.
    rows = []
    eid = 0
    for _ in range(6):
        eid += 1; rows.append((eid, "1996-01-01T03:00:00", 1, "a"))
    for _ in range(2):
        eid += 1; rows.append((eid, "1996-01-02T03:00:00", 1, "a"))
    for _ in range(8):
        eid += 1; rows.append((eid, "1996-01-01T05:00:00", 1, "a"))
    _events(d, rows)
    got = d5.events_hourly_anomaly(d).take_all()
    assert got == [
        {"day": _ts("1996-01-01"), "hour": 5, "n": 8,
         "baseline": 4.0, "ratio": 2.0}
    ], got


def test_mannwhitney_exact_with_ties(ray_session, tmp_path):
    d = str(tmp_path)
    # type a values {1.00, 2.00}, type b {2.00, 3.00}: merged ranks
    # 1, (2.5, 2.5 tie), 4 → R_a = 1 + 2.5 = 3.5, U_a = 3.5 − 3 = 0.5,
    # AUC = 0.5/4 = 0.125 (a mostly below b).
    rows = [
        (1, "1996-01-01T00:00:00", 1, "a", 1.0),
        (2, "1996-01-01T00:00:00", 2, "a", 2.0),
        (3, "1996-01-01T00:00:00", 3, "b", 2.0),
        (4, "1996-01-01T00:00:00", 4, "b", 3.0),
    ]
    eid, ts, uid, et, val = zip(*rows)
    _write(d, "events", {
        "event_id": pa.array(eid, pa.int64()),
        "ts": pa.array([_ts(x) for x in ts], pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array(val, pa.float64()),
        "props": pa.array(["{}"] * 4, pa.string()),
    })
    got = d5.events_mannwhitney(d).take_all()
    assert got == [
        {"type_a": "a", "type_b": "b", "n_a": 2, "n_b": 2,
         "u_a": 0.5, "auc": 0.125}
    ], got


def test_brand_discount_trend_exact_slope(ray_session, tmp_path):
    d = str(tmp_path)
    _write(d, "part", {
        "p_partkey": pa.array([1], pa.int64()),
        "p_name": pa.array(["a"], pa.string()),
        "p_brand": pa.array(["Brand#1"], pa.string()),
        "p_type": pa.array(["T"], pa.string()),
        "p_size": pa.array([1], pa.int32()),
        "p_retailprice": pa.array([1.0], pa.float64()),
    })
    # two points: (x=0 bp, y=1000 cents) and (x=5000 bp, y=2000 cents)
    # → slope = 1000/5000 = 0.2 cents/bp, mean x = 2500
    _lineitem(d, [
        (100, 1, 5, 10.0, 0.0, "1996-01-01"),
        (101, 1, 5, 40.0, 0.5, "1996-01-01"),
    ])
    for parts in (1, 2):
        got = d5.brand_discount_trend(d, num_partitions=parts).take_all()
        assert got == [
            {"p_brand": "Brand#1", "n": 2, "slope": 0.2,
             "mean_discount_bp": 2500.0}
        ], got


def test_segment_migration_planted(ray_session, tmp_path):
    d = str(tmp_path)
    # 5 customers active in 1995 with totals 1..5 (quintiles 1..5),
    # in 1996: cust 1 doubles to the top (10.0), cust 5 goes inactive,
    # cust 6 appears fresh. Thresholds 1995: quantile_disc([.2,.4,.6,.8])
    # over {100..500} = 100,200,300,400 → buckets 1..5 exactly.
    _orders(d, [
        (1, 1, "1995-06-01"), (2, 2, "1995-06-01"), (3, 3, "1995-06-01"),
        (4, 4, "1995-06-01"), (5, 5, "1995-06-01"),
        (6, 1, "1996-06-01"), (7, 2, "1996-06-01"), (8, 3, "1996-06-01"),
        (9, 4, "1996-06-01"), (10, 6, "1996-06-01"),
    ])
    import pyarrow.parquet as _pq
    t = _pq.read_table(os.path.join(d, "orders.parquet"))
    prices = [1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 2.0, 3.0, 4.0, 1.0]
    t = t.set_column(
        t.schema.get_field_index("o_totalprice"),
        "o_totalprice",
        pa.array(prices, pa.float64()),
    )
    _pq.write_table(t, os.path.join(d, "orders.parquet"))
    got = d5.customer_segment_migration(d).take_all()
    # 1996 actives: {10.0(c1), 2.0(c2), 3.0(c3), 4.0(c4), 1.0(c6)}
    # → thresholds 100,200,300,400 again → buckets: c1→5, c2→2, c3→3,
    # c4→4, c6→1. Matrix: (1→5), (2→2), (3→3), (4→4), (5→0), (0→1).
    assert got == [
        {"q_from": 0, "q_to": 1, "n_customers": 1},
        {"q_from": 1, "q_to": 5, "n_customers": 1},
        {"q_from": 2, "q_to": 2, "n_customers": 1},
        {"q_from": 3, "q_to": 3, "n_customers": 1},
        {"q_from": 4, "q_to": 4, "n_customers": 1},
        {"q_from": 5, "q_to": 0, "n_customers": 1},
    ], got


def test_transition_predictability_mode_and_ties(ray_session, tmp_path):
    d = str(tmp_path)
    # user 1: a→b, b→a, a→b  |  user 2: a→c
    # from a: b×2, c×1 → predict b, hit 2/3; from b: a×1 → predict a 1/1
    _events(d, [
        (1, "1996-01-01T00:00:01", 1, "a"),
        (2, "1996-01-01T00:00:02", 1, "b"),
        (3, "1996-01-01T00:00:03", 1, "a"),
        (4, "1996-01-01T00:00:04", 1, "b"),
        (5, "1996-01-01T00:00:01", 2, "a"),
        (6, "1996-01-01T00:00:02", 2, "c"),
    ])
    got = d5.event_transition_predictability(d).take_all()
    assert got == [
        {"prev_type": "a", "predicted_next": "b", "n_total": 3,
         "n_hit": 2, "hit_rate": 2.0 / 3.0},
        {"prev_type": "b", "predicted_next": "a", "n_total": 1,
         "n_hit": 1, "hit_rate": 1.0},
    ], got


def test_event_type_user_overlap_planted(ray_session, tmp_path):
    d = str(tmp_path)
    # users doing a: {1,2}; b: {2,3}; c: {4} (disjoint → omitted pairs)
    _events(d, [
        (1, "1996-01-01T00:00:00", 1, "a"),
        (2, "1996-01-01T00:00:00", 2, "a"),
        (3, "1996-01-01T00:00:00", 2, "b"),
        (4, "1996-01-01T00:00:00", 3, "b"),
        (5, "1996-01-01T00:00:00", 4, "c"),
        (6, "1996-01-01T00:00:01", 2, "a"),  # dup (user,type) row
    ])
    for parts in (1, 3):
        got = d5.event_type_user_overlap(d, num_partitions=parts).take_all()
        assert got == [
            {"type_a": "a", "type_b": "b", "n_a": 2, "n_b": 2,
             "n_common": 1, "n_union": 3, "jaccard": 1.0 / 3.0}
        ], got


def test_supplier_ship_delay_exact(ray_session, tmp_path):
    d = str(tmp_path)
    _orders(d, [(10, 1, "1996-01-01"), (11, 1, "1996-02-01")])
    # supp 5: delays 1 and 3 days; supp 6: delay 10 days
    _lineitem(d, [
        (10, 1, 5, 10.0, 0.0, "1996-01-02"),
        (11, 1, 5, 10.0, 0.0, "1996-02-04"),
        (10, 1, 6, 10.0, 0.0, "1996-01-11"),
    ])
    for parts in (1, 3):
        got = d5.supplier_ship_delay(d, num_partitions=parts).take_all()
        assert got == [
            {"l_suppkey": 5, "n_lines": 2, "sum_delay_days": 4,
             "max_delay_days": 3, "avg_delay_days": 2.0},
            {"l_suppkey": 6, "n_lines": 1, "sum_delay_days": 10,
             "max_delay_days": 10, "avg_delay_days": 10.0},
        ], got


def test_benford_digit_extraction_and_chi2(ray_session, tmp_path):
    d = str(tmp_path)
    # totals 1.00, 19.99, 100.00, 0.09, 0.00 → cents 100, 1999, 10000,
    # 9, 0(dropped) → leading digits 1, 1, 1, 9
    _orders(d, [(i, 1, "1996-01-01") for i in range(1, 6)])
    import pyarrow.parquet as _pq
    t = _pq.read_table(os.path.join(d, "orders.parquet"))
    t = t.set_column(
        t.schema.get_field_index("o_totalprice"),
        "o_totalprice",
        pa.array([1.0, 19.99, 100.0, 0.09, 0.0], pa.float64()),
    )
    _pq.write_table(t, os.path.join(d, "orders.parquet"))
    got = {r["digit"]: r for r in d5.benford_digits(d).take_all()}
    assert got[1]["n_obs"] == 3 and got[9]["n_obs"] == 1
    assert got[2]["n_obs"] == 0
    assert got[1]["share"] == 0.75
    import math
    p1 = math.log10(2.0)
    e1 = 4 * p1
    assert got[1]["chi2_contrib"] == (3.0 - e1) ** 2 / e1


def test_order_size_histogram(ray_session, tmp_path):
    d = str(tmp_path)
    _orders(d, [(10, 1, "1996-01-01"), (11, 1, "1996-01-02"),
                (12, 2, "1996-01-03")])
    _lineitem(d, [
        (10, 1, 5, 1.0, 0.0, "1996-01-02"),
        (10, 1, 5, 1.0, 0.0, "1996-01-02"),
        (10, 1, 5, 1.0, 0.0, "1996-01-02"),
        (11, 1, 5, 1.0, 0.0, "1996-01-02"),
        (12, 1, 5, 1.0, 0.0, "1996-01-03"),
    ])
    for parts in (1, 3):
        got = d5.order_size_histogram(d, num_partitions=parts).take_all()
        assert got == [
            {"n_lines": 1, "n_orders": 2},
            {"n_lines": 3, "n_orders": 1},
        ], got


def test_order_gap_quantiles_exact(ray_session, tmp_path):
    d = str(tmp_path)
    # cust 1 gaps: 10, 20, 30 days; cust 2: single order → no gap
    _orders(d, [
        (1, 1, "1996-01-01"), (2, 1, "1996-01-11"),
        (3, 1, "1996-01-31"), (4, 1, "1996-03-01"),
        (5, 2, "1996-01-01"),
    ])
    got = {r["q"]: r["gap_days"] for r in d5.order_gap_quantiles(d).take_all()}
    # quantile_disc over {10,20,30}: .25→10, .5→20, .75→30, .9→30
    assert got == {0.25: 10, 0.5: 20, 0.75: 30, 0.9: 30}, got


def test_seasonality_lift_exact(ray_session, tmp_path):
    d = str(tmp_path)
    # hour 0: a×3, b×1; hour 1: b×4.
    rows = (
        [(i, "1996-01-01T00:00:00", 1, "a") for i in range(1, 4)]
        + [(4, "1996-01-01T00:30:00", 1, "b")]
        + [(i, "1996-01-01T01:00:00", 1, "b") for i in range(5, 9)]
    )
    _events(d, rows)
    got = {(r["event_type"], r["hour"]): r
           for r in d5.events_seasonality_index(d).take_all()}
    a0 = got[("a", 0)]
    # a: all 3 in hour 0 → type_share 1.0; hour0 global share 4/8
    assert a0["type_share"] == 1.0 and a0["global_share"] == 0.5
    assert a0["lift"] == 2.0
    b1 = got[("b", 1)]
    assert b1["type_share"] == 0.8 and b1["global_share"] == 0.5
    assert b1["lift"] == 0.8 / 0.5
    assert ("a", 1) not in got  # zero cells omitted (oracle join semantics)


# ---------------------------------------------------------------------------
# cohort_revenue
# ---------------------------------------------------------------------------

def test_cohort_revenue_attribution(ray_session, tmp_path):
    d = str(tmp_path)
    # customer 1: first order 2024-01 (1000.00) + 2024-03 (250.00);
    # customer 2: first order 2024-03 (100.00) twice that month ->
    # cohort Jan: offset 0 = (1 cust, 100000c), offset 2 = (1, 25000c);
    # cohort Mar: offset 0 = (1 cust, both orders summed = 20000c)
    _orders(d, [
        (1, 1, "2024-01-10"),
        (2, 1, "2024-03-05"),
        (3, 2, "2024-03-07"),
        (4, 2, "2024-03-20"),
    ])
    import pyarrow.parquet as _pq
    import pyarrow as _pa
    # rewrite with controlled totalprice values
    t = _pq.read_table(os.path.join(d, "orders.parquet"))
    prices = {1: 1000.0, 2: 250.0, 3: 100.0, 4: 100.0}
    keys = t.column("o_orderkey").to_pylist()
    t = t.set_column(
        t.schema.get_field_index("o_totalprice"), "o_totalprice",
        _pa.array([prices[k] for k in keys], _pa.float64()),
    )
    _pq.write_table(t, os.path.join(d, "orders.parquet"))
    jan = (2024 - 1970) * 12 + 0
    mar = jan + 2
    for parts in (1, 2, 3):
        got = {
            (r["cohort_month"], r["month_offset"]): r
            for r in d5.cohort_revenue(d, num_partitions=parts).take_all()
        }
        assert got[(jan, 0)]["n_customers"] == 1
        assert got[(jan, 0)]["revenue_cents"] == 100000
        assert got[(jan, 2)]["revenue_cents"] == 25000
        assert got[(mar, 0)]["n_customers"] == 1
        assert got[(mar, 0)]["revenue_cents"] == 20000
        assert set(got) == {(jan, 0), (jan, 2), (mar, 0)}


# ---------------------------------------------------------------------------
# revenue_proration
# ---------------------------------------------------------------------------

def test_revenue_proration_floor_and_remainder(ray_session, tmp_path):
    d = str(tmp_path)
    # order 1: od 2024-01-30, fill 2024-02-03 -> total 5 days,
    # 2 in Jan / 3 in Feb; cents 100 -> Jan floor(100*2/5)=40,
    # Feb (last) = 100-40 = 60.
    # order 2: od 2024-01-31, fill 2024-02-01, cents 11 (odd) ->
    # Jan floor(11/2)=5, Feb remainder 6 (remainder to the LAST month).
    # order 3: single-day span entirely in March -> all 100 in March.
    _orders(d, [
        (1, 1, "2024-01-30"),
        (2, 1, "2024-01-31"),
        (3, 1, "2024-03-15"),
    ])
    import pyarrow as _pa
    import pyarrow.parquet as _pq
    t = _pq.read_table(os.path.join(d, "orders.parquet"))
    prices = {1: 1.0, 2: 0.11, 3: 1.0}
    keys = t.column("o_orderkey").to_pylist()
    t = t.set_column(
        t.schema.get_field_index("o_totalprice"), "o_totalprice",
        _pa.array([prices[k] for k in keys], _pa.float64()),
    )
    _pq.write_table(t, os.path.join(d, "orders.parquet"))
    _lineitem(d, [
        (1, 1, 1, 1.0, 0.0, "2024-01-31"),
        (1, 1, 1, 1.0, 0.0, "2024-02-03"),   # max ship wins
        (2, 1, 1, 1.0, 0.0, "2024-02-01"),
        (3, 1, 1, 1.0, 0.0, "2024-03-15"),
    ])
    jan = (2024 - 1970) * 12 + 0
    for parts in (1, 2, 3):
        got = {
            r["month_idx"]: r
            for r in d5.revenue_proration(d, num_partitions=parts).take_all()
        }
        assert got[jan]["revenue_cents"] == 40 + 5
        assert got[jan]["n_orders"] == 2
        assert got[jan + 1]["revenue_cents"] == 60 + 6
        assert got[jan + 1]["n_orders"] == 2
        assert got[jan + 2]["revenue_cents"] == 100
        assert got[jan + 2]["n_orders"] == 1
        assert set(got) == {jan, jan + 1, jan + 2}


# ---------------------------------------------------------------------------
# customer_trend_mix
# ---------------------------------------------------------------------------

def test_customer_trend_mix_signs(ray_session, tmp_path):
    d = str(tmp_path)
    # cust 1 grows (10 -> 20 over two months), cust 2 declines
    # (20 -> 10), cust 3 is flat across three months (slope exactly
    # 0), cust 4 is single-month (excluded)
    _orders(d, [
        (1, 1, "2024-01-10"), (2, 1, "2024-02-10"),
        (3, 2, "2024-01-10"), (4, 2, "2024-02-10"),
        (5, 3, "2024-01-10"), (6, 3, "2024-02-10"), (7, 3, "2024-03-10"),
        (8, 4, "2024-01-10"),
    ])
    import pyarrow as _pa
    import pyarrow.parquet as _pq
    t = _pq.read_table(os.path.join(d, "orders.parquet"))
    prices = {1: 0.10, 2: 0.20, 3: 0.20, 4: 0.10,
              5: 0.15, 6: 0.15, 7: 0.15, 8: 9.99}
    keys = t.column("o_orderkey").to_pylist()
    t = t.set_column(
        t.schema.get_field_index("o_totalprice"), "o_totalprice",
        _pa.array([prices[k] for k in keys], _pa.float64()),
    )
    _pq.write_table(t, os.path.join(d, "orders.parquet"))
    for parts in (1, 2, 3):
        got = {
            r["trend"]: r["n_customers"]
            for r in d5.customer_trend_mix(d, num_partitions=parts).take_all()
        }
        assert got == {-1: 1, 0: 1, 1: 1}


# ---------------------------------------------------------------------------
# customer_km_survival
# ---------------------------------------------------------------------------

def test_km_censoring_and_distinct_days(ray_session, tmp_path):
    import math

    d = str(tmp_path)
    # A: second order 10 days later (event t=10); B: one order
    # (censored at horizon-0 = 10); C: two SAME-DAY orders (distinct
    # days -> still censored, at horizon-5 = 5). At t=10 the risk set
    # is {A, B} (C censored at 5): S = 1/2 in micro-log space.
    _orders(d, [
        (1, 1, "2024-01-01"), (2, 1, "2024-01-11"),
        (3, 2, "2024-01-01"),
        (4, 3, "2024-01-06"), (5, 3, "2024-01-06"),
    ])
    want_s = math.exp((0 - 693147) / 1000000.0)
    for parts in (1, 2, 3):
        got = d5.customer_km_survival(d, num_partitions=parts).take_all()
        assert got == [{
            "t_days": 10, "n_at_risk": 2, "n_events": 1,
            "survival": want_s,
        }]


def test_km_all_fail_exact_zero(ray_session, tmp_path):
    d = str(tmp_path)
    # both customers reorder after 3 days, nobody censored later:
    # the risk set dies at once -> survival exactly 0.0 (the ln(0)
    # guard path on both engines)
    _orders(d, [
        (1, 1, "2024-01-01"), (2, 1, "2024-01-04"),
        (3, 2, "2024-01-01"), (4, 2, "2024-01-04"),
    ])
    got = d5.customer_km_survival(d).take_all()
    assert got == [{
        "t_days": 3, "n_at_risk": 2, "n_events": 2, "survival": 0.0,
    }]
