"""Edge-case tests for decision-support batch 2
(pipelines/decision2.py) and the FastSS edit-distance machinery
(functions/editdist.py): semi-join multiplicity, HAVING boundary,
blocklist anti-join, empty-window NULL semantics, branch-predicate
boundaries, and exact fuzzy-join parity vs brute force — plus
partition invariance for every shuffle-bearing operator."""

from __future__ import annotations

import itertools
import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsmetacheck_ray.functions.editdist import (
    byte_matrix,
    deletion_keys,
    levenshtein_ref,
    within_edit1,
)
from rsmetacheck_ray.pipelines import decision2 as d2


# ---------------------------------------------------------------------------
# editdist primitives
# ---------------------------------------------------------------------------

def test_editdist_exact_vs_bruteforce():
    """within_edit1 agrees with a reference Levenshtein on all pairs,
    and FastSS deletion keys never miss a true ≤1 pair (losslessness)."""
    random.seed(7)
    vocab = [
        "ring", "rng", "rings", "wing", "widget", "widgit", "bolt",
        "bolts", "", "a", "b", "ab", "ba", "aab", "abab", "xyz",
    ]
    names = [random.choice(vocab) for _ in range(200)] + vocab
    M, lens = byte_matrix(pa.array(names, pa.string()))
    rows, keys = deletion_keys(M, lens)
    keyset: dict[int, set[int]] = {}
    for r, k in zip(rows, keys):
        keyset.setdefault(int(r), set()).add(int(k))
    n = len(names)
    ia, ib = np.array(list(itertools.combinations(range(n), 2))).T
    got = within_edit1(M, lens, ia, ib)
    for ok, i, j in zip(got, ia, ib):
        truth = levenshtein_ref(names[i], names[j]) <= 1
        assert bool(ok) == truth, (names[i], names[j])
        if truth:
            assert keyset[int(i)] & keyset[int(j)], (names[i], names[j])


def test_byte_matrix_roundtrip_and_empty():
    M, lens = byte_matrix(pa.array(["abc", "", "zz"], pa.string()))
    assert list(lens) == [3, 0, 2]
    assert M[0, 0] == ord("a") + 1 and M[1].sum() == 0
    M0, l0 = byte_matrix(pa.array([], pa.string()))
    assert M0.shape[0] == 0 and len(l0) == 0
    r, k = deletion_keys(M0, l0)
    assert len(r) == 0 and len(k) == 0


# ---------------------------------------------------------------------------
# mini lakes
# ---------------------------------------------------------------------------

def _write(d, name, cols):
    pq.write_table(pa.table(cols), os.path.join(d, f"{name}.parquet"))


def _ts(s):
    return np.datetime64(s, "us").item()


def _mini_returns(d):
    """Order 1: two R lines (counted once). Order 2: no R line.
    Order 3: one R line, different priority. Order 4: no lines at all."""
    _write(d, "orders", {
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([10, 10, 11, 11], pa.int64()),
        "o_orderstatus": pa.array(["F"] * 4, pa.string()),
        "o_totalprice": pa.array([1.0] * 4, pa.float64()),
        "o_orderdate": pa.array([_ts("1996-01-02")] * 4, pa.timestamp("us")),
        "o_orderpriority": pa.array(
            ["1-URGENT", "1-URGENT", "2-HIGH", "2-HIGH"], pa.string()
        ),
    })
    _write(d, "lineitem", {
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_partkey": pa.array([100] * 4, pa.int64()),
        "l_suppkey": pa.array([5] * 4, pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 1], pa.int32()),
        "l_quantity": pa.array([1.0] * 4, pa.float64()),
        "l_extendedprice": pa.array([10.0] * 4, pa.float64()),
        "l_discount": pa.array([0.0] * 4, pa.float64()),
        "l_tax": pa.array([0.0] * 4, pa.float64()),
        "l_returnflag": pa.array(["R", "R", "N", "R"], pa.string()),
        "l_linestatus": pa.array(["F"] * 4, pa.string()),
        "l_shipdate": pa.array([_ts("1996-02-01")] * 4, pa.timestamp("us")),
    })


def test_orders_with_returns_multiplicity(ray_session, tmp_path):
    _mini_returns(str(tmp_path))
    for parts in (1, 3):
        t = d2.orders_with_returns(str(tmp_path), num_partitions=parts).take_all()
        assert t == [
            {"o_orderpriority": "1-URGENT", "n_orders": 1},
            {"o_orderpriority": "2-HIGH", "n_orders": 1},
        ]


def _mini_parts_lines(d, *, lines, parts=None, suppliers=None):
    parts = parts or {
        "p_partkey": pa.array([100, 101, 102], pa.int64()),
        "p_name": pa.array(["red bolt", "red bol", "blue bolt"], pa.string()),
        "p_brand": pa.array(["Brand#12", "Brand#12", "Brand#23"], pa.string()),
        "p_type": pa.array(["PROMO", "SMALL", "PROMO"], pa.string()),
        "p_size": pa.array([3, 3, 8], pa.int32()),
        "p_retailprice": pa.array([1.0, 1.0, 1.0], pa.float64()),
    }
    _write(d, "part", parts)
    if suppliers is not None:
        _write(d, "supplier", suppliers)
    n = len(lines["l_orderkey"])
    base = {
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": pa.array(["N"] * n, pa.string()),
        "l_linestatus": pa.array(["F"] * n, pa.string()),
    }
    _write(d, "lineitem", {**lines, **base})


def test_promo_revenue_window_and_empty(ray_session, tmp_path):
    _mini_parts_lines(str(tmp_path), lines={
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_partkey": pa.array([100, 101, 100], pa.int64()),
        "l_suppkey": pa.array([5, 5, 5], pa.int64()),
        "l_quantity": pa.array([1.0, 1.0, 1.0], pa.float64()),
        "l_extendedprice": pa.array([10.0, 30.0, 100.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.5], pa.float64()),
        # third line ships outside the window
        "l_shipdate": pa.array(
            [_ts("1995-09-03"), _ts("1995-09-10"), _ts("1996-01-01")],
            pa.timestamp("us"),
        ),
    })
    row = d2.promo_revenue(str(tmp_path)).take_all()[0]
    assert row["promo_cents"] == 1000 and row["total_cents"] == 4000
    assert row["promo_ratio"] == 100.0 * 1000 / 4000
    # empty window → SQL SUM-over-nothing NULL semantics
    empty = d2.promo_revenue(
        str(tmp_path), date_lo="1980-01-01", date_hi="1980-02-01"
    ).take_all()[0]
    assert empty["promo_cents"] is None and empty["promo_ratio"] is None


def test_big_orders_having_boundary(ray_session, tmp_path):
    """sum == min_qty is excluded (strict >); customer name attaches."""
    _write(str(tmp_path), "orders", {
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 11], pa.int64()),
        "o_orderstatus": pa.array(["F", "F"], pa.string()),
        "o_totalprice": pa.array([55.5, 7.0], pa.float64()),
        "o_orderdate": pa.array(
            [_ts("1996-01-02"), _ts("1997-03-04")], pa.timestamp("us")
        ),
        "o_orderpriority": pa.array(["1-URGENT"] * 2, pa.string()),
    })
    _write(str(tmp_path), "customer", {
        "c_custkey": pa.array([10, 11], pa.int64()),
        "c_name": pa.array(["alice", "bob"], pa.string()),
        "c_nationkey": pa.array([0, 0], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
        "c_mktsegment": pa.array(["BUILDING"] * 2, pa.string()),
    })
    _mini_parts_lines(str(tmp_path), lines={
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_partkey": pa.array([100, 101, 100], pa.int64()),
        "l_suppkey": pa.array([5, 5, 5], pa.int64()),
        "l_quantity": pa.array([3.0, 4.0, 7.0], pa.float64()),
        "l_extendedprice": pa.array([1.0] * 3, pa.float64()),
        "l_discount": pa.array([0.0] * 3, pa.float64()),
        "l_shipdate": pa.array([_ts("1996-02-01")] * 3, pa.timestamp("us")),
    })
    for parts in (1, 3):
        rows = d2.big_orders(
            str(tmp_path), min_qty=6, num_partitions=parts
        ).take_all()
        assert [
            (r["c_name"], r["o_orderkey"], r["sum_qty"], r["total_cents"])
            for r in rows
        ] == [("alice", 1, 7, 5550), ("bob", 2, 7, 700)]
        assert d2.big_orders(
            str(tmp_path), min_qty=7, num_partitions=parts
        ).count() == 0


def test_big_orders_shuffle_fallback_identical(
    ray_session, tmp_path, monkeypatch
):
    """Forcing the qualify gate to 0 routes through the tagged-union
    shuffle plan (_big_orders_shuffle) with identical output — the
    Q5-gate discipline: both sides of a size gate stay tested."""
    _write(str(tmp_path), "orders", {
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 11], pa.int64()),
        "o_orderstatus": pa.array(["F", "F"], pa.string()),
        "o_totalprice": pa.array([55.5, 7.0], pa.float64()),
        "o_orderdate": pa.array(
            [_ts("1996-01-02"), _ts("1997-03-04")], pa.timestamp("us")
        ),
        "o_orderpriority": pa.array(["1-URGENT"] * 2, pa.string()),
    })
    _write(str(tmp_path), "customer", {
        "c_custkey": pa.array([10, 11], pa.int64()),
        "c_name": pa.array(["alice", "bob"], pa.string()),
        "c_nationkey": pa.array([0, 0], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
        "c_mktsegment": pa.array(["BUILDING"] * 2, pa.string()),
    })
    _mini_parts_lines(str(tmp_path), lines={
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_partkey": pa.array([100, 101, 100], pa.int64()),
        "l_suppkey": pa.array([5, 5, 5], pa.int64()),
        "l_quantity": pa.array([3.0, 4.0, 7.0], pa.float64()),
        "l_extendedprice": pa.array([1.0] * 3, pa.float64()),
        "l_discount": pa.array([0.0] * 3, pa.float64()),
        "l_shipdate": pa.array([_ts("1996-02-01")] * 3, pa.timestamp("us")),
    })
    want = [
        (r["c_name"], r["o_orderkey"], r["sum_qty"], r["total_cents"])
        for r in d2.big_orders(str(tmp_path), min_qty=6).take_all()
    ]
    monkeypatch.setattr(d2, "_Q18_QUALIFY_MAX", 0)
    got = [
        (r["c_name"], r["o_orderkey"], r["sum_qty"], r["total_cents"])
        for r in d2.big_orders(str(tmp_path), min_qty=6).take_all()
    ]
    assert want == got == [("alice", 1, 7, 5550), ("bob", 2, 7, 700)]


def test_part_supplier_counts_blocklist_and_distinct(ray_session, tmp_path):
    """Supplier 6 (negative balance) is excluded; supplier 5 shipping
    two parts of the SAME (brand,type,size) combo counts once."""
    _mini_parts_lines(
        str(tmp_path),
        parts={
            "p_partkey": pa.array([100, 101, 102], pa.int64()),
            "p_name": pa.array(["a", "b", "c"], pa.string()),
            "p_brand": pa.array(["Brand#1", "Brand#1", "Brand#2"], pa.string()),
            "p_type": pa.array(["T", "T", "T"], pa.string()),
            "p_size": pa.array([1, 1, 2], pa.int32()),
            "p_retailprice": pa.array([1.0] * 3, pa.float64()),
        },
        suppliers={
            "s_suppkey": pa.array([5, 6], pa.int64()),
            "s_name": pa.array(["s5", "s6"], pa.string()),
            "s_nationkey": pa.array([0, 0], pa.int32()),
            "s_acctbal": pa.array([1.0, -1.0], pa.float64()),
        },
        lines={
            "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "l_partkey": pa.array([100, 101, 102, 102], pa.int64()),
            "l_suppkey": pa.array([5, 5, 6, 5], pa.int64()),
            "l_quantity": pa.array([1.0] * 4, pa.float64()),
            "l_extendedprice": pa.array([1.0] * 4, pa.float64()),
            "l_discount": pa.array([0.0] * 4, pa.float64()),
            "l_shipdate": pa.array([_ts("1996-02-01")] * 4, pa.timestamp("us")),
        },
    )
    for parts in (1, 3):
        rows = d2.part_supplier_counts(
            str(tmp_path), num_partitions=parts
        ).take_all()
        assert [
            (r["p_brand"], r["p_size"], r["supplier_cnt"]) for r in rows
        ] == [("Brand#1", 1, 1), ("Brand#2", 2, 1)]


def test_special_revenue_branch_boundaries(ray_session, tmp_path):
    """qty on a branch boundary is kept; the right branch's range
    applies per part; non-matching parts contribute nothing."""
    _mini_parts_lines(
        str(tmp_path),
        parts={
            "p_partkey": pa.array([100, 101, 102], pa.int64()),
            "p_name": pa.array(["a", "b", "c"], pa.string()),
            "p_brand": pa.array(
                ["Brand#12", "Brand#23", "Brand#99"], pa.string()
            ),
            "p_type": pa.array(["T"] * 3, pa.string()),
            "p_size": pa.array([5, 10, 1], pa.int32()),
            "p_retailprice": pa.array([1.0] * 3, pa.float64()),
        },
        lines={
            "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            # 11 is Brand#12's upper qty bound (kept); 12 would not be.
            # Brand#23 with qty 11 IS in its 10-20 range (kept).
            # Brand#99 never matches.
            "l_partkey": pa.array([100, 100, 101, 102], pa.int64()),
            "l_suppkey": pa.array([5] * 4, pa.int64()),
            "l_quantity": pa.array([11.0, 12.0, 11.0, 11.0], pa.float64()),
            "l_extendedprice": pa.array([10.0] * 4, pa.float64()),
            "l_discount": pa.array([0.0] * 4, pa.float64()),
            "l_shipdate": pa.array([_ts("1996-02-01")] * 4, pa.timestamp("us")),
        },
    )
    assert d2.special_revenue(str(tmp_path)).take_all() == [{"rev_cents": 2000}]


def test_fuzzy_name_pairs_planted(ray_session, tmp_path):
    """Substitution / insertion / deletion pairs found; distance-2 and
    cross-brand pairs excluded; duplicate names give all pairs."""
    names = ["red bolt", "red bol", "red belt", "rd blt", "red bolt", "red bolt"]
    brands = ["B#1", "B#1", "B#1", "B#1", "B#1", "B#2"]
    _write(str(tmp_path), "part", {
        "p_partkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "p_name": pa.array(names, pa.string()),
        "p_brand": pa.array(brands, pa.string()),
        "p_type": pa.array(["T"] * 6, pa.string()),
        "p_size": pa.array([1] * 6, pa.int32()),
        "p_retailprice": pa.array([1.0] * 6, pa.float64()),
    })
    expect = sorted(
        (a + 1, b + 1)
        for a, b in itertools.combinations(range(6), 2)
        if brands[a] == brands[b]
        and levenshtein_ref(names[a], names[b]) <= 1
    )
    assert (1, 5) in expect and (2, 3) not in expect  # dup kept, dist-2 out
    assert not any(6 in p for p in expect)  # cross-brand out
    for parts in (1, 3):
        rows = d2.fuzzy_name_pairs(str(tmp_path), num_partitions=parts).take_all()
        assert [(r["part_a"], r["part_b"]) for r in rows] == expect
