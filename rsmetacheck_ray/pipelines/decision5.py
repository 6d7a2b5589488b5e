"""Decision-support batch 5 (round 4, continuation): four analytics
shapes the suite did not yet cover —

- cohort retention (first-activity month × month-offset distinct-user
  matrix, the classic SaaS retention triangle),
- interval stabbing (daily count of simultaneously-open orders via
  +1/−1 boundary deltas and one prefix sum — the sweep-line shape),
- market concentration (Herfindahl–Hirschman index of supplier revenue
  share within each part brand, exact-integer numerators),
- inter-arrival statistics (per event type, gap stats between each
  user's consecutive events — the LAG-diff shape).

The reference has no relational engine at all (single-process JSON
walk, ``src/cli.py`` + ``utils/pitfall_utils.py``); these extend the
SURVEY §2.5–2.7 join/aggregation axis the same way decision2–4 do.

Scale notes. Every shape here shuffles PARTIALS, never raw rows:
cohorts ships batch-distinct (custkey, month) pairs (16 B) through one
custkey-hash shuffle and reduces a (months × offsets) bounded matrix;
backlog pre-combines lineitem to per-batch (orderkey → max shipdate)
before its single orderkey tagged-union shuffle and reduces a
(#distinct days) bounded delta table; HHI ships (partkey, suppkey,
cents) rows through the size-gated generic ``join()`` (broadcast part
while it is bounded, co-partitioned partkey shuffle past it) and
reduces (brand × supplier) partials under the bounded-reduce guard;
inter-arrival is the sessionize pattern — one user-hash shuffle, one
lexsort per partition, |event types| partial rows out. All money math
is exact int64 cents; the only floats in any output are single
divisions of exact integers, written identically in the oracles.
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
    _part_of,
    _read_pq,
    bounded_group_table_strict,
)


# ---------------------------------------------------------------------------
# Cohort retention: first-order month × month offset → distinct customers.
# ---------------------------------------------------------------------------

def customer_cohorts(
    sf_dir: str, num_partitions: int | None = None
) -> rd.Dataset:
    """(cohort_month, month_offset, n_customers): customers grouped by
    the month (index since 1970-01) of their FIRST order; for each
    cohort and month offset, how many of them placed an order that
    month — the retention-triangle matrix.

    Plan: one custkey-hash shuffle of batch-distinct (custkey, month)
    pairs; each partition holds every row of its customers, so one
    np.unique + a per-customer min gives cohorts locally; the
    (cohort, offset) count partials it emits are bounded by the month
    domain squared (~84² at this lake's time span), reduced on the
    driver under the bounded-reduce guard."""
    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"],
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(ds), row_bytes=16
    )

    def tag(b: pa.Table) -> pa.Table:
        cust = b.column("o_custkey").to_numpy(zero_copy_only=False)
        # month index since 1970-01 — the M8[M] cast is exact calendar
        # month truncation, matching the oracle's (year-1970)*12+month-1
        m = (
            b.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("M8[M]")
            .astype(np.int64)
        )
        pairs = np.unique(np.stack([cust, m], axis=1), axis=0)
        ka = pa.array(pairs[:, 0], pa.int64())
        return pa.table(
            {
                "part": _part_of(ka, n_parts),
                "cust": ka,
                "m": pa.array(pairs[:, 1], pa.int64()),
            }
        )

    def cohort_counts(g: pa.Table) -> pa.Table:
        cust = g.column("cust").to_numpy(zero_copy_only=False)
        m = g.column("m").to_numpy(zero_copy_only=False)
        if not len(cust):
            return pa.table(
                {
                    "cohort_month": pa.array([], pa.int64()),
                    "month_offset": pa.array([], pa.int64()),
                    "n_customers": pa.array([], pa.int64()),
                }
            )
        # global distinct within the partition (batches overlap), then
        # per-customer cohort = min month via one lexsort scan
        pairs = np.unique(np.stack([cust, m], axis=1), axis=0)
        c, mm = pairs[:, 0], pairs[:, 1]
        first = np.empty(len(c), dtype=bool)
        first[0] = True
        first[1:] = c[1:] != c[:-1]
        # rows are sorted by (cust, month): the first row of each
        # customer run is the cohort month; broadcast it down the run
        cohort = mm[first][np.cumsum(first) - 1]
        key = np.stack([cohort, mm - cohort], axis=1)
        uniq, counts = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "cohort_month": pa.array(uniq[:, 0], pa.int64()),
                "month_offset": pa.array(uniq[:, 1], pa.int64()),
                "n_customers": pa.array(counts.astype(np.int64)),
            }
        )

    per_part = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(cohort_counts, batch_format="pyarrow")
    )
    tbl = bounded_group_table_strict(
        per_part,
        ["cohort_month", "month_offset"],
        [("n_customers", "sum")],
    )
    if tbl is None:
        tbl = pa.table(
            {
                "cohort_month": pa.array([], pa.int64()),
                "month_offset": pa.array([], pa.int64()),
                "n_customers": pa.array([], pa.int64()),
            }
        )
    return rd.from_arrow(tbl).sort(["cohort_month", "month_offset"])


CUSTOMER_COHORTS_SQL = """
WITH cm AS (
  SELECT DISTINCT o_custkey,
    (year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1 AS m
  FROM orders
), f AS (
  SELECT o_custkey, MIN(m) AS cohort FROM cm GROUP BY o_custkey
)
SELECT CAST(f.cohort AS BIGINT) AS cohort_month,
       CAST(cm.m - f.cohort AS BIGINT) AS month_offset,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM cm JOIN f USING (o_custkey)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def cohort_revenue(
    sf_dir: str, num_partitions: int | None = None
) -> rd.Dataset:
    """(cohort_month, month_offset, n_customers, revenue_cents): the
    revenue-weighted retention triangle — for each first-order-month
    cohort and month offset, how many of its customers ordered AND how
    much they spent (the lifetime-value view of ``customer_cohorts``;
    a cohort can retain headcount while its spend decays, or vice
    versa). All money math is exact int64 cents.

    Plan: the customer_cohorts shuffle with revenue riding along —
    per-batch (custkey, month) partials pre-SUM cents (not distinct
    pairs), ONE custkey-hash shuffle, per-partition cohort derivation
    via the same lexsort scan, (cohort, offset) partials bounded by
    the month domain squared."""
    from .relational import _cents

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(ds), row_bytes=24
    )

    def tag(b: pa.Table) -> pa.Table:
        m = (
            b.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("M8[M]")
            .astype(np.int64)
        )
        t = pa.table(
            {
                "cust": b.column("o_custkey"),
                "m": pa.array(m, pa.int64()),
                "cents": _cents(b.column("o_totalprice")),
            }
        ).group_by(["cust", "m"]).aggregate([("cents", "sum")])
        t = t.rename_columns(["cust", "m", "cents"])
        return t.append_column("part", _part_of(t.column("cust"), n_parts))

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_month": pa.array([], pa.int64()),
                "month_offset": pa.array([], pa.int64()),
                "n_customers": pa.array([], pa.int64()),
                "revenue_cents": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        t = (
            g.select(["cust", "m", "cents"])
            .group_by(["cust", "m"])
            .aggregate([("cents", "sum")])
            .rename_columns(["cust", "m", "cents"])
        )
        cust = t.column("cust").to_numpy(zero_copy_only=False)
        m = t.column("m").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((m, cust))
        c, mm, cc = cust[order], m[order], cents[order]
        first = np.empty(len(c), dtype=bool)
        first[0] = True
        first[1:] = c[1:] != c[:-1]
        cohort = mm[first][np.cumsum(first) - 1]
        key = np.stack([cohort, mm - cohort], axis=1)
        uniq, inv, counts = np.unique(
            key, axis=0, return_inverse=True, return_counts=True
        )
        rev = np.zeros(len(uniq), np.int64)
        np.add.at(rev, inv, cc)
        return pa.table(
            {
                "cohort_month": pa.array(uniq[:, 0], pa.int64()),
                "month_offset": pa.array(uniq[:, 1], pa.int64()),
                "n_customers": pa.array(counts.astype(np.int64)),
                "revenue_cents": pa.array(rev),
            }
        )

    per_part = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
    )
    tbl = bounded_group_table_strict(
        per_part,
        ["cohort_month", "month_offset"],
        [("n_customers", "sum"), ("revenue_cents", "sum")],
    )
    if tbl is None:
        tbl = pa.table(
            {
                "cohort_month": pa.array([], pa.int64()),
                "month_offset": pa.array([], pa.int64()),
                "n_customers": pa.array([], pa.int64()),
                "revenue_cents": pa.array([], pa.int64()),
            }
        )
    return rd.from_arrow(tbl).sort(["cohort_month", "month_offset"])


COHORT_REVENUE_SQL = """
WITH cm AS (
  SELECT o_custkey,
    (year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1 AS m,
    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS cents
  FROM orders GROUP BY 1, 2
), f AS (
  SELECT o_custkey, MIN(m) AS cohort FROM cm GROUP BY o_custkey
)
SELECT CAST(f.cohort AS BIGINT) AS cohort_month,
       CAST(cm.m - f.cohort AS BIGINT) AS month_offset,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cm.cents) AS BIGINT) AS revenue_cents
FROM cm JOIN f USING (o_custkey)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def revenue_proration(
    sf_dir: str, num_partitions: int | None = None
) -> rd.Dataset:
    """(month_idx, revenue_cents, n_orders): each order's total price
    prorated day-proportionally across the calendar months of its
    FILL interval (order date → last line shipment, inclusive) — the
    revenue-recognition view, where a December order filled in
    February books most of its revenue into January/February. Exact
    integer policy, written identically in the oracle: each non-final
    month books floor(cents·days_m / total_days); the FINAL month
    books the remainder, so every order's cents sum exactly and the
    monthly totals are partition-invariant ints.

    Plan: the order_fill_times machinery — lineitem pre-combines per
    batch to (orderkey → max shipdate), ONE orderkey tagged-union
    shuffle; each partition finishes the max, expands each order over
    its ≤ span/28+1 months VECTORIZED (a loop over month OFFSETS, not
    orders), and emits (month, cents, n) partials bounded by the
    month domain."""
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    )
    orders = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(li), row_bytes=16
    )

    def tag_li(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "key": b.column("l_orderkey"),
                "d": pc.cast(
                    pc.cast(b.column("l_shipdate"), pa.date32()), pa.int32()
                ),
            }
        ).group_by("key").aggregate([("d", "max")])
        ka = t.column("key").combine_chunks()
        return pa.table(
            {
                "part": _part_of(ka, n_parts),
                "key": ka,
                "tag": pa.array(np.zeros(len(t), np.int8)),
                "d": t.column("d_max"),
                "cents": pa.array(np.zeros(len(t), np.int64)),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        from .relational import _cents

        ka = b.column("o_orderkey").combine_chunks()
        return pa.table(
            {
                "part": _part_of(ka, n_parts),
                "key": ka,
                "tag": pa.array(np.ones(len(b), np.int8)),
                "d": pc.cast(
                    pc.cast(b.column("o_orderdate"), pa.date32()), pa.int32()
                ),
                "cents": _cents(b.column("o_totalprice")),
            }
        )

    both = li.map_batches(tag_li, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def _month_of(day: np.ndarray) -> np.ndarray:
        return day.astype("M8[D]").astype("M8[M]").astype(np.int64)

    def _month_start(m: np.ndarray) -> np.ndarray:
        return m.astype("M8[M]").astype("M8[D]").astype(np.int64)

    def prorate(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "month_idx": pa.array([], pa.int64()),
                "revenue_cents": pa.array([], pa.int64()),
                "n_orders": pa.array([], pa.int64()),
            }
        )
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        lsel = tag == 0
        lk, ld = key[lsel], d[lsel]
        ok, od, oc = key[~lsel], d[~lsel], cents[~lsel]
        if not len(lk) or not len(ok):
            return empty
        order = np.lexsort((ld, lk))
        lk, ld = lk[order], ld[order]
        last = np.empty(len(lk), dtype=bool)
        last[:-1] = lk[1:] != lk[:-1]
        last[-1] = True
        ck, cd = lk[last], ld[last]
        pos = np.minimum(np.searchsorted(ck, ok), len(ck) - 1)
        hit = (ck[pos] == ok) & (cd[pos] >= od)
        od, fd, oc = od[hit], cd[pos[hit]], oc[hit]
        if not len(od):
            return empty
        total = fd - od + 1
        m0, m1 = _month_of(od), _month_of(fd)
        mmin, mmax = int(m0.min()), int(m1.max())
        rev = np.zeros(mmax - mmin + 1, np.int64)
        cnt = np.zeros(mmax - mmin + 1, np.int64)
        acc = np.zeros(len(od), np.int64)
        k = 0
        while True:
            mk = m0 + k
            active = mk <= m1
            if not active.any():
                break
            ms = _month_start(mk[active])
            me = _month_start(mk[active] + 1) - 1
            lo = np.maximum(od[active], ms)
            hi = np.minimum(fd[active], me)
            dk = hi - lo + 1
            fl = oc[active] * dk // total[active]
            is_last = mk[active] == m1[active]
            val = np.where(is_last, oc[active] - acc[active], fl)
            np.add.at(rev, mk[active] - mmin, val)
            np.add.at(cnt, mk[active] - mmin, 1)
            acc[active] += fl
            k += 1
        nz = (rev != 0) | (cnt != 0)
        return pa.table(
            {
                "month_idx": pa.array(
                    np.arange(mmin, mmax + 1)[nz], pa.int64()
                ),
                "revenue_cents": pa.array(rev[nz]),
                "n_orders": pa.array(cnt[nz]),
            }
        )

    per_part = both.groupby("part").map_groups(
        prorate, batch_format="pyarrow"
    )
    tbl = bounded_group_table_strict(
        per_part,
        ["month_idx"],
        [("revenue_cents", "sum"), ("n_orders", "sum")],
    )
    if tbl is None:
        tbl = pa.table(
            {
                "month_idx": pa.array([], pa.int64()),
                "revenue_cents": pa.array([], pa.int64()),
                "n_orders": pa.array([], pa.int64()),
            }
        )
    return rd.from_arrow(tbl).sort("month_idx")


REVENUE_PRORATION_SQL = """
WITH f AS (
  SELECT l_orderkey AS ok, max(l_shipdate) AS fill FROM lineitem GROUP BY 1
), o AS (
  SELECT o_orderkey AS ok, o_orderdate AS od,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), span AS (
  SELECT o.ok, od, fill, cents,
         datediff('day', od, fill) + 1 AS total
  FROM o JOIN f USING (ok) WHERE fill >= od
), m AS (
  SELECT ok, od, fill, cents, total,
    unnest(generate_series(
      date_trunc('month', od), date_trunc('month', fill),
      INTERVAL 1 MONTH)) AS mon
  FROM span
), d AS (
  SELECT ok, cents, total, mon,
    datediff('day', greatest(od, mon),
             least(fill, mon + INTERVAL 1 MONTH - INTERVAL 1 DAY)) + 1
      AS days_m
  FROM m
), p AS (
  SELECT ok, mon, cents,
    ROW_NUMBER() OVER (PARTITION BY ok ORDER BY mon) AS rn,
    COUNT(*) OVER (PARTITION BY ok) AS nm,
    (cents * days_m) // total AS fl,
    COALESCE(SUM((cents * days_m) // total) OVER (
      PARTITION BY ok ORDER BY mon
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prevsum
  FROM d
)
SELECT CAST((year(mon) - 1970) * 12 + month(mon) - 1 AS BIGINT) AS month_idx,
  CAST(SUM(CASE WHEN rn = nm THEN cents - prevsum ELSE fl END) AS BIGINT)
    AS revenue_cents,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM p
GROUP BY 1
ORDER BY 1
"""


def customer_trend_mix(
    sf_dir: str, num_partitions: int | None = None
) -> rd.Dataset:
    """(trend, n_customers): every multi-month customer classified by
    the SIGN of the OLS slope of their monthly spend (cents) on month
    index — how many customers are growing (+1), flat (0) or
    declining (−1). The per-entity-model → population-rollup shape:
    a tiny regression is fit per customer where the customer's rows
    live, and only the 3-cell mix ships.

    Exactness: the slope's denominator is a variance (> 0 whenever a
    customer spans ≥ 2 months), so sign(slope) = sign(n·Σxy − Σx·Σy)
    — an exact int64 comparison; single-month customers are excluded
    on both engines.

    Plan: per-batch (cust, month, cents) pre-combine, ONE custkey-hash
    shuffle, per-partition per-customer moment fold (vectorized
    np.add.at over customer runs), 3-row bounded reduce."""
    from .relational import _cents

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(ds), row_bytes=24
    )

    def tag(b: pa.Table) -> pa.Table:
        m = (
            b.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("M8[M]")
            .astype(np.int64)
        )
        t = pa.table(
            {
                "cust": b.column("o_custkey"),
                "m": pa.array(m, pa.int64()),
                "cents": _cents(b.column("o_totalprice")),
            }
        ).group_by(["cust", "m"]).aggregate([("cents", "sum")])
        t = t.rename_columns(["cust", "m", "cents"])
        return t.append_column("part", _part_of(t.column("cust"), n_parts))

    def fold(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "trend": pa.array([], pa.int64()),
                "n_customers": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        t = (
            g.select(["cust", "m", "cents"])
            .group_by(["cust", "m"])
            .aggregate([("cents", "sum")])
            .rename_columns(["cust", "m", "cents"])
        )
        cust = t.column("cust").to_numpy(zero_copy_only=False)
        x = t.column("m").to_numpy(zero_copy_only=False)
        y = t.column("cents").to_numpy(zero_copy_only=False)
        order = np.argsort(cust, kind="stable")
        cust, x, y = cust[order], x[order], y[order]
        uniq, starts = np.unique(cust, return_index=True)
        sizes = np.diff(np.append(starts, len(cust)))
        idx = np.repeat(np.arange(len(uniq), dtype=np.int64), sizes)

        def seg(v):
            acc = np.zeros(len(uniq), np.int64)
            np.add.at(acc, idx, v)
            return acc

        n = sizes.astype(np.int64)
        # month indices are small (~10³) and cents < 2⁵³/10³: the
        # int64 products below are exact at any realistic time span
        sx, sy = seg(x), seg(y)
        sxy = seg(x * y)
        num = n * sxy - sx * sy
        multi = n >= 2
        sign = np.sign(num[multi])
        vals, cnt = np.unique(sign, return_counts=True)
        return pa.table(
            {
                "trend": pa.array(vals.astype(np.int64)),
                "n_customers": pa.array(cnt.astype(np.int64)),
            }
        )

    per_part = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow")
    )
    tbl = bounded_group_table_strict(
        per_part, ["trend"], [("n_customers", "sum")]
    )
    if tbl is None:
        tbl = pa.table(
            {
                "trend": pa.array([], pa.int64()),
                "n_customers": pa.array([], pa.int64()),
            }
        )
    return rd.from_arrow(tbl).sort("trend")


CUSTOMER_TREND_MIX_SQL = """
WITH cm AS (
  SELECT o_custkey,
    (year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1 AS x,
    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS y
  FROM orders GROUP BY 1, 2
), fit AS (
  SELECT o_custkey,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(COUNT(*) AS HUGEINT) * SUM(CAST(x AS HUGEINT) * y)
      - SUM(x) * SUM(y) AS num
  FROM cm GROUP BY 1
)
SELECT CAST(CASE WHEN num > 0 THEN 1 WHEN num < 0 THEN -1 ELSE 0 END
            AS BIGINT) AS trend,
  CAST(COUNT(*) AS BIGINT) AS n_customers
FROM fit WHERE n >= 2
GROUP BY 1
ORDER BY 1
"""


def customer_km_survival(
    sf_dir: str, num_partitions: int | None = None
) -> rd.Dataset:
    """(t_days, n_at_risk, n_events, survival): the Kaplan–Meier
    survival curve for "time until a customer's SECOND order" —
    survival analysis with right censoring (single-order customers are
    censored at the lake's last order date), the retention question
    "how long until a new customer comes back, given many never have
    yet". One row per distinct event time.

    Exactness: S(t) = Πᵢ (1 − dᵢ/nᵢ) is computed in micro-log fixed
    point — each factor contributes the exact integer
    L(nᵢ−dᵢ) − L(nᵢ), the cumulative sum is order-free exact int
    arithmetic, and the only float op is the final libm ``exp`` both
    engines apply to the same double. Censored subjects at time t stay
    in the risk set at t (the standard deaths-before-censorings
    convention, identical in the oracle).

    Plan: ONE custkey-hash shuffle of per-batch-combined
    (cust, date, orderkey-min) rows; each owning partition derives its
    customers' first/second order dates by one lexsort and emits
    (time, is_event, n) histogram partials bounded by the lake's day
    span; the KM walk is driver-side over that bounded table."""
    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"],
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(ds), row_bytes=16
    )

    # global censoring horizon: the lake's last order day (footer-free
    # exact aggregate — one bounded reduce)
    def max_day(b: pa.Table) -> pa.Table:
        d = pc.cast(pc.cast(b.column("o_orderdate"), pa.date32()), pa.int32())
        m = pc.max(d).as_py()
        return pa.table(
            {"k": pa.array([0], pa.int64()),
             "d": pa.array([m if m is not None else -(2**31)], pa.int64())}
        )

    mx = bounded_group_table_strict(
        ds.map_batches(max_day, batch_format="pyarrow"), ["k"], [("d", "max")]
    )
    empty = pa.table(
        {
            "t_days": pa.array([], pa.int64()),
            "n_at_risk": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "survival": pa.array([], pa.float64()),
        }
    )
    if mx is None:
        return rd.from_arrow(empty)
    horizon = int(mx.column("d")[0].as_py())

    def tag(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "cust": b.column("o_custkey"),
                "d": pc.cast(
                    pc.cast(
                        pc.cast(b.column("o_orderdate"), pa.date32()),
                        pa.int32(),
                    ),
                    pa.int64(),
                ),
            }
        )
        # keep at most the two smallest dates per (batch, cust): min
        # and min-of-above-min — a lossless pre-combine for "first two"
        g1 = t.group_by("cust").aggregate([("d", "min")])
        g1 = g1.rename_columns(["cust", "d1"])
        j = t.join(g1, keys="cust")
        above = j.filter(pc.greater(j.column("d"), j.column("d1")))
        g2 = above.group_by("cust").aggregate([("d", "min")])
        g2 = g2.rename_columns(["cust", "d"])
        out = pa.concat_tables(
            [g1.rename_columns(["cust", "d"]), g2]
        ).combine_chunks()
        return out.append_column(
            "part", _part_of(out.column("cust"), n_parts)
        )

    def fold(g: pa.Table) -> pa.Table:
        empty_h = pa.table(
            {
                "t": pa.array([], pa.int64()),
                "ev": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty_h
        cust = g.column("cust").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False)
        # DISTINCT (cust, date) like the oracle: the "second order"
        # is the next DISTINCT day, so same-day repeats never count
        pairs = np.unique(np.stack([cust, d], axis=1), axis=0)
        cust, d = pairs[:, 0], pairs[:, 1]
        first = np.empty(len(cust), dtype=bool)
        first[0] = True
        first[1:] = cust[1:] != cust[:-1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, len(cust)))
        d1 = d[starts]
        has2 = sizes >= 2
        t2 = np.where(has2, d[np.minimum(starts + 1, len(d) - 1)], 0)
        t_obs = np.where(has2, t2 - d1, horizon - d1).astype(np.int64)
        is_ev = has2.astype(np.int64)
        key = np.stack([t_obs, is_ev], axis=1)
        uniq, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "t": pa.array(uniq[:, 0], pa.int64()),
                "ev": pa.array(uniq[:, 1], pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    hist = bounded_group_table_strict(
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow"),
        ["t", "ev"],
        [("n", "sum")],
    )
    if hist is None:
        return rd.from_arrow(empty)
    import math

    per_t: dict[int, list[int]] = {}  # t -> [events, total_here]
    for t, ev, n in zip(
        hist.column("t").to_pylist(),
        hist.column("ev").to_pylist(),
        hist.column("n").to_pylist(),
    ):
        a = per_t.setdefault(int(t), [0, 0])
        if int(ev) == 1:
            a[0] += int(n)
        a[1] += int(n)
    total = sum(v[1] for v in per_t.values())
    out_t, out_n, out_d, out_s = [], [], [], []
    seen = 0
    cum_micro = 0
    dead = False  # everyone at risk failed at once -> S hits exact 0
    for t in sorted(per_t):
        d_ev, here = per_t[t]
        n_risk = total - seen
        if d_ev > 0:
            if n_risk > d_ev and not dead:
                cum_micro += (
                    _micro_ln_d5(n_risk - d_ev) - _micro_ln_d5(n_risk)
                )
            else:
                dead = True
            out_t.append(t)
            out_n.append(n_risk)
            out_d.append(d_ev)
            out_s.append(
                0.0 if dead else math.exp(float(cum_micro) / 1000000.0)
            )
        seen += here
    return rd.from_arrow(
        pa.table(
            {
                "t_days": pa.array(out_t, pa.int64()),
                "n_at_risk": pa.array(out_n, pa.int64()),
                "n_events": pa.array(out_d, pa.int64()),
                "survival": pa.array(out_s, pa.float64()),
            }
        )
    )


def _micro_ln_d5(v: int) -> int:
    import math

    return int(math.floor(math.log(v) * 1_000_000 + 0.5))


CUSTOMER_KM_SQL = """
WITH d AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od FROM orders
), g AS (SELECT max(od) AS horizon FROM d),
ranked AS (
  SELECT o_custkey, od,
    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY od) AS rn
  FROM (SELECT DISTINCT o_custkey, od FROM d)
), subj AS (
  SELECT r1.o_custkey,
    CASE WHEN r2.od IS NULL
      THEN datediff('day', r1.od, g.horizon) ELSE
           datediff('day', r1.od, r2.od) END AS t,
    CASE WHEN r2.od IS NULL THEN 0 ELSE 1 END AS ev
  FROM ranked r1
  LEFT JOIN ranked r2 ON r2.o_custkey = r1.o_custkey AND r2.rn = 2
  CROSS JOIN g
  WHERE r1.rn = 1
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM subj),
times AS (
  SELECT t, CAST(SUM(ev) AS BIGINT) AS d_ev,
         CAST(COUNT(*) AS BIGINT) AS here
  FROM subj GROUP BY t
), risk AS (
  SELECT t, d_ev,
    tot.n - COALESCE(SUM(here) OVER (
      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS n_risk
  FROM times CROSS JOIN tot
), km AS (
  SELECT t, n_risk, d_ev,
    SUM(CASE WHEN d_ev > 0 AND n_risk > d_ev THEN
      CAST(floor(ln(CAST(n_risk - d_ev AS DOUBLE)) * 1000000 + 0.5)
           AS BIGINT)
      - CAST(floor(ln(CAST(n_risk AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
      ELSE 0 END) OVER (ORDER BY t) AS cum_micro,
    MAX(CASE WHEN d_ev > 0 AND n_risk <= d_ev THEN 1 ELSE 0 END)
      OVER (ORDER BY t) AS dead
  FROM risk
)
SELECT CAST(t AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_at_risk,
  CAST(d_ev AS BIGINT) AS n_events,
  CASE WHEN dead = 1 THEN 0.0
       ELSE exp(CAST(cum_micro AS DOUBLE) / 1000000.0) END AS survival
FROM km
WHERE d_ev > 0
ORDER BY t_days
"""


# ---------------------------------------------------------------------------
# Interval stabbing: daily count of simultaneously-open orders.
# ---------------------------------------------------------------------------

def orders_backlog(
    sf_dir: str, num_partitions: int | None = None
) -> rd.Dataset:
    """(day, open_orders): for every day on which the count changes,
    the number of orders open that day — an order is open from
    ``o_orderdate`` through its latest line's ``l_shipdate``. The
    sweep-line recast: each interval becomes a +1 delta at its start
    day and a −1 the day after its end; one prefix sum over the
    per-day delta totals yields the running count.

    Plan: lineitem pre-combines per batch to (orderkey → max shipdate)
    — lineitem is orderkey-clustered, so this is a ~4× reduction
    before any data moves; ONE orderkey tagged-union shuffle co-locates
    those partials with the orders side; each partition finishes the
    max, attaches the order date with a sorted probe, and emits
    per-day delta partials bounded by the day domain (~2,500 at this
    lake's 7-year span). The prefix sum runs on the driver over that
    bounded table — a cumulative sum over an unbounded domain would
    instead need the sort+scan pattern of events_running_totals."""
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    )
    orders = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(li), row_bytes=16
    )

    def tag_li(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "key": b.column("l_orderkey"),
                "d": pc.cast(
                    pc.cast(b.column("l_shipdate"), pa.date32()), pa.int32()
                ),
            }
        ).group_by("key").aggregate([("d", "max")])
        ka = t.column("key").combine_chunks()
        return pa.table(
            {
                "part": _part_of(ka, n_parts),
                "key": ka,
                "tag": pa.array(np.zeros(len(t), np.int8)),
                "d": t.column("d_max"),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        ka = b.column("o_orderkey").combine_chunks()
        return pa.table(
            {
                "part": _part_of(ka, n_parts),
                "key": ka,
                "tag": pa.array(np.ones(len(b), np.int8)),
                "d": pc.cast(
                    pc.cast(b.column("o_orderdate"), pa.date32()), pa.int32()
                ),
            }
        )

    both = li.map_batches(tag_li, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def deltas(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        lsel = tag == 0
        lk, ld = key[lsel], d[lsel]
        ok, od = key[~lsel], d[~lsel]
        empty = pa.table(
            {
                "day": pa.array([], pa.int32()),
                "dd": pa.array([], pa.int64()),
            }
        )
        if not len(lk) or not len(ok):
            return empty
        # finish the per-order max across the lineitem partials
        order = np.lexsort((ld, lk))
        lk, ld = lk[order], ld[order]
        last = np.empty(len(lk), dtype=bool)
        last[:-1] = lk[1:] != lk[:-1]
        last[-1] = True
        ck, cd = lk[last], ld[last]
        # inner probe: orders with no lines drop (matches the SQL join)
        pos = np.minimum(np.searchsorted(ck, ok), len(ck) - 1)
        hit = ck[pos] == ok
        starts = od[hit]
        ends = cd[pos[hit]] + 1  # open through end day: −1 fires next day
        days = np.concatenate([starts, ends])
        dd = np.concatenate(
            [np.ones(len(starts), np.int64), -np.ones(len(ends), np.int64)]
        )
        ud, inv = np.unique(days, return_inverse=True)
        return pa.table(
            {
                "day": pa.array(ud.astype(np.int32), pa.int32()),
                "dd": pa.array(np.bincount(inv, weights=dd).astype(np.int64)),
            }
        )

    per_part = both.groupby("part").map_groups(deltas, batch_format="pyarrow")
    tbl = bounded_group_table_strict(per_part, ["day"], [("dd", "sum")])
    if tbl is None:
        return rd.from_arrow(
            pa.table(
                {
                    "day": pa.array([], pa.timestamp("us")),
                    "open_orders": pa.array([], pa.int64()),
                }
            )
        )
    day = tbl.column("day").to_numpy(zero_copy_only=False)
    dd = tbl.column("dd").to_numpy(zero_copy_only=False)
    order = np.argsort(day, kind="stable")
    out = pa.table(
        {
            "day": pa.array(day[order], pa.int32())
            .cast(pa.date32())
            .cast(pa.timestamp("us")),
            "open_orders": pa.array(np.cumsum(dd[order]).astype(np.int64)),
        }
    )
    return rd.from_arrow(out)


ORDERS_BACKLOG_SQL = """
WITH closed AS (
  SELECT l_orderkey, CAST(MAX(l_shipdate) AS DATE) AS end_d
  FROM lineitem GROUP BY l_orderkey
), iv AS (
  SELECT CAST(o_orderdate AS DATE) AS start_d, end_d
  FROM orders JOIN closed ON o_orderkey = l_orderkey
), deltas AS (
  SELECT start_d AS day, 1 AS dd FROM iv
  UNION ALL
  SELECT end_d + 1 AS day, -1 AS dd FROM iv
), agg AS (
  SELECT day, SUM(dd) AS dd FROM deltas GROUP BY day
)
SELECT CAST(day AS TIMESTAMP) AS day,
       CAST(SUM(dd) OVER (ORDER BY day) AS BIGINT) AS open_orders
FROM agg
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Market concentration: HHI of supplier revenue share per part brand.
# ---------------------------------------------------------------------------

def part_brand_hhi(
    sf_dir: str, num_partitions: int | None = None
) -> rd.Dataset:
    """(p_brand, n_suppliers, total_cents, hhi, top_share): within
    each part brand, how concentrated revenue is across suppliers —
    the Herfindahl–Hirschman index Σ(shareᵢ²) plus the largest single
    supplier's share.

    Plan: lineitem ships (partkey, suppkey, cents) rows into the
    size-gated generic ``join()`` against part's (partkey, brand)
    pair — broadcast probe while part is bounded, co-partitioned
    partkey shuffle past it; each joined batch pre-combines to
    (brand, suppkey) cent partials, reduced under the bounded-reduce
    guard (#brands × #suppliers rows). The driver then forms each
    brand's HHI from EXACT integer sums with arbitrary-precision
    Python ints — r² sums overflow int64 near SF 1k — and performs the
    identical float divisions the oracle writes."""
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": b.column("l_partkey"),
                "l_suppkey": b.column("l_suppkey"),
                "cents": _cents(
                    pc.multiply(
                        b.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), b.column("l_discount")),
                    )
                ),
            }
        )

    part = _read_pq(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    joined = join(
        li.map_batches(project, batch_format="pyarrow"),
        part,
        on=("l_partkey", "p_partkey"),
        num_partitions=num_partitions,
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "p_brand": b.column("p_brand"),
                "l_suppkey": b.column("l_suppkey"),
                "cents": b.column("cents"),
            }
        ).group_by(["p_brand", "l_suppkey"]).aggregate([("cents", "sum")])
        return t.rename_columns(["p_brand", "l_suppkey", "cents"])

    tbl = bounded_group_table_strict(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["p_brand", "l_suppkey"],
        [("cents", "sum")],
    )
    empty = pa.table(
        {
            "p_brand": pa.array([], pa.string()),
            "n_suppliers": pa.array([], pa.int64()),
            "total_cents": pa.array([], pa.int64()),
            "hhi": pa.array([], pa.float64()),
            "top_share": pa.array([], pa.float64()),
        }
    )
    if tbl is None:
        return rd.from_arrow(empty)
    brands = tbl.column("p_brand").to_pylist()
    cents = tbl.column("cents").to_pylist()  # python ints: exact r² sums
    acc: dict[str, list] = {}
    for br, r in zip(brands, cents):
        a = acc.setdefault(br, [0, 0, 0, 0])  # n, total, sum_sq, max
        a[0] += 1
        a[1] += r
        a[2] += r * r
        a[3] = max(a[3], r)
    rows = sorted(acc.items())
    tot = [a[1] for _, a in rows]
    out = pa.table(
        {
            "p_brand": pa.array([b for b, _ in rows], pa.string()),
            "n_suppliers": pa.array([a[0] for _, a in rows], pa.int64()),
            "total_cents": pa.array(tot, pa.int64()),
            "hhi": pa.array(
                [
                    float(a[2]) / (float(a[1]) * float(a[1])) if a[1] else 0.0
                    for _, a in rows
                ],
                pa.float64(),
            ),
            "top_share": pa.array(
                [
                    float(a[3]) / float(a[1]) if a[1] else 0.0
                    for _, a in rows
                ],
                pa.float64(),
            ),
        }
    )
    return rd.from_arrow(out)


PART_BRAND_HHI_SQL = """
WITH rev AS (
  SELECT p_brand, l_suppkey,
    SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        AS BIGINT)) AS r
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
)
SELECT p_brand,
  CAST(COUNT(*) AS BIGINT) AS n_suppliers,
  CAST(SUM(r) AS BIGINT) AS total_cents,
  CAST(SUM(r * r) AS DOUBLE)
    / (CAST(SUM(r) AS DOUBLE) * CAST(SUM(r) AS DOUBLE)) AS hhi,
  CAST(MAX(r) AS DOUBLE) / CAST(SUM(r) AS DOUBLE) AS top_share
FROM rev
GROUP BY p_brand
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# Inter-arrival statistics: per event type, gaps between each user's
# consecutive events.
# ---------------------------------------------------------------------------

def user_interarrival_stats(
    sf_dir: str, num_partitions: int | None = None
) -> rd.Dataset:
    """(event_type, n_gaps, sum_gap_us, max_gap_us, avg_gap_s): for
    each user's time-ordered event stream, the gap from the previous
    event, attributed to the LATER event's type and aggregated per
    type — the LAG-diff shape, sessionize's shuffle with a different
    reducer.

    Plan: one user-hash shuffle carrying (user, ts, event_id, type);
    each partition lexsorts once, diffs within user runs, and emits
    ≤|event types| partial rows; the driver reduce is bounded by the
    type domain. ``avg_gap_s`` is the single exact-integer division
    the oracle writes."""
    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(ds), row_bytes=32
    )

    def tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part": _part_of(b.column("user_id"), n_parts),
                "user_id": b.column("user_id"),
                "ts": pc.cast(b.column("ts"), pa.int64()),
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
            }
        )

    def gaps(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n_gaps": pa.array([], pa.int64()),
                "sum_gap_us": pa.array([], pa.int64()),
                "max_gap_us": pa.array([], pa.int64()),
            }
        )
        if len(uid) < 2:
            return empty
        order = np.lexsort((eid, ts, uid))
        u, t = uid[order], ts[order]
        same = np.zeros(len(u), dtype=bool)
        same[1:] = u[1:] == u[:-1]
        gap = np.empty(len(u), np.int64)
        gap[1:] = t[1:] - t[:-1]
        if not same.any():
            return empty
        typ = (
            g.column("event_type")
            .combine_chunks()
            .take(pa.array(order[same]))
        )
        return pa.table(
            {
                "event_type": typ,
                "n_gaps": pa.array(np.ones(int(same.sum()), np.int64)),
                "sum_gap_us": pa.array(gap[same]),
                "max_gap_us": pa.array(gap[same]),
            }
        ).group_by("event_type").aggregate(
            [("n_gaps", "sum"), ("sum_gap_us", "sum"), ("max_gap_us", "max")]
        ).rename_columns(
            ["event_type", "n_gaps", "sum_gap_us", "max_gap_us"]
        )

    per_part = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gaps, batch_format="pyarrow")
    )
    tbl = bounded_group_table_strict(
        per_part,
        ["event_type"],
        [("n_gaps", "sum"), ("sum_gap_us", "sum"), ("max_gap_us", "max")],
    )
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "n_gaps": pa.array([], pa.int64()),
            "sum_gap_us": pa.array([], pa.int64()),
            "max_gap_us": pa.array([], pa.int64()),
            "avg_gap_s": pa.array([], pa.float64()),
        }
    )
    if tbl is None:
        return rd.from_arrow(empty)
    n = tbl.column("n_gaps").to_numpy(zero_copy_only=False)
    s = tbl.column("sum_gap_us").to_numpy(zero_copy_only=False)
    out = tbl.append_column(
        "avg_gap_s",
        pa.array(s.astype(np.float64) / (n * 1_000_000.0), pa.float64()),
    )
    return rd.from_arrow(out).sort("event_type")


USER_INTERARRIVAL_SQL = """
WITH o AS (
  SELECT event_type, epoch_us(ts) AS t,
    LAG(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
    ) AS pt
  FROM events
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_gaps,
  CAST(SUM(t - pt) AS BIGINT) AS sum_gap_us,
  CAST(MAX(t - pt) AS BIGINT) AS max_gap_us,
  CAST(SUM(t - pt) AS DOUBLE) / (COUNT(*) * 1000000.0) AS avg_gap_s
FROM o
WHERE pt IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Winsorized (quantile-clipped) robust mean per event type.
# ---------------------------------------------------------------------------

def events_winsorized_stats(sf_dir: str) -> rd.Dataset:
    """(event_type, lo_cents, hi_cents, n, winsorized_mean_cents,
    n_clipped_low, n_clipped_high): per event type, the p01/p99
    ``quantile_disc`` clip bounds of the cent-quantized value and the
    mean after clipping to them — the robust-mean shape.

    Plan: ONE streaming histogram pass — per-batch (type, cents, n)
    count partials, reduced under the bounded-reduce guard (|value
    domain| × |types| rows, never the event count). The driver then
    walks each type's CDF for the bounds AND forms the clipped sum
    from the SAME histogram (Σ clip(c)·n — exact ints), so no second
    data pass exists; the mean is the single exact-integer division
    the oracle writes."""
    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "cents": _cents(b.column("value")),
            }
        )
        g = t.group_by(["event_type", "cents"]).aggregate([("cents", "count")])
        return g.rename_columns(["event_type", "cents", "n"])

    hist = bounded_group_table_strict(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "cents"],
        [("n", "sum")],
    )
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "lo_cents": pa.array([], pa.int64()),
            "hi_cents": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "winsorized_mean_cents": pa.array([], pa.float64()),
            "n_clipped_low": pa.array([], pa.int64()),
            "n_clipped_high": pa.array([], pa.int64()),
        }
    )
    if hist is None:
        return rd.from_arrow(empty)
    import math

    types = hist.column("event_type").to_pylist()
    cents = hist.column("cents").to_numpy(zero_copy_only=False)
    cnt = hist.column("n").to_numpy(zero_copy_only=False)
    rows = []
    for et in sorted(set(types)):
        sel = np.asarray([t == et for t in types])
        c, k = cents[sel], cnt[sel]
        order = np.argsort(c)
        c, k = c[order], k[order]
        cum = np.cumsum(k)
        n = int(cum[-1])
        # quantile_disc semantics: 0-indexed element ceil(q·n)−1
        lo = int(c[np.searchsorted(cum, math.ceil(0.01 * n))])
        hi = int(c[np.searchsorted(cum, math.ceil(0.99 * n))])
        clipped = np.clip(c, lo, hi)
        s = int(np.dot(clipped, k))
        rows.append(
            {
                "event_type": et,
                "lo_cents": lo,
                "hi_cents": hi,
                "n": n,
                "winsorized_mean_cents": float(s) / float(n),
                "n_clipped_low": int(k[c < lo].sum()),
                "n_clipped_high": int(k[c > hi].sum()),
            }
        )
    return rd.from_arrow(
        pa.table(
            {
                f: pa.array([r[f] for r in rows], empty.schema.field(f).type)
                for f in empty.schema.names
            }
        )
    )


EVENTS_WINSORIZED_SQL = """
WITH c AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
), b AS (
  SELECT event_type,
    CAST(quantile_disc(cents, 0.01) AS BIGINT) AS lo,
    CAST(quantile_disc(cents, 0.99) AS BIGINT) AS hi,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM c GROUP BY event_type
)
SELECT c.event_type, b.lo AS lo_cents, b.hi AS hi_cents, b.n,
  CAST(SUM(CASE WHEN cents < lo THEN lo
                WHEN cents > hi THEN hi
                ELSE cents END) AS DOUBLE) / CAST(b.n AS DOUBLE)
    AS winsorized_mean_cents,
  CAST(SUM(CASE WHEN cents < lo THEN 1 ELSE 0 END) AS BIGINT)
    AS n_clipped_low,
  CAST(SUM(CASE WHEN cents > hi THEN 1 ELSE 0 END) AS BIGINT)
    AS n_clipped_high
FROM c JOIN b USING (event_type)
GROUP BY c.event_type, b.lo, b.hi, b.n
ORDER BY c.event_type
"""


# ---------------------------------------------------------------------------
# Order fill-time distribution (derived-duration histogram).
# ---------------------------------------------------------------------------

def order_fill_times(
    sf_dir: str, num_partitions: int | None = None
) -> rd.Dataset:
    """(fill_days, n_orders): histogram of days from order placement
    to the LAST line shipment — the lead-time distribution.

    Plan: the backlog machinery with a different reducer — lineitem
    pre-combines per batch to (orderkey → max shipdate), ONE orderkey
    tagged-union shuffle, each partition finishes the max, probes the
    order date and emits per-duration count partials bounded by the
    day-span domain."""
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    )
    orders = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(li), row_bytes=16
    )

    def tag_li(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "key": b.column("l_orderkey"),
                "d": pc.cast(
                    pc.cast(b.column("l_shipdate"), pa.date32()), pa.int32()
                ),
            }
        ).group_by("key").aggregate([("d", "max")])
        ka = t.column("key").combine_chunks()
        return pa.table(
            {
                "part": _part_of(ka, n_parts),
                "key": ka,
                "tag": pa.array(np.zeros(len(t), np.int8)),
                "d": t.column("d_max"),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        ka = b.column("o_orderkey").combine_chunks()
        return pa.table(
            {
                "part": _part_of(ka, n_parts),
                "key": ka,
                "tag": pa.array(np.ones(len(b), np.int8)),
                "d": pc.cast(
                    pc.cast(b.column("o_orderdate"), pa.date32()), pa.int32()
                ),
            }
        )

    both = li.map_batches(tag_li, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def durations(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        lsel = tag == 0
        lk, ld = key[lsel], d[lsel]
        ok, od = key[~lsel], d[~lsel]
        empty = pa.table(
            {
                "fill_days": pa.array([], pa.int64()),
                "n_orders": pa.array([], pa.int64()),
            }
        )
        if not len(lk) or not len(ok):
            return empty
        order = np.lexsort((ld, lk))
        lk, ld = lk[order], ld[order]
        last = np.empty(len(lk), dtype=bool)
        last[:-1] = lk[1:] != lk[:-1]
        last[-1] = True
        ck, cd = lk[last], ld[last]
        pos = np.minimum(np.searchsorted(ck, ok), len(ck) - 1)
        hit = ck[pos] == ok
        days = cd[pos[hit]] - od[hit]
        ud, cnt = np.unique(days, return_counts=True)
        return pa.table(
            {
                "fill_days": pa.array(ud, pa.int64()),
                "n_orders": pa.array(cnt.astype(np.int64)),
            }
        )

    per_part = both.groupby("part").map_groups(
        durations, batch_format="pyarrow"
    )
    tbl = bounded_group_table_strict(
        per_part, ["fill_days"], [("n_orders", "sum")]
    )
    if tbl is None:
        tbl = pa.table(
            {
                "fill_days": pa.array([], pa.int64()),
                "n_orders": pa.array([], pa.int64()),
            }
        )
    return rd.from_arrow(tbl).sort("fill_days")


ORDER_FILL_TIMES_SQL = """
WITH closed AS (
  SELECT l_orderkey, CAST(MAX(l_shipdate) AS DATE) AS end_d
  FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(datediff('day', CAST(o_orderdate AS DATE), end_d) AS BIGINT)
         AS fill_days,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders JOIN closed ON o_orderkey = l_orderkey
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Hourly seasonal-baseline anomaly detection.
# ---------------------------------------------------------------------------

_ANOMALY_NUM = 2  # spike threshold: count ≥ 2× that hour-of-day's mean


def events_hourly_anomaly(sf_dir: str) -> rd.Dataset:
    """(day, hour, n, baseline, ratio): (date, hour) buckets whose
    event count is at least 2× the all-days mean for that HOUR OF DAY
    — seasonal-baseline spike detection. The filter is the INTEGER
    comparison ``n · n_days ≥ 2 · hour_total`` (exact under any
    partitioning); baseline and ratio are the single exact-int
    divisions the oracle writes.

    Plan: one shuffle-free per-batch (day, hour) count partial pass;
    the reduce and the driver-side baseline table are bounded by
    days × 24."""
    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False)
        day = ts.astype("M8[D]").astype(np.int64)
        hour = ts.astype("M8[h]").astype(np.int64) % 24
        key = day * 24 + hour
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "day": pa.array(uk // 24, pa.int64()),
                "hour": pa.array(uk % 24, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    tbl = bounded_group_table_strict(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day", "hour"],
        [("n", "sum")],
    )
    empty = pa.table(
        {
            "day": pa.array([], pa.timestamp("us")),
            "hour": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "baseline": pa.array([], pa.float64()),
            "ratio": pa.array([], pa.float64()),
        }
    )
    if tbl is None:
        return rd.from_arrow(empty)
    day = tbl.column("day").to_numpy(zero_copy_only=False)
    hour = tbl.column("hour").to_numpy(zero_copy_only=False)
    n = tbl.column("n").to_numpy(zero_copy_only=False)
    n_days = len(np.unique(day))
    hour_total = np.zeros(24, np.int64)
    np.add.at(hour_total, hour, n)
    ht = hour_total[hour]
    keep = (n * n_days) >= (_ANOMALY_NUM * ht)
    order = np.lexsort((hour[keep], day[keep]))
    dsel, hsel, nsel, htsel = (
        day[keep][order],
        hour[keep][order],
        n[keep][order],
        ht[keep][order],
    )
    return rd.from_arrow(
        pa.table(
            {
                "day": pa.array(dsel * 86_400_000_000, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "hour": pa.array(hsel, pa.int64()),
                "n": pa.array(nsel, pa.int64()),
                "baseline": pa.array(
                    htsel.astype(np.float64) / float(n_days), pa.float64()
                ),
                "ratio": pa.array(
                    (nsel * n_days).astype(np.float64)
                    / htsel.astype(np.float64),
                    pa.float64(),
                ),
            }
        )
    )


EVENTS_HOURLY_ANOMALY_SQL = f"""
WITH hb AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(hour(ts) AS BIGINT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), ht AS (
  SELECT hour, CAST(SUM(n) AS BIGINT) AS total FROM hb GROUP BY hour
), nd AS (
  SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days FROM hb
)
SELECT day, hb.hour, n,
  CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE) AS baseline,
  CAST(n * n_days AS DOUBLE) / CAST(total AS DOUBLE) AS ratio
FROM hb JOIN ht ON hb.hour = ht.hour CROSS JOIN nd
WHERE n * n_days >= {_ANOMALY_NUM} * total
ORDER BY day, hb.hour
"""


# ---------------------------------------------------------------------------
# Mann–Whitney U (rank-sum) between event-type value distributions.
# ---------------------------------------------------------------------------

def events_mannwhitney(sf_dir: str) -> rd.Dataset:
    """(type_a, type_b, n_a, n_b, u_a, auc): for every unordered pair
    of event types, the Mann–Whitney U statistic of their cent-
    quantized value distributions with average-rank tie handling, and
    the equivalent AUC (P(value_a > value_b) + ½P(tie)) — the
    nonparametric two-sample location test.

    Exactness: doubled rank sums are integers (2·avg_rank =
    2·cum_before + tie_count + 1), so U is an exact half-integer and
    halves are exact in binary doubles; AUC is the single division the
    oracle writes.

    Plan: ONE shuffle-free histogram pass — per-batch (type, cents, n)
    partials under the bounded-reduce guard (value domain × |types|);
    every pairwise rank walk runs on the driver over that bounded
    table."""
    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "cents": _cents(b.column("value")),
            }
        )
        g = t.group_by(["event_type", "cents"]).aggregate([("cents", "count")])
        return g.rename_columns(["event_type", "cents", "n"])

    hist = bounded_group_table_strict(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "cents"],
        [("n", "sum")],
    )
    empty = pa.table(
        {
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "u_a": pa.array([], pa.float64()),
            "auc": pa.array([], pa.float64()),
        }
    )
    if hist is None:
        return rd.from_arrow(empty)
    types = hist.column("event_type").to_pylist()
    cents = hist.column("cents").to_numpy(zero_copy_only=False)
    cnt = hist.column("n").to_numpy(zero_copy_only=False)
    by_type: dict[str, dict[int, int]] = {}
    for t, v, c in zip(types, cents, cnt):
        by_type.setdefault(t, {})[int(v)] = int(c)
    names = sorted(by_type)
    rows = []
    for i, ta in enumerate(names):
        for tb in names[i + 1:]:
            ha, hb = by_type[ta], by_type[tb]
            support = sorted(set(ha) | set(hb))
            na = sum(ha.values())
            nb = sum(hb.values())
            before = 0
            two_r = 0  # 2 × rank sum of side a, exact int
            for v in support:
                ca = ha.get(v, 0)
                cb = hb.get(v, 0)
                ct = ca + cb
                two_r += ca * (2 * before + ct + 1)
                before += ct
            u2 = two_r - na * (na + 1)  # 2·U_a
            rows.append(
                (
                    ta,
                    tb,
                    na,
                    nb,
                    float(u2) / 2.0,
                    (float(u2) / 2.0) / float(na * nb),
                )
            )
    return rd.from_arrow(
        pa.table(
            {
                "type_a": pa.array([r[0] for r in rows], pa.string()),
                "type_b": pa.array([r[1] for r in rows], pa.string()),
                "n_a": pa.array([r[2] for r in rows], pa.int64()),
                "n_b": pa.array([r[3] for r in rows], pa.int64()),
                "u_a": pa.array([r[4] for r in rows], pa.float64()),
                "auc": pa.array([r[5] for r in rows], pa.float64()),
            }
        )
    )


EVENTS_MANNWHITNEY_SQL = """
WITH q AS (
  SELECT event_type AS t,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
), h AS MATERIALIZED (
  SELECT t, v, CAST(COUNT(*) AS BIGINT) AS c FROM q GROUP BY t, v
), sizes AS MATERIALIZED (
  SELECT t, CAST(SUM(c) AS BIGINT) AS n FROM h GROUP BY t
), pairs AS (
  SELECT a.t AS ta, b.t AS tb, a.n AS na, b.n AS nb
  FROM sizes a JOIN sizes b ON a.t < b.t
), merged AS (
  SELECT p.ta, p.tb, p.na, p.nb, h.v,
    CAST(SUM(CASE WHEN h.t = p.ta THEN c ELSE 0 END) AS BIGINT) AS ca,
    CAST(SUM(CASE WHEN h.t = p.tb THEN c ELSE 0 END) AS BIGINT) AS cb
  FROM pairs p JOIN h ON h.t IN (p.ta, p.tb)
  GROUP BY 1, 2, 3, 4, 5
), ranked AS (
  SELECT ta, tb, na, nb, ca, cb,
    COALESCE(SUM(ca + cb) OVER (
      PARTITION BY ta, tb ORDER BY v
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS before,
    ca + cb AS ct
  FROM merged
)
SELECT ta AS type_a, tb AS type_b, na AS n_a, nb AS n_b,
  CAST(SUM(ca * (2 * before + ct + 1)) - na * (na + 1) AS DOUBLE) / 2.0
    AS u_a,
  (CAST(SUM(ca * (2 * before + ct + 1)) - na * (na + 1) AS DOUBLE) / 2.0)
    / CAST(na * nb AS DOUBLE) AS auc
FROM ranked
GROUP BY ta, tb, na, nb
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# Daily order vs event volume — FULL OUTER join through the generic API.
# ---------------------------------------------------------------------------

def order_event_days_outer(
    sf_dir: str, num_partitions: int | None = None
) -> rd.Dataset:
    """(day, n_orders, n_events): daily order volume full-outer-joined
    with daily event volume — days live in disjoint eras in this lake,
    so BOTH unmatched sides are exercised. Routes through the generic
    ``join(how="outer")`` (pipelines/join.py), the co-partitioned
    tagged-union path with coalesced keys.

    Plan: each side reduces to bounded per-day counts first (per-batch
    partials, day-domain reduce), so the outer join moves only
    day-count rows."""
    orders = _read_pq(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderdate"]
    )
    events = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def day_counts(col: str, out: str):
        def stage(b: pa.Table) -> pa.Table:
            d = (
                b.column(col)
                .to_numpy(zero_copy_only=False)
                .astype("M8[D]")
                .astype(np.int64)
            )
            u, c = np.unique(d, return_counts=True)
            return pa.table(
                {
                    "day": pa.array(u, pa.int64()),
                    out: pa.array(c.astype(np.int64)),
                }
            )

        return stage

    o_days = bounded_group_table_strict(
        orders.map_batches(day_counts("o_orderdate", "n_orders"),
                           batch_format="pyarrow"),
        ["day"],
        [("n_orders", "sum")],
    )
    e_days = bounded_group_table_strict(
        events.map_batches(day_counts("ts", "n_events"),
                           batch_format="pyarrow"),
        ["day"],
        [("n_events", "sum")],
    )
    if o_days is None:
        o_days = pa.table(
            {"day": pa.array([], pa.int64()), "n_orders": pa.array([], pa.int64())}
        )
    if e_days is None:
        e_days = pa.table(
            {"day": pa.array([], pa.int64()), "n_events": pa.array([], pa.int64())}
        )
    joined = join(
        rd.from_arrow(o_days),
        rd.from_arrow(e_days),
        on="day",
        how="outer",
        num_partitions=num_partitions,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.multiply(b.column("day"), 86_400_000_000).cast(
                    pa.timestamp("us")
                ),
                "n_orders": b.column("n_orders"),
                "n_events": b.column("n_events"),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow").sort("day")


ORDER_EVENT_DAYS_OUTER_SQL = """
WITH od AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
), ed AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
)
SELECT coalesce(od.day, ed.day) AS day, n_orders, n_events
FROM od FULL OUTER JOIN ed ON od.day = ed.day
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Grouped OLS: discount → revenue slope per part brand.
# ---------------------------------------------------------------------------

def brand_discount_trend(
    sf_dir: str, num_partitions: int | None = None
) -> rd.Dataset:
    """(p_brand, n, slope_cents_per_bp, mean_discount_bp): per part
    brand, the OLS slope of line revenue (exact cents) on discount
    (exact basis points) — does discounting move revenue, by brand.
    The grouped-regression shape with NO driver-side rank walk: every
    OLS moment (Σx, Σy, Σxy, Σx²) is an exact int64 per-batch partial,
    merged with arbitrary-precision Python ints on the bounded brand
    domain; slope and mean are the single divisions the oracle writes.

    Plan: lineitem ships (partkey, x, y) rows through the size-gated
    generic ``join()`` against part's (partkey, brand); each joined
    batch folds to per-brand moment partials (|brands| rows out per
    batch)."""
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": b.column("l_partkey"),
                "x": pc.cast(
                    pc.floor(
                        pc.add(
                            pc.multiply(b.column("l_discount"), 10_000.0), 0.5
                        )
                    ),
                    pa.int64(),
                ),
                "y": _cents(
                    pc.multiply(
                        b.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0), b.column("l_discount")),
                    )
                ),
            }
        )

    part = _read_pq(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    joined = join(
        li.map_batches(project, batch_format="pyarrow"),
        part,
        on=("l_partkey", "p_partkey"),
        num_partitions=num_partitions,
    )

    def moments(b: pa.Table) -> pa.Table:
        br = b.column("p_brand").combine_chunks()
        enc = br.dictionary_encode()
        gi = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        x = b.column("x").to_numpy(zero_copy_only=False)
        y = b.column("y").to_numpy(zero_copy_only=False)
        k = len(enc.dictionary)
        if not k:
            return pa.table(
                {
                    "p_brand": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "sx": pa.array([], pa.int64()),
                    "sy": pa.array([], pa.int64()),
                    "sxy": pa.array([], pa.int64()),
                    "sxx": pa.array([], pa.int64()),
                }
            )
        n = np.bincount(gi, minlength=k).astype(np.int64)
        sx = np.bincount(gi, weights=x, minlength=k).astype(np.int64)
        sy = np.bincount(gi, weights=y, minlength=k).astype(np.int64)
        sxy = np.bincount(gi, weights=x * y, minlength=k).astype(np.int64)
        sxx = np.bincount(gi, weights=x * x, minlength=k).astype(np.int64)
        return pa.table(
            {
                "p_brand": enc.dictionary,
                "n": pa.array(n),
                "sx": pa.array(sx),
                "sy": pa.array(sy),
                "sxy": pa.array(sxy),
                "sxx": pa.array(sxx),
            }
        )

    tbl = bounded_group_table_strict(
        joined.map_batches(moments, batch_format="pyarrow"),
        ["p_brand"],
        [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
         ("sxy", "sum"), ("sxx", "sum")],
    )
    empty = pa.table(
        {
            "p_brand": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "slope": pa.array([], pa.float64()),
            "mean_discount_bp": pa.array([], pa.float64()),
        }
    )
    if tbl is None:
        return rd.from_arrow(empty)
    rows = sorted(
        zip(
            tbl.column("p_brand").to_pylist(),
            tbl.column("n").to_pylist(),
            tbl.column("sx").to_pylist(),
            tbl.column("sy").to_pylist(),
            tbl.column("sxy").to_pylist(),
            tbl.column("sxx").to_pylist(),
        )
    )
    out_b, out_n, out_s, out_m = [], [], [], []
    for br, n, sx, sy, sxy, sxx in rows:
        den = n * sxx - sx * sx
        num = n * sxy - sx * sy
        out_b.append(br)
        out_n.append(n)
        out_s.append(float(num) / float(den) if den else 0.0)
        out_m.append(float(sx) / float(n) if n else 0.0)
    return rd.from_arrow(
        pa.table(
            {
                "p_brand": pa.array(out_b, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "slope": pa.array(out_s, pa.float64()),
                "mean_discount_bp": pa.array(out_m, pa.float64()),
            }
        )
    )


BRAND_DISCOUNT_TREND_SQL = """
WITH q AS (
  SELECT p_brand,
    CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS x,
    CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
         AS BIGINT) AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
  CASE WHEN COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) = 0 THEN 0.0
       ELSE CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE)
          / CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE)
  END AS slope,
  CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_discount_bp
FROM q
GROUP BY p_brand
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# Customer revenue-quintile migration between two years.
# ---------------------------------------------------------------------------

_MIGRATION_QS = [0.2, 0.4, 0.6, 0.8]


def customer_segment_migration(
    sf_dir: str,
    year_a: int = 1995,
    year_b: int = 1996,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(q_from, q_to, n_customers): each customer's revenue quintile in
    ``year_a`` vs ``year_b`` (0 = inactive that year) — the
    segment-migration matrix. Buckets are THRESHOLD cuts from exact
    ``quantile_disc`` values over the active customers of each year
    (1 + Σ(v > tᵢ)), deterministic under ties where NTILE is not.

    Plan: one custkey-hash shuffle builds the per-customer
    (year_a cents, year_b cents) table; the two threshold sets come
    from the radix quantile machinery (two counting passes each, no
    sort) over that materialized customer-level dataset; the final
    matrix reduce is ≤ 36 cells."""
    from ..functions.selection import radix_quantiles_by_group

    lo = np.datetime64(f"{year_a}-01-01", "us")
    hi = np.datetime64(f"{year_b + 1}-01-01", "us")
    orders = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
        filter=(
            (pc.field("o_orderdate") >= pa.scalar(lo.item()))
            & (pc.field("o_orderdate") < pa.scalar(hi.item()))
        ),
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(orders), row_bytes=24
    )

    def tag(b: pa.Table) -> pa.Table:
        yr = (
            b.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("M8[Y]")
            .astype(np.int64)
            + 1970
        )
        keep = (yr == year_a) | (yr == year_b)
        cust = b.column("o_custkey").to_numpy(zero_copy_only=False)[keep]
        cents = _cents(b.column("o_totalprice")).to_numpy(
            zero_copy_only=False
        )[keep]
        ka = pa.array(cust, pa.int64())
        return pa.table(
            {
                "part": _part_of(ka, n_parts),
                "cust": ka,
                "is_b": pa.array((yr[keep] == year_b).astype(np.int8)),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def totals(g: pa.Table) -> pa.Table:
        cust = g.column("cust").to_numpy(zero_copy_only=False)
        isb = g.column("is_b").to_numpy(zero_copy_only=False)
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        if not len(cust):
            return pa.table(
                {
                    "cust": pa.array([], pa.int64()),
                    "va": pa.array([], pa.int64()),
                    "vb": pa.array([], pa.int64()),
                }
            )
        u, inv = np.unique(cust, return_inverse=True)
        va = np.zeros(len(u), np.int64)
        vb = np.zeros(len(u), np.int64)
        np.add.at(va, inv[isb == 0], cents[isb == 0])
        np.add.at(vb, inv[isb == 1], cents[isb == 1])
        return pa.table(
            {
                "cust": pa.array(u, pa.int64()),
                "va": pa.array(va),
                "vb": pa.array(vb),
            }
        )

    customers = (
        orders.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(totals, batch_format="pyarrow")
        .materialize()
    )

    # ONE grouped two-pass quantile over both years (stacked), instead
    # of two separate radix calls — halves the passes over the
    # customer-level dataset (measured 4.5 → ~2 s at sf0.1)
    def stack(b: pa.Table) -> pa.Table:
        va = b.column("va").filter(pc.greater(b.column("va"), 0))
        vb = b.column("vb").filter(pc.greater(b.column("vb"), 0))
        return pa.table(
            {
                "yr": pa.array(
                    ["a"] * len(va) + ["b"] * len(vb), pa.string()
                ),
                "v": pa.concat_arrays(
                    [va.combine_chunks(), vb.combine_chunks()]
                ),
            }
        )

    qt = radix_quantiles_by_group(
        customers.map_batches(stack, batch_format="pyarrow"),
        "yr",
        "v",
        _MIGRATION_QS,
    )
    ta: "list[int] | None" = None
    tb: "list[int] | None" = None
    if qt is not None:
        g = qt.column("grp").to_pylist()
        vals = qt.column("value").to_pylist()
        a_vals = [int(v) for gg, v in zip(g, vals) if gg == "a"]
        b_vals = [int(v) for gg, v in zip(g, vals) if gg == "b"]
        ta = a_vals or None
        tb = b_vals or None

    def bucket(v: np.ndarray, ts: "list[int] | None") -> np.ndarray:
        out = np.zeros(len(v), np.int64)
        act = v > 0
        if ts is None:
            return out
        b = np.ones(act.sum(), np.int64)
        for t in ts:
            b += (v[act] > t).astype(np.int64)
        out[act] = b
        return out

    def cells(b: pa.Table) -> pa.Table:
        va = b.column("va").to_numpy(zero_copy_only=False)
        vb = b.column("vb").to_numpy(zero_copy_only=False)
        qa = bucket(va, ta)
        qb = bucket(vb, tb)
        key = qa * 6 + qb
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "q_from": pa.array(u // 6, pa.int64()),
                "q_to": pa.array(u % 6, pa.int64()),
                "n_customers": pa.array(c.astype(np.int64)),
            }
        )

    tbl = bounded_group_table_strict(
        customers.map_batches(cells, batch_format="pyarrow"),
        ["q_from", "q_to"],
        [("n_customers", "sum")],
    )
    if tbl is None:
        tbl = pa.table(
            {
                "q_from": pa.array([], pa.int64()),
                "q_to": pa.array([], pa.int64()),
                "n_customers": pa.array([], pa.int64()),
            }
        )
    return rd.from_arrow(tbl).sort(["q_from", "q_to"])


def _sql_customer_segment_migration(
    year_a: int = 1995, year_b: int = 1996
) -> str:
    return f"""
WITH t AS (
  SELECT o_custkey AS c, year(o_orderdate) AS y,
    SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS v
  FROM orders
  WHERE year(o_orderdate) IN ({year_a}, {year_b})
  GROUP BY 1, 2
), w AS MATERIALIZED (
  SELECT c,
    COALESCE(MAX(CASE WHEN y = {year_a} THEN v END), 0) AS va,
    COALESCE(MAX(CASE WHEN y = {year_b} THEN v END), 0) AS vb
  FROM t GROUP BY c
), qa AS (
  SELECT quantile_disc(va, 0.2) AS t1, quantile_disc(va, 0.4) AS t2,
         quantile_disc(va, 0.6) AS t3, quantile_disc(va, 0.8) AS t4
  FROM w WHERE va > 0
), qb AS (
  SELECT quantile_disc(vb, 0.2) AS t1, quantile_disc(vb, 0.4) AS t2,
         quantile_disc(vb, 0.6) AS t3, quantile_disc(vb, 0.8) AS t4
  FROM w WHERE vb > 0
)
SELECT
  CAST(CASE WHEN va = 0 THEN 0
       ELSE 1 + CAST(va > qa.t1 AS INT) + CAST(va > qa.t2 AS INT)
              + CAST(va > qa.t3 AS INT) + CAST(va > qa.t4 AS INT)
       END AS BIGINT) AS q_from,
  CAST(CASE WHEN vb = 0 THEN 0
       ELSE 1 + CAST(vb > qb.t1 AS INT) + CAST(vb > qb.t2 AS INT)
              + CAST(vb > qb.t3 AS INT) + CAST(vb > qb.t4 AS INT)
       END AS BIGINT) AS q_to,
  CAST(COUNT(*) AS BIGINT) AS n_customers
FROM w CROSS JOIN qa CROSS JOIN qb
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Markov predictability of the next event type.
# ---------------------------------------------------------------------------

def event_transition_predictability(sf_dir: str) -> rd.Dataset:
    """(prev_type, predicted_next, n_total, n_hit, hit_rate): for each
    event type, the most likely NEXT type in users' time-ordered
    streams (tie → type-ascending) and the accuracy a
    predict-the-mode baseline achieves — how deterministic the event
    process is per state.

    Plan: composes the distributed transition-count shuffle
    (decision.event_transitions); the driver walk is bounded by
    |types|²; hit_rate is the single exact-int division the oracle
    writes."""
    from .decision import event_transitions

    rows = event_transitions(sf_dir).take_all()
    empty = pa.table(
        {
            "prev_type": pa.array([], pa.string()),
            "predicted_next": pa.array([], pa.string()),
            "n_total": pa.array([], pa.int64()),
            "n_hit": pa.array([], pa.int64()),
            "hit_rate": pa.array([], pa.float64()),
        }
    )
    if not rows:
        return rd.from_arrow(empty)
    acc: dict[str, list] = {}
    for r in rows:
        a = acc.setdefault(r["prev_type"], [0, None, 0])  # total, best, bestn
        n = int(r["n"])
        a[0] += n
        # mode with tie → type ascending
        if n > a[2] or (n == a[2] and (a[1] is None or r["next_type"] < a[1])):
            a[1], a[2] = r["next_type"], n
    out = sorted(acc.items())
    return rd.from_arrow(
        pa.table(
            {
                "prev_type": pa.array([k for k, _ in out], pa.string()),
                "predicted_next": pa.array(
                    [a[1] for _, a in out], pa.string()
                ),
                "n_total": pa.array([a[0] for _, a in out], pa.int64()),
                "n_hit": pa.array([a[2] for _, a in out], pa.int64()),
                "hit_rate": pa.array(
                    [float(a[2]) / float(a[0]) for _, a in out], pa.float64()
                ),
            }
        )
    )


EVENT_PREDICTABILITY_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), tc AS (
  SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM s WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
), best AS (
  SELECT prev_type, next_type, n,
    ROW_NUMBER() OVER (
      PARTITION BY prev_type ORDER BY n DESC, next_type ASC
    ) AS rk,
    SUM(n) OVER (PARTITION BY prev_type) AS total
  FROM tc
)
SELECT prev_type, next_type AS predicted_next,
  CAST(total AS BIGINT) AS n_total,
  n AS n_hit,
  CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS hit_rate
FROM best WHERE rk = 1
ORDER BY prev_type
"""


# ---------------------------------------------------------------------------
# Event-type user-overlap (co-engagement Jaccard).
# ---------------------------------------------------------------------------

def event_type_user_overlap(
    sf_dir: str, num_partitions: int | None = None
) -> rd.Dataset:
    """(type_a, type_b, n_a, n_b, n_common, n_union, jaccard): for each
    unordered event-type pair, the exact Jaccard overlap of their USER
    sets — the co-engagement matrix.

    Plan: one user-hash shuffle of batch-distinct (user, type) pairs;
    each partition owns its users outright, so a (user × type) boolean
    matmul gives intersection partials; global per-type sizes ride
    along as self-pair rows (the lang_vocab_overlap discipline)."""
    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type"],
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(ds), row_bytes=16
    )

    def pairs(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": b.column("user_id"),
                "event_type": b.column("event_type"),
            }
        ).group_by(["user_id", "event_type"]).aggregate([])
        ka = t.column("user_id").combine_chunks()
        return pa.table(
            {
                "part": _part_of(ka, n_parts),
                "user_id": ka,
                "event_type": t.column("event_type"),
            }
        )

    def overlap(g: pa.Table) -> pa.Table:
        t = (
            g.select(["user_id", "event_type"])
            .group_by(["user_id", "event_type"])
            .aggregate([])
        )
        et = t.column("event_type").combine_chunks().dictionary_encode()
        ei = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        edict = [str(x) for x in et.dictionary.to_pylist()]
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        _, ui = np.unique(uid, return_inverse=True)
        n_u = ui.max() + 1 if len(ui) else 0
        k = len(edict)
        empty = pa.table(
            {
                "type_a": pa.array([], pa.string()),
                "type_b": pa.array([], pa.string()),
                "n_common": pa.array([], pa.int64()),
            }
        )
        if not k or not n_u:
            return empty
        mem = np.zeros((n_u, k), dtype=bool)
        mem[ui, ei] = True
        inter = mem.T.astype(np.int64) @ mem.astype(np.int64)
        order = np.argsort(np.asarray(edict, dtype=object), kind="stable")
        out_a, out_b, out_c = [], [], []
        for ii in range(k):
            i = order[ii]
            out_a.append(edict[i])
            out_b.append(edict[i])
            out_c.append(int(inter[i, i]))  # per-type user count
            for jj in range(ii + 1, k):
                j = order[jj]
                c = int(inter[i, j])
                if c:
                    out_a.append(edict[i])
                    out_b.append(edict[j])
                    out_c.append(c)
        return pa.table(
            {
                "type_a": pa.array(out_a, pa.string()),
                "type_b": pa.array(out_b, pa.string()),
                "n_common": pa.array(out_c, pa.int64()),
            }
        )

    per_part = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(overlap, batch_format="pyarrow")
    )
    tbl = bounded_group_table_strict(
        per_part, ["type_a", "type_b"], [("n_common", "sum")]
    )
    empty = pa.table(
        {
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "n_common": pa.array([], pa.int64()),
            "n_union": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    if tbl is None:
        return rd.from_arrow(empty)
    ta = tbl.column("type_a").to_pylist()
    tb = tbl.column("type_b").to_pylist()
    nc = tbl.column("n_common").to_numpy(zero_copy_only=False)
    sizes = {a: int(c) for a, b, c in zip(ta, tb, nc) if a == b}
    rows = sorted((a, b, int(c)) for a, b, c in zip(ta, tb, nc) if a != b)
    return rd.from_arrow(
        pa.table(
            {
                "type_a": pa.array([r[0] for r in rows], pa.string()),
                "type_b": pa.array([r[1] for r in rows], pa.string()),
                "n_a": pa.array([sizes[r[0]] for r in rows], pa.int64()),
                "n_b": pa.array([sizes[r[1]] for r in rows], pa.int64()),
                "n_common": pa.array([r[2] for r in rows], pa.int64()),
                "n_union": pa.array(
                    [sizes[r[0]] + sizes[r[1]] - r[2] for r in rows],
                    pa.int64(),
                ),
                "jaccard": pa.array(
                    [
                        float(r[2]) / float(sizes[r[0]] + sizes[r[1]] - r[2])
                        for r in rows
                    ],
                    pa.float64(),
                ),
            }
        )
    )


EVENT_TYPE_USER_OVERLAP_SQL = """
WITH ut AS MATERIALIZED (
  SELECT DISTINCT user_id, event_type FROM events
), sizes AS MATERIALIZED (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut
  GROUP BY event_type
), common AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT ta AS type_a, tb AS type_b,
  sa.n AS n_a, sb.n AS n_b, c AS n_common,
  sa.n + sb.n - c AS n_union,
  CAST(c AS DOUBLE) / CAST(sa.n + sb.n - c AS DOUBLE) AS jaccard
FROM common
JOIN sizes sa ON ta = sa.event_type
JOIN sizes sb ON tb = sb.event_type
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# Per-supplier shipping delay league table.
# ---------------------------------------------------------------------------

def supplier_ship_delay(
    sf_dir: str, num_partitions: int | None = None
) -> rd.Dataset:
    """(l_suppkey, n_lines, sum_delay_days, max_delay_days,
    avg_delay_days): per supplier, line-level shipping delay
    (l_shipdate − o_orderdate in whole days) — the fulfilment league
    table.

    Plan: ONE orderkey tagged-union shuffle attaches the order date to
    each line (the orders side ships (okey, date) only); each
    partition then emits per-supplier partials (n, Σdelay, max),
    reduced under the bounded-reduce guard on the supplier domain;
    the average is the single exact-int division the oracle writes."""
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(li), row_bytes=24
    )

    def tag_li(b: pa.Table) -> pa.Table:
        ka = b.column("l_orderkey").combine_chunks()
        return pa.table(
            {
                "part": _part_of(ka, n_parts),
                "key": ka,
                "tag": pa.array(np.zeros(len(b), np.int8)),
                "d": pc.cast(
                    pc.cast(b.column("l_shipdate"), pa.date32()), pa.int32()
                ),
                "supp": b.column("l_suppkey"),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        ka = b.column("o_orderkey").combine_chunks()
        return pa.table(
            {
                "part": _part_of(ka, n_parts),
                "key": ka,
                "tag": pa.array(np.ones(len(b), np.int8)),
                "d": pc.cast(
                    pc.cast(b.column("o_orderdate"), pa.date32()), pa.int32()
                ),
                "supp": pa.nulls(len(b), pa.int64()),
            }
        )

    both = li.map_batches(tag_li, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def delays(g: pa.Table) -> pa.Table:
        tag = g.column("tag").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {
                "l_suppkey": pa.array([], pa.int64()),
                "n_lines": pa.array([], pa.int64()),
                "sum_delay_days": pa.array([], pa.int64()),
                "max_delay_days": pa.array([], pa.int64()),
            }
        )
        osel = tag == 1
        ok, od = key[osel], d[osel]
        lsel = ~osel
        if not osel.any() or not lsel.any():
            return empty
        order = np.argsort(ok, kind="stable")
        ok, od = ok[order], od[order]
        lk = key[lsel]
        pos = np.minimum(np.searchsorted(ok, lk), len(ok) - 1)
        hit = ok[pos] == lk
        delay = d[lsel][hit] - od[pos[hit]]
        supp = (
            g.column("supp")
            .to_numpy(zero_copy_only=False)[lsel][hit]
            .astype(np.int64)
        )
        u, inv = np.unique(supp, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.bincount(inv, weights=delay).astype(np.int64)
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, delay)
        return pa.table(
            {
                "l_suppkey": pa.array(u, pa.int64()),
                "n_lines": pa.array(n),
                "sum_delay_days": pa.array(s),
                "max_delay_days": pa.array(mx),
            }
        )

    per_part = both.groupby("part").map_groups(delays, batch_format="pyarrow")
    tbl = bounded_group_table_strict(
        per_part,
        ["l_suppkey"],
        [("n_lines", "sum"), ("sum_delay_days", "sum"),
         ("max_delay_days", "max")],
    )
    empty = pa.table(
        {
            "l_suppkey": pa.array([], pa.int64()),
            "n_lines": pa.array([], pa.int64()),
            "sum_delay_days": pa.array([], pa.int64()),
            "max_delay_days": pa.array([], pa.int64()),
            "avg_delay_days": pa.array([], pa.float64()),
        }
    )
    if tbl is None:
        return rd.from_arrow(empty)
    n = tbl.column("n_lines").to_numpy(zero_copy_only=False)
    s = tbl.column("sum_delay_days").to_numpy(zero_copy_only=False)
    out = tbl.append_column(
        "avg_delay_days",
        pa.array(s.astype(np.float64) / n.astype(np.float64), pa.float64()),
    )
    return rd.from_arrow(out).sort("l_suppkey")


SUPPLIER_SHIP_DELAY_SQL = """
SELECT l_suppkey,
  CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM(datediff('day', CAST(o_orderdate AS DATE),
                    CAST(l_shipdate AS DATE))) AS BIGINT)
    AS sum_delay_days,
  CAST(MAX(datediff('day', CAST(o_orderdate AS DATE),
                    CAST(l_shipdate AS DATE))) AS BIGINT)
    AS max_delay_days,
  CAST(SUM(datediff('day', CAST(o_orderdate AS DATE),
                    CAST(l_shipdate AS DATE))) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS avg_delay_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_suppkey
ORDER BY l_suppkey
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit over order totals.
# ---------------------------------------------------------------------------

def benford_digits(sf_dir: str) -> rd.Dataset:
    """(digit, n_obs, share, benford_p, chi2_contrib): the leading
    significant digit distribution of ``o_totalprice`` against
    Benford's law — the classic fabricated-data audit. Counts are
    exact int64 bincounts (digit extraction is integer arithmetic on
    exact cents, no float log); the three floats are per-digit single
    expressions (share, log10 ratio, one χ² term), so no float SUM of
    unordered addends exists anywhere — each row is independently
    deterministic.

    Plan: one shuffle-free per-batch digit-count pass; 9-row reduce."""
    import math

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_totalprice"]
    )

    def partial(b: pa.Table) -> pa.Table:
        cents = _cents(b.column("o_totalprice")).to_numpy(
            zero_copy_only=False
        )
        v = cents[cents > 0]
        # leading digit via integer halving-by-10 (no float log)
        while True:
            big = v >= 10
            if not big.any():
                break
            v = np.where(big, v // 10, v)
        cnt = np.bincount(v, minlength=10)[1:10].astype(np.int64)
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                "n_obs": pa.array(cnt),
            }
        )

    tbl = bounded_group_table_strict(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["digit"],
        [("n_obs", "sum")],
    )
    empty = pa.table(
        {
            "digit": pa.array([], pa.int64()),
            "n_obs": pa.array([], pa.int64()),
            "share": pa.array([], pa.float64()),
            "benford_p": pa.array([], pa.float64()),
            "chi2_contrib": pa.array([], pa.float64()),
        }
    )
    if tbl is None:
        return rd.from_arrow(empty)
    dig = tbl.column("digit").to_numpy(zero_copy_only=False)
    n = tbl.column("n_obs").to_numpy(zero_copy_only=False)
    order = np.argsort(dig, kind="stable")
    dig, n = dig[order], n[order]
    total = int(n.sum())
    shares, ps, chis = [], [], []
    for d, c in zip(dig, n):
        p = math.log10(1.0 + 1.0 / float(d))
        e = total * p
        shares.append(float(c) / float(total) if total else 0.0)
        ps.append(p)
        chis.append((float(c) - e) * (float(c) - e) / e if e else 0.0)
    return rd.from_arrow(
        pa.table(
            {
                "digit": pa.array(dig, pa.int64()),
                "n_obs": pa.array(n, pa.int64()),
                "share": pa.array(shares, pa.float64()),
                "benford_p": pa.array(ps, pa.float64()),
                "chi2_contrib": pa.array(chis, pa.float64()),
            }
        )
    )


BENFORD_DIGITS_SQL = """
WITH c AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders
  WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > 0
), d AS (
  -- leading digit via the decimal string: exact for every int64,
  -- immune to float log10 boundary error at exact powers of ten
  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM c
), h AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY digit
), t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS total FROM h)
SELECT digit, n_obs,
  CAST(n_obs AS DOUBLE) / CAST(total AS DOUBLE) AS share,
  log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS benford_p,
  (CAST(n_obs AS DOUBLE) - total * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
    * (CAST(n_obs AS DOUBLE) - total * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)))
    / (total * log10(1.0 + 1.0 / CAST(digit AS DOUBLE))) AS chi2_contrib
FROM h CROSS JOIN t
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# Order size histogram (count-of-counts).
# ---------------------------------------------------------------------------

def order_size_histogram(
    sf_dir: str, num_partitions: int | None = None
) -> rd.Dataset:
    """(n_lines, n_orders): how many orders have k lines — the
    count-of-counts / degree-distribution shape on the fact table.

    Plan: lineitem pre-combines per batch to (orderkey, partial
    count); one orderkey-hash shuffle finishes the counts per
    partition and emits ≤|line-count domain| histogram partials (TPC-H
    caps at 7)."""
    li = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey"]
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(li), row_bytes=16
    )

    def tag(b: pa.Table) -> pa.Table:
        t = (
            pa.table({"key": b.column("l_orderkey")})
            .group_by("key")
            .aggregate([([], "count_all")])
        )
        ka = t.column("key").combine_chunks()
        return pa.table(
            {
                "part": _part_of(ka, n_parts),
                "key": ka,
                "n": pc.cast(t.column("count_all"), pa.int64()),
            }
        )

    def hist(g: pa.Table) -> pa.Table:
        key = g.column("key").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        if not len(key):
            return pa.table(
                {
                    "n_lines": pa.array([], pa.int64()),
                    "n_orders": pa.array([], pa.int64()),
                }
            )
        u, inv = np.unique(key, return_inverse=True)
        per = np.bincount(inv, weights=n).astype(np.int64)
        sizes, cnt = np.unique(per, return_counts=True)
        return pa.table(
            {
                "n_lines": pa.array(sizes, pa.int64()),
                "n_orders": pa.array(cnt.astype(np.int64)),
            }
        )

    per_part = (
        li.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(hist, batch_format="pyarrow")
    )
    tbl = bounded_group_table_strict(
        per_part, ["n_lines"], [("n_orders", "sum")]
    )
    if tbl is None:
        tbl = pa.table(
            {
                "n_lines": pa.array([], pa.int64()),
                "n_orders": pa.array([], pa.int64()),
            }
        )
    return rd.from_arrow(tbl).sort("n_lines")


ORDER_SIZE_HISTOGRAM_SQL = """
SELECT n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders FROM (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey
) GROUP BY n_lines ORDER BY n_lines
"""


# ---------------------------------------------------------------------------
# Repeat-purchase gap quantiles.
# ---------------------------------------------------------------------------

_ORDER_GAP_QS = [0.25, 0.5, 0.75, 0.9]


def order_gap_quantiles(
    sf_dir: str, num_partitions: int | None = None
) -> rd.Dataset:
    """(q, gap_days): exact ``quantile_disc`` of the day gaps between
    each customer's consecutive orders — the repeat-purchase cadence.

    Plan: the sessionize shuffle (custkey-hash, one lexsort per
    partition) emits per-partition GAP-HISTOGRAM partials (day domain
    ≤ the lake's span); the CDF walk over the bounded merged histogram
    runs on the driver."""
    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
    )
    n_parts = num_partitions or adaptive_partitions(
        parquet_rows_hint(ds), row_bytes=24
    )

    def tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part": _part_of(b.column("o_custkey"), n_parts),
                "cust": b.column("o_custkey"),
                "d": pc.cast(
                    pc.cast(b.column("o_orderdate"), pa.date32()), pa.int32()
                ),
                "okey": b.column("o_orderkey"),
            }
        )

    def gaps(g: pa.Table) -> pa.Table:
        cust = g.column("cust").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        okey = g.column("okey").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                "gap": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if len(cust) < 2:
            return empty
        order = np.lexsort((okey, d, cust))
        c, dd = cust[order], d[order]
        same = np.zeros(len(c), dtype=bool)
        same[1:] = c[1:] == c[:-1]
        gap = np.empty(len(c), np.int64)
        gap[1:] = dd[1:] - dd[:-1]
        if not same.any():
            return empty
        u, cnt = np.unique(gap[same], return_counts=True)
        return pa.table(
            {
                "gap": pa.array(u, pa.int64()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    hist = bounded_group_table_strict(
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gaps, batch_format="pyarrow"),
        ["gap"],
        [("n", "sum")],
    )
    empty = pa.table(
        {
            "q": pa.array([], pa.float64()),
            "gap_days": pa.array([], pa.int64()),
        }
    )
    if hist is None:
        return rd.from_arrow(empty)
    import math

    gap = hist.column("gap").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(gap, kind="stable")
    gap, n = gap[order], n[order]
    cum = np.cumsum(n)
    total = int(cum[-1])
    vals = [
        int(gap[np.searchsorted(cum, math.ceil(q * total))])
        for q in _ORDER_GAP_QS
    ]
    return rd.from_arrow(
        pa.table(
            {
                "q": pa.array(_ORDER_GAP_QS, pa.float64()),
                "gap_days": pa.array(vals, pa.int64()),
            }
        )
    )


ORDER_GAP_QUANTILES_SQL = """
WITH s AS (
  SELECT CAST(datediff('day',
           LAG(CAST(o_orderdate AS DATE)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           CAST(o_orderdate AS DATE)) AS BIGINT) AS gap
  FROM orders
), g AS (SELECT gap FROM s WHERE gap IS NOT NULL)
SELECT 0.25::DOUBLE AS q, CAST(quantile_disc(gap, 0.25) AS BIGINT)
  AS gap_days FROM g
UNION ALL
SELECT 0.5::DOUBLE, CAST(quantile_disc(gap, 0.5) AS BIGINT) FROM g
UNION ALL
SELECT 0.75::DOUBLE, CAST(quantile_disc(gap, 0.75) AS BIGINT) FROM g
UNION ALL
SELECT 0.9::DOUBLE, CAST(quantile_disc(gap, 0.9) AS BIGINT) FROM g
ORDER BY q
"""


# ---------------------------------------------------------------------------
# Hour-of-day seasonality lift per event type.
# ---------------------------------------------------------------------------

def events_seasonality_index(sf_dir: str) -> rd.Dataset:
    """(event_type, hour, n, type_share, global_share, lift): each
    type's hour-of-day activity share against the all-types hour
    profile — the seasonality-lift heatmap (lift > 1 ⇒ the type
    over-indexes in that hour). All shares and the lift are single
    divisions / one ratio of exact int64 counts.

    Plan: one shuffle-free per-batch (type, hour) count pass; the
    reduce and the driver's lift table are bounded by |types| × 24."""
    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        hour = (
            b.column("ts").to_numpy(zero_copy_only=False)
            .astype("M8[h]")
            .astype(np.int64)
            % 24
        )
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "hour": pa.array(hour, pa.int64()),
            }
        ).group_by(["event_type", "hour"]).aggregate([([], "count_all")])
        return t.rename_columns(["event_type", "hour", "n"]).set_column(
            2, "n", pc.cast(t.column(2), pa.int64())
        )

    tbl = bounded_group_table_strict(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "hour"],
        [("n", "sum")],
    )
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "hour": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "type_share": pa.array([], pa.float64()),
            "global_share": pa.array([], pa.float64()),
            "lift": pa.array([], pa.float64()),
        }
    )
    if tbl is None:
        return rd.from_arrow(empty)
    et = tbl.column("event_type").to_pylist()
    hr = tbl.column("hour").to_numpy(zero_copy_only=False)
    n = tbl.column("n").to_numpy(zero_copy_only=False)
    type_tot: dict[str, int] = {}
    hour_tot = np.zeros(24, np.int64)
    for t, h, c in zip(et, hr, n):
        type_tot[t] = type_tot.get(t, 0) + int(c)
        hour_tot[h] += c
    grand = int(hour_tot.sum())
    rows = sorted(zip(et, hr, n))
    out = {
        "event_type": [], "hour": [], "n": [],
        "type_share": [], "global_share": [], "lift": [],
    }
    for t, h, c in rows:
        ts_ = float(c) / float(type_tot[t])
        gs = float(hour_tot[h]) / float(grand)
        out["event_type"].append(t)
        out["hour"].append(int(h))
        out["n"].append(int(c))
        out["type_share"].append(ts_)
        out["global_share"].append(gs)
        out["lift"].append(ts_ / gs)
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(out["event_type"], pa.string()),
                "hour": pa.array(out["hour"], pa.int64()),
                "n": pa.array(out["n"], pa.int64()),
                "type_share": pa.array(out["type_share"], pa.float64()),
                "global_share": pa.array(out["global_share"], pa.float64()),
                "lift": pa.array(out["lift"], pa.float64()),
            }
        )
    )


EVENTS_SEASONALITY_SQL = """
WITH h AS MATERIALIZED (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), tt AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS t_tot FROM h GROUP BY 1
), ht AS (
  SELECT hour, CAST(SUM(n) AS BIGINT) AS h_tot FROM h GROUP BY 1
), g AS (SELECT CAST(SUM(n) AS BIGINT) AS grand FROM h)
SELECT h.event_type, h.hour, h.n,
  CAST(h.n AS DOUBLE) / CAST(t_tot AS DOUBLE) AS type_share,
  CAST(h_tot AS DOUBLE) / CAST(grand AS DOUBLE) AS global_share,
  (CAST(h.n AS DOUBLE) / CAST(t_tot AS DOUBLE))
    / (CAST(h_tot AS DOUBLE) / CAST(grand AS DOUBLE)) AS lift
FROM h
JOIN tt USING (event_type)
JOIN ht USING (hour)
CROSS JOIN g
ORDER BY event_type, hour
"""
