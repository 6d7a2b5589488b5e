"""Randomized differential fuzz of the generic join API against
DuckDB: every equi mode (inner/left/semi/anti/outer) on random tables
with duplicate keys, empty sides and name collisions, through BOTH
physical paths (broadcast and forced co-partition) — plus the asof
mode against DuckDB's native ASOF JOIN. The planted-boundary join
tests pin semantics; this pins them across random shapes."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsmetacheck_ray.pipelines.join import join


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype("float64")  # null-tolerant compare
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _tables(rng, nl, nr):
    lt = pa.table(
        {
            "k": pa.array(rng.integers(0, 8, nl), pa.int64()),
            "v": pa.array(rng.integers(0, 100, nl), pa.int64()),
        }
    )
    rt = pa.table(
        {
            "k": pa.array(rng.integers(0, 8, nr), pa.int64()),
            "v": pa.array(rng.integers(100, 200, nr), pa.int64()),  # collides
            "w": pa.array(rng.integers(0, 50, nr), pa.int64()),
        }
    )
    return lt, rt


_EQUI_SQL = {
    "inner": "SELECT l.k, l.v, r.v AS v_r, r.w FROM l JOIN r USING (k)",
    "left": (
        "SELECT l.k, l.v, r.v AS v_r, r.w FROM l LEFT JOIN r USING (k)"
    ),
    "semi": "SELECT l.k, l.v FROM l SEMI JOIN r USING (k)",
    "anti": "SELECT l.k, l.v FROM l ANTI JOIN r USING (k)",
    "outer": (
        "SELECT COALESCE(l.k, r.k) AS k, l.v, r.v AS v_r, r.w "
        "FROM l FULL JOIN r ON l.k = r.k"
    ),
}


def test_equi_modes_fuzz_both_paths(ray_session):
    rng = np.random.default_rng(42)
    con = duckdb.connect()
    for seed in range(3):
        nl, nr = int(rng.integers(0, 40)), int(rng.integers(0, 40))
        lt, rt = _tables(rng, nl, nr)
        con.register("l", lt)
        con.register("r", rt)
        for how, sql in _EQUI_SQL.items():
            want = _canon(con.execute(sql).df())
            for bmax in (1_000_000, 0):  # broadcast vs forced co-part
                if how == "outer" and bmax != 0:
                    continue  # outer always co-partitions
                got = join(
                    rd.from_arrow(lt).repartition(3),
                    rd.from_arrow(rt).repartition(2),
                    on="k", how=how, broadcast_max=bmax,
                    num_partitions=3,
                ).to_pandas()
                if want.empty and got.empty:
                    continue  # empty Datasets drop schema in to_pandas
                pd.testing.assert_frame_equal(
                    _canon(got), want, check_dtype=False,
                ), (seed, how, bmax)


def test_asof_fuzz_vs_duckdb(ray_session):
    rng = np.random.default_rng(7)
    con = duckdb.connect()
    for seed in range(3):
        nl, nr = int(rng.integers(1, 30)), int(rng.integers(1, 30))
        lt = pa.table(
            {
                "g": pa.array(rng.integers(0, 4, nl), pa.int64()),
                "t": pa.array(
                    np.sort(rng.choice(1000, nl, replace=False)), pa.int64()
                ),
                "v": pa.array(rng.integers(0, 100, nl), pa.int64()),
            }
        )
        rt = pa.table(
            {
                "g": pa.array(rng.integers(0, 4, nr), pa.int64()),
                "t": pa.array(
                    np.sort(rng.choice(1000, nr, replace=False)), pa.int64()
                ),
                "w": pa.array(rng.integers(0, 50, nr), pa.int64()),
            }
        )
        con.register("l", lt)
        con.register("r", rt)
        want = _canon(
            con.execute(
                "SELECT l.g, l.t, l.v, r.t AS t_r, r.w FROM l "
                "ASOF LEFT JOIN r ON l.g = r.g AND l.t >= r.t"
            ).df()
        )
        got = join(
            rd.from_arrow(lt).repartition(2),
            rd.from_arrow(rt).repartition(3),
            on="t", how="asof", by="g", num_partitions=2,
        ).to_pandas()
        pd.testing.assert_frame_equal(
            _canon(got), want, check_dtype=False
        ), seed
