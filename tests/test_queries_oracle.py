"""Driver-style differential tests: run each queries() entry via Ray
and its oracle_sql() via DuckDB on sf0.001, compare values exactly.
This mirrors the driver's CORRECTNESS gate so regressions surface in
pytest before the round verdict."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _registry():
    from rsmetacheck_ray.pipelines.queries import registry

    return registry()


SQL_BACKED = [
    "q1_pricing",
    "top_orders",
    "nation_order_stats",
    "events_hourly",
    "revenue_by_priority",
    "events_asof_orders",
    "orders_events_window",
    "sessionize_users",
    "orders_sample",
    "distinct_user_event_types",
    "events_type_stats",
    "lang_source_hist",
    "open_orders",
    "parts_by_brand",
    "supplier_nation_balance",
    "doc_stats",
    "doc_quality_scores",
    "gate_url_flags",
    "gate_content_flags",
    "gate_shape_lang_flags",
    "host_stats",
    "dedup_exact",
    "dedup_exact_pairs",
    "dedup_embedding_pairs",
    "knn_cosine",
    "multimodal_meta",
    "multimodal_resize",
    "doc_bpe_tokens",
    # round 2 additions
    "gate_meta_flags",
    "gate_drop_vector",
    "events_sliding_3h",
    "customers_without_orders",
    "multimodal_features",
    "events_value_percentiles",
    # round 3 additions
    "dedup_components",
    "dedup_survivors",
    "gate_decisions",
    "host_sample",
    "decontaminate",
    "pack_sequences",
    "top_tokens",
    "dedup_jaccard",
    "quality_classifier",
    "quality_bins",
    "scrub_boilerplate",
    "url_status",
    "train_bigram_lm",
    "shuffle_shards",
    "dedup_incremental",
    # round 3, third session
    "pii_scrub",
    "repetition_scores",
    "url_canonical",
    "dedup_urls",
    "gate_then_dedup",
    "mixture_sample",
    "normalize_text",
    "dedup_lines",
    # round 3, fifth session — windowed-frame / grouping-set /
    # outer-join analytics batch
    "user_customer_activity",
    "orders_month_priority_pivot",
    "events_type_dow_cube",
    "events_moving_avg",
    "events_user_ntile",
    "events_type_mode_median",
    "shipping_priority",
    "events_value_quantile_cont",
    "events_value_histogram",
    "customers_except_event_users",
    "vocab_coverage",
    "doc_char_entropy",
    # round 3, sixth session — decision-support batch
    "local_supplier_volume",
    "orders_above_customer_avg",
    "top_orders_per_customer",
    "events_first_last",
    "events_percent_rank",
    "events_mad_outliers",
    "events_regr_trend",
    "orders_priority_unpivot",
    "token_budget_sample",
    "quality_zscores",
    "dataset_diff",
    "term_postings",
    "apply_changes",
    "dq_checks",
    "user_funnel",
    "user_retention",
    "bm25_search",
    "events_props_stats",
    "events_value_fill",
    "embedding_norms",
    "top_tokens_by_lang",
    "events_sliding_distinct_users",
    "event_transitions",
    "orders_pareto",
    "events_type_dow_chi2",
]


@pytest.mark.parametrize("name", SQL_BACKED)
def test_query_matches_oracle(ray_session, oracle_con, name):
    fn, sql = _registry()[name]
    assert sql is not None
    if callable(sql):  # deferred oracle build (gate_decisions LM export)
        sql = sql()
    res = fn(SF_DIR)
    ray_df = _canon(res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res))
    sql_df = _canon(oracle_con.execute(sql).fetchdf())
    assert list(ray_df.columns) == list(sql_df.columns)
    assert len(ray_df) == len(sql_df), (len(ray_df), len(sql_df))
    for c in ray_df.columns:
        a, b = ray_df[c], sql_df[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            import numpy as np

            assert np.allclose(
                a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True
            ), c
        else:
            assert (a.astype(str) == b.astype(str)).all(), c


def test_rows_only_queries_return_rows(ray_session):
    reg = _registry()
    for name, (fn, sql) in reg.items():
        if sql is not None:
            continue
        res = fn(SF_DIR)
        df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        assert len(df) > 0, name


def test_dedup_survivors_null_text_matches_oracle(ray_session, tmp_path):
    """NULL text must dedup as '' on BOTH sides (engine coalesces;
    the oracle SQL coalesces at the corpus CTE) — regression for the
    engine-''-vs-SQL-NULL divergence on nullable text columns."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 11], pa.int64()),
            "text": pa.array([None, "", "some longer unrelated body", None], pa.string()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    fn, sql = _registry()["dedup_survivors"]
    ray_df = _canon(fn(str(tmp_path)).to_pandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    sql_df = _canon(con.execute(sql).fetchdf())
    assert len(ray_df) == len(sql_df)
    for c in ray_df.columns:
        assert (ray_df[c].astype(str) == sql_df[c].astype(str)).all(), c
    # the three no-content docs (2 NULL + 1 empty) form ONE cluster
    assert (~ray_df["keep"]).sum() >= 2


def test_entry_contract(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) > 0
    assert {"doc_id", "keep", "detected_lang"} <= set(df.columns)
    assert set(e.oracle_sql()) <= set(e.queries())


def test_nation_order_stats_distributed_path_matches_broadcast(ray_session, monkeypatch):
    """The size-gated join must produce identical results on both
    plans: broadcast searchsorted (small customer side) and the
    distributed hash join (forced here by zeroing the threshold)."""
    import rsmetacheck_ray.pipelines.relational as rel

    bcast = rel.nation_order_stats(SF_DIR).to_pandas().sort_values("n_name").reset_index(drop=True)
    monkeypatch.setattr(rel, "_BROADCAST_MAX_ROWS", 0)
    dist = rel.nation_order_stats(SF_DIR).to_pandas().sort_values("n_name").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(bcast, dist)


def test_top_tokens_tiebreak_and_prune(ray_session, tmp_path):
    """>k vocab exercises the per-block prune; equal counts break ties
    by token ascending (the SQL's total order)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rsmetacheck_ray.pipelines.queries import q_top_tokens

    # 60 distinct tokens: t00..t59, token tNN appearing (NN // 10 + 1)
    # times -> many count ties at every level
    texts = []
    for i in range(60):
        texts.append(" ".join([f"t{i:02d}"] * (i // 10 + 1)))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(60), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    df = q_top_tokens(str(tmp_path), k=15).to_pandas()
    assert len(df) == 15
    # top 10 are the count-6 tokens t50..t59 in ascending token order,
    # then the first 5 of the count-5 tokens t40..t44
    assert df["token"].tolist() == [f"t{i:02d}" for i in range(50, 60)] + [
        f"t{i:02d}" for i in range(40, 45)
    ]
    assert df["n"].tolist() == [6] * 10 + [5] * 5
