"""Read-side query surface: every declared query runs and returns sane rows
at sf0.001. Value-level correctness is enforced by tools/check_oracle.py and
the driver's DuckDB gate; these tests pin shapes and a few hand-checked
invariants so pytest stays fast."""

from __future__ import annotations

import pytest

from langchain_callback_parquet_logger_spark.operators import queries as Q


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = Q.QUERIES[name](spark, sf_dir)
    rows = df.limit(5).collect()
    assert df.columns, name
    assert rows is not None


def test_registry_oracle_alignment():
    assert set(Q.ORACLES) <= set(Q.QUERIES)


def test_filter_event_type_only_selected(spark, sf_dir):
    df = Q.q_filter_event_type(spark, sf_dir)
    kinds = {r.event_type for r in df.select("event_type").distinct().collect()}
    assert kinds <= set(Q.FILTER_EVENT_TYPES)


def test_dedup_keep_last_unique_keys(spark, sf_dir):
    df = Q.q_dedup_keep_last(spark, sf_dir)
    assert df.count() == df.select("user_id", "event_type").distinct().count()


def test_anti_join_excludes_checkpoint(spark, sf_dir):
    df = Q.q_anti_join_checkpoint(spark, sf_dir)
    assert df.filter("event_id % 10 = 0").count() == 0


def test_topk_is_sorted_limit(spark, sf_dir):
    rows = Q.q_topk(spark, sf_dir).collect()
    assert len(rows) == 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_token_rollup_matches_manual(spark, sf_dir):
    from pyspark.sql import functions as F

    from langchain_callback_parquet_logger_spark.plans.session import load_table

    events = load_table(spark, sf_dir, "events")
    expected = events.groupBy("user_id").count().count()
    assert Q.q_token_rollup(spark, sf_dir).count() == expected
