"""SQL entry path (operators/sql_surface.py): subqueries must decorrelate
to joins — never per-row subquery execution — and the identical query text
is the DuckDB oracle (tools/check_oracle.py does the value check)."""

from __future__ import annotations

import pytest

from langchain_callback_parquet_logger_spark.operators import sql_surface as S


@pytest.mark.parametrize("name", sorted(S.QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = S.QUERIES[name](spark, sf_dir)
    assert df.columns
    assert df.limit(3).collect() is not None


def test_oracle_is_the_query():
    assert S.ORACLES == S._SQL and set(S.QUERIES) == set(S._SQL)


def _plan(spark, sf_dir, name):
    return (
        S.QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )


def test_exists_becomes_semi_join(spark, sf_dir):
    assert "LeftSemi" in _plan(spark, sf_dir, "q_sql_exists_semi")


def test_not_exists_becomes_anti_join(spark, sf_dir):
    assert "LeftAnti" in _plan(spark, sf_dir, "q_sql_not_exists_anti")


def test_in_agg_becomes_semi_join(spark, sf_dir):
    assert "LeftSemi" in _plan(spark, sf_dir, "q_sql_in_agg")


def test_correlated_scalar_decorrelates(spark, sf_dir):
    # the correlated AVG becomes an aggregate + join on the correlation key
    plan = _plan(spark, sf_dir, "q_sql_correlated_scalar")
    assert "Join" in plan and "avg(" in plan


def test_no_python_eval_anywhere(spark, sf_dir):
    for name in S.QUERIES:
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
