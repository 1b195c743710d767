"""Bucketed co-located join: the 100 TB fact-fact join strategy, proven at
test scale by asserting the physical plan has NO shuffle exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from langchain_callback_parquet_logger_spark.plans.session import load_table
from langchain_callback_parquet_logger_spark.sinks import write_bucketed


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(lineitem, "bkt_lineitem", ["l_orderkey"], num_buckets=4)
    write_bucketed(orders, "bkt_orders", ["o_orderkey"], num_buckets=4)
    yield "bkt_lineitem", "bkt_orders"
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")


@pytest.fixture()
def no_broadcast(spark):
    """Force the sort-merge path: at test scale the planner would broadcast
    (its own exchange); at warehouse scale both sides are far past the
    broadcast threshold and SMJ is what actually runs."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables, no_broadcast):
    lt, ot = bucketed_tables
    joined = spark.table(lt).join(
        spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan
    # same result as the plain (shuffled) join
    plain = load_table(spark, sf_dir, "lineitem").join(
        load_table(spark, sf_dir, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    assert joined.count() == plain.count()


def test_bucketed_aggregate_has_no_shuffle(spark, bucketed_tables):
    """Aggregating on the bucket key also reuses the bucketing — no
    exchange before the hash aggregate."""
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
