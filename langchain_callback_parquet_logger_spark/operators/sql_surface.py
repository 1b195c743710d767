"""The SQL entry path: queries declared as ANSI SQL via ``spark.sql`` over
registered views — exercising the subquery shapes (EXISTS / IN / scalar /
correlated / NOT EXISTS) that Catalyst decorrelates into joins, plus an
interval-RANGE window frame.

The reference has no SQL surface at all (SURVEY.md §2: "no SQL parser");
Spark ships one, and an engine claiming to be the analytics layer over the
logs should expose it: the SAME query text runs on Spark and on the DuckDB
oracle, which is the strongest possible parity statement (the oracle IS
the query).

Scale notes: every subquery below decorrelates to a join (check
PLANS-style: no per-row subquery execution exists in Spark — a correlated
subquery that cannot decorrelate fails at analysis rather than silently
running O(n) subqueries). EXISTS/IN become left-semi joins, NOT EXISTS
becomes left-anti, the correlated scalar aggregate becomes an aggregate +
equi join; all shuffle on their correlation keys and broadcast when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.session import load_table

_VIEWS = ("events", "orders", "lineitem", "customer", "nation")


def _register(spark: SparkSession, sf_dir: str) -> None:
    for name in _VIEWS:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def _sql_query(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register(spark, sf_dir)
        return spark.sql(sql)

    return run


# Q4 shape — EXISTS → left-semi join on the correlation key.
SQL_EXISTS_SEMI = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
)
GROUP BY o_orderpriority
"""

# Q18 shape — IN over an aggregated subquery (semi join against the
# having-filtered aggregate).
SQL_IN_AGG = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 150
)
"""

# Q11 shape — uncorrelated scalar subquery in HAVING: group value vs a
# fraction of the global total (the scalar becomes a broadcast one-row
# join).
SQL_SCALAR_HAVING = """
SELECT o_orderpriority, round(SUM(o_totalprice), 2) AS prio_value
FROM orders
GROUP BY o_orderpriority
HAVING SUM(o_totalprice) > (
  SELECT 0.15 * SUM(o_totalprice) FROM orders
)
"""

# Q17 shape — correlated scalar aggregate: lineitems under 50% of their
# part's average quantity. Decorrelates to a per-part aggregate + join.
SQL_CORRELATED_SCALAR = """
SELECT l.l_partkey, COUNT(*) AS n_small, round(SUM(l.l_extendedprice), 2) AS value
FROM lineitem l
WHERE l.l_quantity < (
  SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey
)
GROUP BY l.l_partkey
"""

# Q22 shape — NOT EXISTS (correlated, with an inner predicate) →
# left-anti join: customers with no completed ('F') order, by nation.
SQL_NOT_EXISTS_ANTI = """
SELECT n.n_name, COUNT(*) AS n_customers_no_f_orders
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
)
GROUP BY n.n_name
"""

# Interval RANGE frame — 7-day trailing spend per customer (event-time
# moving aggregate; RANGE, not ROWS, so date gaps are handled by the frame
# bound, not the row count). The windowed sum runs on DECIMAL so both
# engines aggregate exactly — windowed FLOAT aggregation is engine-
# implementation-defined (sliding accumulators vs segment trees) and
# rounds differently at half-cent boundaries. The final CAST AS DOUBLE is
# presentation only (after exact round): Spark renders DECIMAL(38,2) with
# trailing zeros ('.40') while DuckDB's pandas export gives float64
# ('.4'), which the driver's stringified value hash would see as a diff.
SQL_MOVING_AVG = """
SELECT o_orderkey, o_custkey,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w, 2) AS DOUBLE) AS spend_7d,
       COUNT(*) OVER w AS n_orders_7d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
"""

_SQL = {
    "q_sql_exists_semi": SQL_EXISTS_SEMI,
    "q_sql_in_agg": SQL_IN_AGG,
    "q_sql_scalar_having": SQL_SCALAR_HAVING,
    "q_sql_correlated_scalar": SQL_CORRELATED_SCALAR,
    "q_sql_not_exists_anti": SQL_NOT_EXISTS_ANTI,
    "q_sql_moving_avg": SQL_MOVING_AVG,
}

QUERIES = {name: _sql_query(sql) for name, sql in _SQL.items()}

# The oracle IS the query: identical text on both engines.
ORACLES = dict(_SQL)
