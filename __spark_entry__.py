"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``langchain_callback_parquet_logger_spark``;
this module only aggregates the per-module query registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from langchain_callback_parquet_logger_spark.operators import (
    analytic as _analytic,
)
from langchain_callback_parquet_logger_spark.operators import (
    batch_queries as _batch_queries,
)
from langchain_callback_parquet_logger_spark.operators import dedup as _dedup
from langchain_callback_parquet_logger_spark.operators import graph as _graph
from langchain_callback_parquet_logger_spark.operators import (
    multimodal as _multimodal,
)
from langchain_callback_parquet_logger_spark.operators import (
    pipeline as _pipeline,
)
from langchain_callback_parquet_logger_spark.operators import queries as _queries
from langchain_callback_parquet_logger_spark.operators import (
    similarity as _similarity,
)
from langchain_callback_parquet_logger_spark.operators import (
    sql_surface as _sql_surface,
)
from langchain_callback_parquet_logger_spark.operators import temporal as _temporal
from langchain_callback_parquet_logger_spark.operators import text as _text
from langchain_callback_parquet_logger_spark.streaming import ingest as _streaming
from langchain_callback_parquet_logger_spark.streaming import stateful as _stateful

_MODULES = [
    _queries,
    _analytic,
    _sql_surface,
    _batch_queries,
    _text,
    _dedup,
    _similarity,
    _temporal,
    _multimodal,
    _pipeline,
    _graph,
    _streaming,
    _stateful,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (token-usage rollup, SURVEY.md §2.10) on sf0.001."""
    return _queries.q_token_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
