"""Event-source readers: batch and streaming intake of raw event files.

The reference's only sources are the 12 LangChain callback handlers
(`logger.py:252-415` in the reference) plus `pd.read_parquet` on the log
dir; here intake is format-pluggable: the same explicit raw-event schema
reads json / csv / parquet, batch or stream, and feeds the one
`normalize_events` pipeline. Schemas are always explicit — the engine
never infers (reference design choice, logger.py:21)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.ingest import RAW_EVENT_DDL

_FORMATS = ("json", "csv", "parquet")


def read_events(
    spark: SparkSession,
    path: str,
    fmt: str = "json",
    streaming: bool = False,
    **options: str,
) -> DataFrame:
    """Read raw callback events from an ingest directory with the explicit
    raw-event schema. ``streaming=True`` returns an unbounded readStream
    over the same files (tail-the-directory mode)."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    reader = spark.readStream if streaming else spark.read
    reader = reader.schema(RAW_EVENT_DDL).format(fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_log(spark: SparkSession, path: str) -> DataFrame:
    """Scan a written log dataset (hive-partitioned parquet tree) with
    partition discovery — filters on the `date` partition column prune
    directories before any I/O."""
    return spark.read.parquet(path)
