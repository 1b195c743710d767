"""Minimal live-logging example (reference examples/minimal.py analog):
attach the callback logger, emit a few events, flush to date-partitioned
parquet, read the log back with Spark.

Runs self-contained with a fake LLM callback sequence — no network.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from langchain_callback_parquet_logger_spark import (
    SparkParquetLogger,
    get_spark,
    read_log_dataset,
    with_tags,
)


def main() -> None:
    spark = get_spark("example-minimal")
    log_dir = tempfile.mkdtemp(prefix="minimal_logs_")

    with SparkParquetLogger(spark, log_dir, buffer_size=10) as logger:
        # the tag helper embeds a custom id exactly like the reference
        config = with_tags("experiment-1", custom_id="req-0001")
        run = {"run_id": "run-1", "tags": config["tags"]}
        logger.on_llm_start({"name": "fake-llm"}, ["What is 2+2?"], **run)
        logger.on_llm_end({"generations": [[{"text": "4"}]]}, **run)

    logs = read_log_dataset(spark, log_dir)
    logs.select("timestamp", "run_id", "custom_id", "event_type").show(truncate=False)
    assert logs.count() == 2
    print(f"ok: {logs.count()} events under {log_dir}")
    spark.stop()


if __name__ == "__main__":
    main()
