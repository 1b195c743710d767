"""Batch map example (reference examples/batch_run_example.py analog):
bounded-concurrency async map over a DataFrame, results re-attached by id
(never by position), then the read-side analysis pass over the logs.

The "model" is a deterministic local function so the example runs
anywhere; swap `mock_model` for a real async LLM call (the per-row dict
carries prompt/config/tools exactly like the reference's batch_run).
"""

from __future__ import annotations

import asyncio
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from langchain_callback_parquet_logger_spark import (
    ColumnConfig,
    attach_results,
    batch_run,
    get_spark,
)


async def mock_model(row: dict) -> str:
    await asyncio.sleep(0)  # a real impl awaits the LLM here
    return f"echo: {row['prompt'][:30]}"


def main() -> None:
    spark = get_spark("example-batch-run")
    df = spark.createDataFrame(
        [(i, f"Summarize document {i}") for i in range(100)],
        "id bigint, prompt string",
    )

    results = batch_run(
        df,
        mock_model,
        max_concurrency=8,
        columns=ColumnConfig(id="id", prompt="prompt"),
    )
    answered = attach_results(df, results, columns=ColumnConfig(id="id"))
    answered.orderBy("id").show(5, truncate=False)

    ok = results.filter(F.col("status") == "ok").count()
    assert ok == 100
    print(f"ok: {ok}/100 rows mapped")
    spark.stop()


if __name__ == "__main__":
    main()
