"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to execute fully (count + a cheap checksum via
collect of the aggregated frame where small, else count) — no caching
between queries; the session is warmed once so JVM startup isn't billed
to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from langchain_callback_parquet_logger_spark.plans.session import get_spark

import __spark_entry__ as entrymod

HEADLINE = [
    "q_pricing_summary",
    "q_token_rollup",
    "q_hierarchy_join",
    "q_topk",
    "q_dedup_keep_last",
    "q_date_partition_agg",
    "q_json_extract",
    "q_anti_join_checkpoint",
    "q_union_dedup",
    "q_status_summary",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]

    # Warm up the JVM + parquet footer caches with a trivial job.
    spark.range(1).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
