"""Bench-methodology timing for a subset of queries: untimed warmup,
median of N cold reps, release_caches() between runs, ref-scan floor.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/time_queries.py q_a q_b ...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from langchain_callback_parquet_logger_spark.plans.session import (
    get_spark,
    load_table,
    release_caches,
)

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("time-queries")
    qs = entrymod.queries()
    spark.range(1).count()
    runs: dict[str, list[float]] = {n: [] for n in names}
    rows: dict[str, int] = {}
    ref: list[float] = []
    # warmup pass
    for n in names:
        qs[n](spark, SF_DIR).count()
        release_caches()
    for _ in range(REPS):
        t0 = time.perf_counter()
        load_table(spark, SF_DIR, "events").count()
        ref.append(round(time.perf_counter() - t0, 3))
        for n in names:
            t0 = time.perf_counter()
            rows[n] = qs[n](spark, SF_DIR).count()
            runs[n].append(round(time.perf_counter() - t0, 3))
            release_caches()
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "median": {n: statistics.median(v) for n, v in runs.items()},
                "runs": runs,
                "rows": rows,
                "ref_scan_median": statistics.median(ref),
            },
            indent=1,
            sort_keys=True,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
