"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully (df.count()) BEST-OF-2: this host exhibits
multi-ten-second scheduling stalls (virtualized CPU steal) that randomly
inflate a single run by 10-100×; the min of two runs reports the engine's
actual cost instead of the hypervisor's mood. The session is warmed once
so JVM startup isn't billed to the first query. Set SPARK_GRAFT_BENCH_REPS
to change the rep count (1 = single-shot).
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

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    runs: dict[str, list[float]] = {n: [] for n in names}
    counts: dict[str, int] = {}

    def one(name: str) -> None:
        t0 = time.perf_counter()
        counts[name] = qs[name](spark, sf_dir).count()
        runs[name].append(time.perf_counter() - t0)

    # Reps are taken as FULL PASSES over the query list, not back-to-back:
    # this host's hypervisor stalls come in multi-ten-second bursts, so two
    # immediate reps of one query land in the same burst and best-of-N
    # never sees a clean run. Spreading the reps minutes apart decorrelates
    # them at zero extra cost.
    for _ in range(reps):
        for name in names:
            one(name)
    # Stall guard: if a query's reps are slow AND mutually inconsistent,
    # every rep likely stalled — take one extra.
    for name in names:
        if reps > 1 and min(runs[name]) > 3.0 and max(runs[name]) / min(runs[name]) > 3.0:
            one(name)

    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        best = min(runs[name])
        timings[name] = round(best, 3)
        total += best
        print(
            f"# {name}: {counts[name]} rows in {best:.3f}s (best of {len(runs[name])})",
            file=sys.stderr,
        )

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
