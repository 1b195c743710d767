"""Phase profile of the maintenance lifecycles (round-13 verdict #5):
q_log_compaction (write_log / retention / compact / rollup) and
q_incremental_rollup (base build / delta+merge / dynamic overwrite /
read-back), by wrapping the step functions with timers.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/lifecycle_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from langchain_callback_parquet_logger_spark.plans.session import (
    get_spark,
    release_caches,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3"))


def main() -> None:
    from langchain_callback_parquet_logger_spark.operators import maintenance as M
    from langchain_callback_parquet_logger_spark import sinks as SK

    spark = get_spark("lifecycle-profile")
    spark.range(1).count()
    out: dict[str, list[float]] = {}

    def rec(name: str, sec: float) -> None:
        out.setdefault(name, []).append(round(sec, 3))

    real_write_log = SK.write_log
    real_retain = SK.retain_partitions
    real_compact = SK.compact_logs

    def timed(name, fn):
        def wrap(*a, **kw):
            t0 = time.perf_counter()
            try:
                return fn(*a, **kw)
            finally:
                rec(name, time.perf_counter() - t0)

        return wrap

    M.write_log = timed("log_write_log", real_write_log)
    M.retain_partitions = timed("log_retention", real_retain)
    M.compact_logs = timed("log_compact", real_compact)

    for _ in range(REPS):
        with tempfile.TemporaryDirectory(prefix="lcprof_") as wd:
            t0 = time.perf_counter()
            M.q_log_compaction(spark, SF_DIR, work_dir=wd).count()
            rec("q_log_compaction_total", time.perf_counter() - t0)
        release_caches()

        with tempfile.TemporaryDirectory(prefix="lcprof_") as wd:
            t0 = time.perf_counter()
            M.q_incremental_rollup(spark, SF_DIR, work_dir=wd).count()
            rec("q_incremental_rollup_total", time.perf_counter() - t0)
        release_caches()

    import statistics

    med = {k: statistics.median(v) for k, v in out.items()}
    print(
        json.dumps(
            {"sf_dir": SF_DIR, "reps": REPS, "median": med, "runs": out},
            indent=1,
            sort_keys=True,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
