"""Write-path throughput: the reference's single-node buffered logger loop
vs this engine's declarative normalize+write, on the same input rows.

The reference's hot path (reimplemented below from its documented
algorithm, logger.py:418-470 in /root/reference — per-event Python dict →
payload json.dumps → buffer of ``buffer_size`` → typed pyarrow arrays →
snappy parquet file under date=YYYY-MM-DD/) is what "high-performance
logging" means in its README. Ours is the same logical transform
(ingest.normalize_events → sinks.write_log) planned by Catalyst.

Usage: python tools/write_bench.py   # writes WRITEBENCH.md, prints one JSON line

Both paths read the same events.parquet, build the same 7-column log rows
(envelope JSON with execution block, date partition dirs, snappy) and are
timed end-to-end including their file writes. Best-of-2 per path (this
host stalls randomly; see bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BUFFER_SIZE = 1000  # reference ProcessingConfig default is 1000 (config.py:64)
OUT = "/tmp/write_bench"


def reference_style_write(rows: list[dict], out_dir: str) -> int:
    """The reference's algorithm: append row dicts to a buffer; at
    buffer_size, build one typed pyarrow array per column and write one
    snappy parquet file into the row's date partition dir."""
    buffer: list[dict] = []
    n_files = 0

    def flush() -> None:
        nonlocal n_files
        if not buffer:
            return
        date = buffer[0]["timestamp"][:10]
        dir_ = os.path.join(out_dir, f"date={date}")
        os.makedirs(dir_, exist_ok=True)
        cols = ["timestamp", "run_id", "parent_run_id", "custom_id",
                "event_type", "logger_metadata", "payload"]
        table = pa.Table.from_arrays(
            [pa.array([r[c] for r in buffer], type=pa.string()) for c in cols],
            names=cols,
        )
        pq.write_table(table, os.path.join(dir_, f"logs_{n_files:06d}.parquet"),
                       compression="snappy")
        n_files += 1
        buffer.clear()

    for row in rows:
        event = {
            "event_type": row["event_type"],
            "timestamp": row["timestamp"],
            "execution": {
                "run_id": row["run_id"],
                "parent_run_id": "",
                "custom_id": "",
                "tags": [],
                "metadata": None,
            },
            "data": json.loads(row["data"]),
        }
        buffer.append(
            {
                "timestamp": row["timestamp"],
                "run_id": row["run_id"],
                "parent_run_id": "",
                "custom_id": "",
                "event_type": row["event_type"],
                "logger_metadata": "{}",
                "payload": json.dumps(event, separators=(",", ":")),
            }
        )
        if len(buffer) >= BUFFER_SIZE:
            flush()
    flush()
    return n_files


def main() -> None:
    from pyspark.sql import functions as F

    from langchain_callback_parquet_logger_spark.ingest import normalize_events
    from langchain_callback_parquet_logger_spark.plans.session import get_spark, load_table
    from langchain_callback_parquet_logger_spark.sinks import write_log

    spark = get_spark("write-bench")
    events = load_table(spark, SF_DIR, "events")
    n_rows = events.count()

    # --- path A: reference-style single-node buffered loop -----------------
    src = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    rows = [
        {
            "timestamp": str(ts)[:26].replace(" ", "T"),
            "run_id": str(eid),
            "event_type": et,
            "data": props,
        }
        for ts, eid, et, props in zip(
            src["ts"].to_pylist(), src["event_id"].to_pylist(),
            src["event_type"].to_pylist(), src["props"].to_pylist(),
        )
    ]
    ref_times = []
    for _ in range(2):
        shutil.rmtree(f"{OUT}/ref", ignore_errors=True)
        t0 = time.perf_counter()
        reference_style_write(rows, f"{OUT}/ref")
        ref_times.append(time.perf_counter() - t0)
    ref_s = min(ref_times)

    # --- path B: Spark normalize + partitioned write -----------------------
    raw = events.select(
        F.col("ts").alias("timestamp"),
        F.col("event_id").cast("string").alias("run_id"),
        "event_type",
        F.col("props").alias("data"),
    )
    spark_times = []
    for _ in range(2):
        shutil.rmtree(f"{OUT}/spark", ignore_errors=True)
        t0 = time.perf_counter()
        write_log(normalize_events(raw), f"{OUT}/spark")
        spark_times.append(time.perf_counter() - t0)
    spark_s = min(spark_times)

    ref_rps = n_rows / ref_s
    spark_rps = n_rows / spark_s
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "WRITEBENCH.md"), "w") as f:
        f.write(
            "# WRITEBENCH — log-write throughput vs the reference's loop\n\n"
            f"Input: {n_rows} events ({SF_DIR}). Both paths build the same "
            "7-column log rows (envelope-JSON payload, date-partitioned "
            "snappy parquet); best-of-2, local[32].\n\n"
            "| path | sec | rows/sec |\n|---|---|---|\n"
            f"| reference-style buffered loop (buffer={BUFFER_SIZE}, "
            f"single-threaded, as logger.py:418-470) | {ref_s:.2f} | "
            f"{ref_rps:,.0f} |\n"
            f"| spark normalize_events + write_log | {spark_s:.2f} | "
            f"{spark_rps:,.0f} |\n\n"
            f"Speedup: **{ref_s / spark_s:.1f}×** at sf0.1 on one machine; "
            "the Spark path additionally scales out with executors, the "
            "loop cannot.\n"
        )
    print(json.dumps({
        "metric": "write_path_rows_per_sec",
        "reference_style": round(ref_rps),
        "spark": round(spark_rps),
        "speedup": round(ref_s / spark_s, 2),
        "rows": n_rows,
    }))
    shutil.rmtree(OUT, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
