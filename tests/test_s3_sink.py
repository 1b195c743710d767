"""S6 coverage: S3 key layout, retry budget, error/continue policy, and an
optional live s3a:// round-trip.

The reference tests these behaviors against a mocked boto3 client
(/root/reference/tests/test_s3_integration.py:13-243). Here the same
behaviors run against moto's in-process S3 (real bucket/key semantics, real
bytes round-tripped) plus stub clients for the failure-injection cases. The
distributed s3a:// path needs the hadoop-aws jar and an endpoint — the
final test exercises it when SPARK_GRAFT_S3_ENDPOINT is set (minio/moto
server) and skips cleanly in sandboxes without either.
"""

from __future__ import annotations

import io
import os

import pytest

from langchain_callback_parquet_logger_spark.sinks import ParquetSink, S3ObjectSink

moto = pytest.importorskip("moto")
import boto3  # noqa: E402


@pytest.fixture()
def s3_bucket():
    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket="test-bucket")
        yield client


def test_upload_key_layout(s3_bucket):
    """Key = prefix + filepath, prefix slash-normalized
    (reference config.py:43-46, storage.py:73-75)."""
    sink = S3ObjectSink(
        bucket="test-bucket", prefix="test-prefix", client=s3_bucket
    )
    sink.put_bytes(b"payload", "logs_20240101.parquet")
    keys = [
        o["Key"]
        for o in s3_bucket.list_objects_v2(Bucket="test-bucket")["Contents"]
    ]
    assert keys == ["test-prefix/logs_20240101.parquet"]


def test_parquet_bytes_roundtrip(s3_bucket, spark, tmp_path):
    """A Spark-written parquet dir ships to S3 preserving layout, and the
    bytes read back are valid parquet with the original rows."""
    import pyarrow.parquet as pq

    out = str(tmp_path / "log")
    df = spark.range(100).selectExpr("id", "id * 2 AS doubled")
    df.coalesce(1).write.parquet(out)

    sink = S3ObjectSink(bucket="test-bucket", prefix="ship/", client=s3_bucket)
    keys = sink.put_dir(out, "run1/")
    assert len(keys) == 1 and keys[0].startswith("ship/run1/part-")

    body = s3_bucket.get_object(Bucket="test-bucket", Key=keys[0])["Body"].read()
    table = pq.read_table(io.BytesIO(body))
    assert table.num_rows == 100
    assert sorted(table.column_names) == ["doubled", "id"]


def test_exists_probe(s3_bucket):
    sink = S3ObjectSink(bucket="test-bucket", prefix="p/", client=s3_bucket)
    assert not sink.exists("a.parquet")
    sink.put_bytes(b"x", "a.parquet")
    assert sink.exists("a.parquet")


class _FlakyClient:
    """put_object fails `n_failures` times, then delegates/succeeds —
    the reference's retry fixture (test_s3_integration.py:50-81)."""

    def __init__(self, n_failures: int, delegate=None):
        self.n_failures = n_failures
        self.delegate = delegate
        self.calls = 0

    def put_object(self, **kwargs):
        self.calls += 1
        if self.calls <= self.n_failures:
            raise Exception("Network error")
        if self.delegate is not None:
            return self.delegate.put_object(**kwargs)


def test_retry_then_success(s3_bucket):
    flaky = _FlakyClient(2, delegate=s3_bucket)
    sink = S3ObjectSink(
        bucket="test-bucket",
        retry_attempts=3,
        client=flaky,
        _sleep=lambda s: None,
    )
    sink.put_bytes(b"x", "retried.parquet")
    assert flaky.calls == 3
    # verify through the real moto client (the flaky wrapper has no
    # head_object) that the third attempt actually landed the object
    s3_bucket.head_object(
        Bucket="test-bucket", Key="langchain-logs/retried.parquet"
    )


def test_failure_error_mode_raises():
    flaky = _FlakyClient(99)
    sink = S3ObjectSink(
        bucket="test-bucket",
        retry_attempts=2,
        on_failure="error",
        client=flaky,
        _sleep=lambda s: None,
    )
    with pytest.raises(RuntimeError, match="Failed to upload to S3"):
        sink.put_bytes(b"x", "doomed.parquet")
    assert flaky.calls == 2


def test_failure_continue_mode_swallows(caplog):
    flaky = _FlakyClient(99)
    sink = S3ObjectSink(
        bucket="test-bucket",
        retry_attempts=2,
        on_failure="continue",
        client=flaky,
        _sleep=lambda s: None,
    )
    with caplog.at_level("ERROR"):
        sink.put_bytes(b"x", "doomed.parquet")  # must not raise
    assert flaky.calls == 2
    assert any("continuing" in r.message for r in caplog.records)


def test_backoff_is_exponential():
    sleeps: list[float] = []
    flaky = _FlakyClient(99)
    sink = S3ObjectSink(
        bucket="test-bucket",
        retry_attempts=3,
        on_failure="continue",
        client=flaky,
        _sleep=sleeps.append,
    )
    sink.put_bytes(b"x", "doomed.parquet")
    assert sleeps == [1, 2]  # 2**0, 2**1; no sleep after the final attempt


def _hadoop_aws_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.hadoop.fs.s3a.S3AFileSystem"
        )
        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_S3_ENDPOINT"),
    reason="no S3 endpoint configured (set SPARK_GRAFT_S3_ENDPOINT to a "
    "minio/moto-server URL to run the live s3a round-trip)",
)
def test_s3a_roundtrip_live(spark, tmp_path):
    """Distributed write path against a real endpoint: ParquetSink with an
    s3a:// base_dir, date partitioning, retry/policy config — then read
    back through the same scheme and compare counts."""
    if not _hadoop_aws_available(spark):
        pytest.skip("hadoop-aws jar not on the Spark classpath")
    endpoint = os.environ["SPARK_GRAFT_S3_ENDPOINT"]
    hconf = spark._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.endpoint", endpoint)
    hconf.set("fs.s3a.path.style.access", "true")
    hconf.set("fs.s3a.access.key", os.environ.get("AWS_ACCESS_KEY_ID", "test"))
    hconf.set(
        "fs.s3a.secret.key", os.environ.get("AWS_SECRET_ACCESS_KEY", "test")
    )

    boto3.client("s3", endpoint_url=endpoint).create_bucket(
        Bucket="s3a-live-test"
    )
    from pyspark.sql import functions as F

    df = spark.range(50).select(
        F.col("id"),
        F.lit("2024-01-01").cast("timestamp").alias("timestamp"),
    )
    sink = ParquetSink("s3a://s3a-live-test/logs", retry_attempts=2)
    sink.write(df)
    assert sink.exists(spark)
    back = spark.read.parquet("s3a://s3a-live-test/logs")
    assert back.count() == 50
