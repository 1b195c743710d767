"""Ingest parity invariants carried over from the reference's test suite
(SURVEY.md §5): 7-column schema exactness, parent_run_id '' never null,
custom-id prefix parse, event-type filter completeness, payload envelope
shape, partition directory layout, with_tags semantics."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from langchain_callback_parquet_logger_spark import (
    LOG_COLUMNS,
    normalize_events,
    with_tags,
)
from langchain_callback_parquet_logger_spark.ingest import extract_custom_id_from_tags
from langchain_callback_parquet_logger_spark.sinks import (
    ParquetSink,
    render_output_path,
    sanitize_version,
    write_log,
)

ALL_TYPES = ["llm_start", "llm_end", "llm_error", "chain_start", "chat_model_start"]


def test_seven_column_schema_exact(raw_events):
    out = normalize_events(raw_events, event_types=ALL_TYPES)
    assert out.columns == LOG_COLUMNS
    types = dict(out.dtypes)
    assert types["timestamp"] == "timestamp"
    for c in LOG_COLUMNS[1:]:
        assert types[c] == "string", c


def test_parent_run_id_empty_never_null(raw_events):
    out = normalize_events(raw_events, event_types=ALL_TYPES)
    rows = {r.run_id: r for r in out.collect()}
    assert rows["run-1"].parent_run_id == ""
    assert rows["run-2"].parent_run_id == "run-1"
    assert out.filter(F.col("parent_run_id").isNull()).count() == 0


def test_custom_id_extracted_from_tags(raw_events):
    out = normalize_events(raw_events, event_types=ALL_TYPES)
    rows = {(r.run_id, r.event_type): r for r in out.collect()}
    assert rows[("run-1", "llm_start")].custom_id == "my-custom-id"
    assert rows[("run-3", "chain_start")].custom_id == ""


def test_default_event_type_filter(raw_events):
    # default set = llm_start/llm_end/llm_error/chat_model_start
    # (reference config.py:23-27) → chain_start is dropped.
    out = normalize_events(raw_events)
    kinds = {r.event_type for r in out.collect()}
    assert kinds == {"llm_start", "llm_end", "llm_error"}


def test_payload_envelope_shape(raw_events):
    out = normalize_events(raw_events, event_types=ALL_TYPES)
    row = out.filter(F.col("event_type") == "llm_end").collect()[0]
    payload = json.loads(row.payload)
    assert payload["event_type"] == "llm_end"
    assert payload["execution"]["run_id"] == "run-1"
    assert payload["execution"]["custom_id"] == "my-custom-id"
    assert payload["execution"]["tags"] == ["tag1", "logger_custom_id:my-custom-id", "tag2"]
    assert payload["data"]["usage_metadata"]["total_tokens"] == 6
    assert payload["timestamp"].startswith("2024-01-01T12:00:01")


def test_payload_raw_section_passthrough(raw_events):
    out = normalize_events(raw_events, event_types=ALL_TYPES)
    row = out.filter(F.col("event_type") == "llm_start").collect()[0]
    payload = json.loads(row.payload)
    assert payload["raw"]["kwargs"]["invocation_params"]["temperature"] == 0


def test_logger_metadata_constant(raw_events):
    out = normalize_events(
        raw_events, logger_metadata={"job": "j1", "v": 2}, event_types=ALL_TYPES
    )
    metas = {r.logger_metadata for r in out.collect()}
    assert metas == {json.dumps({"job": "j1", "v": 2}, separators=(",", ":"))}


def test_extract_custom_id_column_fn(spark):
    df = spark.createDataFrame(
        [(["a", "logger_custom_id:x42"],), (["plain"],), ([],)], "tags: array<string>"
    )
    got = [r.cid for r in df.select(extract_custom_id_from_tags(F.col("tags")).alias("cid")).collect()]
    assert got == ["x42", "", ""]


# --- with_tags semantics (reference tagging.py:7-82, tests/test_core.py:243-295) ---


def test_with_tags_append_and_custom_id():
    config = with_tags("t1", "t2", custom_id="abc")
    assert config["tags"] == ["t1", "t2", "logger_custom_id:abc"]


def test_with_tags_extends_existing_config():
    config = with_tags("t3", config={"tags": ["t1"], "metadata": {"u": "x"}}, custom_id="abc")
    assert config["tags"] == ["t1", "t3", "logger_custom_id:abc"]
    assert config["metadata"] == {"u": "x"}


def test_with_tags_replace():
    config = with_tags(
        "new", config={"tags": ["old", "logger_custom_id:zzz"]}, replace_tags=True, custom_id="abc"
    )
    assert config["tags"] == ["new", "logger_custom_id:abc"]


def test_with_tags_list_and_description():
    config = with_tags(tags=["l1"], custom_id="abc", custom_id_description="row id")
    assert config["tags"] == ["l1", "logger_custom_id:abc", "custom_id_description:row id"]


def test_with_tags_description_requires_custom_id():
    config = with_tags("only", custom_id_description="ignored")
    assert config["tags"] == ["only"]


# --- sinks: partition layout (reference logger.py:466-470, test_core.py:117-159) ---


def test_write_log_date_partitioned(raw_events, tmp_path):
    out = normalize_events(raw_events, event_types=ALL_TYPES)
    target = str(tmp_path / "logs")
    write_log(out, target, partition_on="date")
    dirs = sorted(p.name for p in (tmp_path / "logs").iterdir() if p.is_dir())
    assert dirs == ["date=2024-01-01", "date=2024-01-02"]


def test_write_log_flat(raw_events, tmp_path, spark):
    out = normalize_events(raw_events, event_types=ALL_TYPES)
    target = str(tmp_path / "flat")
    write_log(out, target, partition_on=None)
    assert not any(p.name.startswith("date=") for p in (tmp_path / "flat").iterdir())
    back = spark.read.parquet(target)
    assert back.count() == out.count()
    assert back.columns == LOG_COLUMNS


def test_roundtrip_read_partitioned(raw_events, tmp_path, spark):
    out = normalize_events(raw_events, event_types=ALL_TYPES)
    target = str(tmp_path / "logs2")
    write_log(out, target)
    back = spark.read.parquet(target)
    # partition discovery adds the `date` column
    assert set(back.columns) == set(LOG_COLUMNS) | {"date"}
    assert back.count() == out.count()


def test_composite_sink(raw_events, tmp_path):
    from langchain_callback_parquet_logger_spark.sinks import create_sink

    out = normalize_events(raw_events, event_types=ALL_TYPES)
    sink = create_sink(str(tmp_path / "a"), str(tmp_path / "b"), partition_on=None)
    sink.write(out)
    assert (tmp_path / "a").exists() and (tmp_path / "b").exists()


def test_sink_exists_probe(raw_events, tmp_path, spark):
    out = normalize_events(raw_events, event_types=ALL_TYPES)
    sink = ParquetSink(str(tmp_path / "probe"), partition_on=None)
    assert not sink.exists(spark)
    sink.write(out)
    assert sink.exists(spark)


def test_path_templating():
    assert sanitize_version("3.2.1") == "3_2_1"
    assert sanitize_version(None) == "unversioned"
    p = render_output_path("/base", "cat", "sub", "1.2.3")
    assert p == "/base/cat/sub/v1_2_3"
    assert render_output_path("/base/") == "/base/uncategorized/unsubcategorized/vunversioned"


def test_read_events_roundtrip_formats(spark, tmp_path):
    """Multi-format source intake: the same explicit schema reads json and
    parquet event files identically."""
    import json as _json

    from langchain_callback_parquet_logger_spark.sources import read_events

    rows = [
        {
            "timestamp": "2024-01-01T00:00:00.000Z",
            "run_id": f"r{i}",
            "parent_run_id": "",
            "event_type": "llm_end",
            "tags": ["logger_custom_id:42"],
            "metadata": {"k": "v"},
            "data": "{}",
            "raw": "{}",
        }
        for i in range(3)
    ]
    jdir = tmp_path / "json_events"
    jdir.mkdir()
    (jdir / "part-0.json").write_text("\n".join(_json.dumps(r) for r in rows))
    jdf = read_events(spark, str(jdir), fmt="json")
    assert jdf.count() == 3
    assert dict(jdf.dtypes)["tags"] == "array<string>"

    pdir = tmp_path / "parquet_events"
    jdf.write.parquet(str(pdir))
    pdf = read_events(spark, str(pdir), fmt="parquet")
    assert pdf.count() == 3
    assert pdf.schema == jdf.schema

    # CSV: nested cols ride as JSON strings, parsed after the scan — the
    # frame comes back with the SAME shape and values as json/parquet.
    cdir = tmp_path / "csv_events"
    cdir.mkdir()
    header = "timestamp,run_id,parent_run_id,event_type,tags,metadata,data,raw"
    csv_lines = [header] + [
        ",".join(
            [
                r["timestamp"],
                r["run_id"],
                r["parent_run_id"],
                r["event_type"],
                '"' + _json.dumps(r["tags"]).replace('"', '""') + '"',
                '"' + _json.dumps(r["metadata"]).replace('"', '""') + '"',
                '"' + r["data"].replace('"', '""') + '"',
                '"' + r["raw"].replace('"', '""') + '"',
            ]
        )
        for r in rows
    ]
    (cdir / "part-0.csv").write_text("\n".join(csv_lines))
    cdf = read_events(spark, str(cdir), fmt="csv")
    assert cdf.count() == 3
    assert dict(cdf.dtypes)["tags"] == "array<string>"
    assert dict(cdf.dtypes)["metadata"] == "map<string,string>"
    j = {r.run_id: r for r in jdf.collect()}
    c = {r.run_id: r for r in cdf.collect()}
    for rid in j:
        assert list(j[rid].tags) == list(c[rid].tags)
        assert dict(j[rid].metadata) == dict(c[rid].metadata)

    # every format feeds the same normalize pipeline
    from langchain_callback_parquet_logger_spark import normalize_events

    norm = normalize_events(cdf).collect()
    assert all(r.custom_id == "42" for r in norm)
