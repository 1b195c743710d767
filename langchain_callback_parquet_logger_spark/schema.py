"""Canonical schemas for the event-log engine.

The reference declares a fixed, explicit 7-column PyArrow schema
(`langchain_callback_parquet_logger/logger.py:22-30` in /root/reference) "to
avoid type inference issues".  We mirror that decision with hard-coded Spark
``StructType``s — schemas are never inferred anywhere in this engine.

Payload handling is two-tier (SURVEY.md §1.2): the ``payload`` column stays a
JSON *string* at rest (schema-on-read), and typed access is provided by
``PAYLOAD_SCHEMA`` via ``F.from_json`` for the stable core, with
``F.get_json_object`` for ad-hoc paths into the open-ended ``raw`` section.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# The log table: fixed 7-column outer schema (reference logger.py:22-30).
# parent_run_id is '' when absent, never null (reference logger.py:170-171).
# ---------------------------------------------------------------------------
LOG_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), nullable=False),
        T.StructField("run_id", T.StringType(), nullable=False),
        T.StructField("parent_run_id", T.StringType(), nullable=False),
        T.StructField("custom_id", T.StringType(), nullable=False),
        T.StructField("event_type", T.StringType(), nullable=False),
        T.StructField("logger_metadata", T.StringType(), nullable=False),
        T.StructField("payload", T.StringType(), nullable=False),
    ]
)

LOG_COLUMNS = [f.name for f in LOG_SCHEMA.fields]

# ---------------------------------------------------------------------------
# Event types captured by the reference (config.py:8-21) plus the three
# background-retrieval types injected directly (background_retrieval.py:153,
# 201,257).
# ---------------------------------------------------------------------------
EVENT_TYPES = [
    "llm_start",
    "llm_end",
    "llm_error",
    "chat_model_start",
    "chain_start",
    "chain_end",
    "chain_error",
    "tool_start",
    "tool_end",
    "tool_error",
    "agent_action",
    "agent_finish",
]

BACKGROUND_EVENT_TYPES = [
    "background_retrieval_attempt",
    "background_retrieval_complete",
    "background_retrieval_error",
]

# Default capture set (reference config.py:23-27).
DEFAULT_EVENT_TYPES = ["llm_start", "llm_end", "llm_error", "chat_model_start"]

# Tag prefix used to smuggle a custom id through LangChain tags
# (reference config.py:161, tagging.py:85-98).
CUSTOM_ID_PREFIX = "logger_custom_id:"
CUSTOM_ID_DESC_PREFIX = "custom_id_description:"

# ---------------------------------------------------------------------------
# Typed view of the stable payload core (reference logger.py:168-187):
# { event_type, timestamp, execution{...}, data{...}, raw{...} }.
# ``raw`` is intentionally open-ended and stays a raw JSON string — use
# F.get_json_object for ad-hoc paths into it (SURVEY.md §1.2).
# ---------------------------------------------------------------------------
EXECUTION_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("parent_run_id", T.StringType()),
        T.StructField("custom_id", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

USAGE_SCHEMA = T.MapType(T.StringType(), T.LongType())

DATA_SCHEMA = T.StructType(
    [
        # llm_start / chat_model_start (reference logger.py:252-287)
        T.StructField("prompts", T.ArrayType(T.StringType())),
        T.StructField("llm_type", T.StringType()),
        T.StructField("model", T.StringType()),
        # llm_end (reference logger.py:289-307)
        T.StructField("response", T.StringType()),
        T.StructField("usage_metadata", USAGE_SCHEMA),
        T.StructField("token_usage", USAGE_SCHEMA),
        # errors (reference logger.py:189-194)
        T.StructField(
            "error",
            T.StructType(
                [
                    T.StructField("message", T.StringType()),
                    T.StructField("type", T.StringType()),
                ]
            ),
        ),
        # tool events (reference logger.py:352-373)
        T.StructField("input_str", T.StringType()),
        T.StructField("output", T.StringType()),
    ]
)

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("execution", EXECUTION_SCHEMA),
        T.StructField("data", DATA_SCHEMA),
    ]
)

# ---------------------------------------------------------------------------
# Checkpoint table for resumable batch retrieval
# (reference background_retrieval.py:352-366).
# ---------------------------------------------------------------------------
CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("response_id", T.StringType(), nullable=False),
        T.StructField("processed", T.BooleanType(), nullable=False),
        T.StructField("error", T.StringType(), nullable=True),
        # Explicit ordering column: the reference relies on concat order for
        # keep-last dedup (background_retrieval.py:360-362) which is not
        # deterministic in a distributed engine — we make ordering explicit.
        T.StructField("updated_at", T.TimestampType(), nullable=False),
    ]
)
