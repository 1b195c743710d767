"""PySpark-native analytics engine with the capabilities of
turbo3136/langchain-callback-parquet-logger (studied read-only at
/root/reference — see SURVEY.md), rebuilt Spark-first and extended with
large-scale training-data pipeline operators.

Public surface mirrors the reference's API roles:
- schema: fixed log-table schema (ParquetLogger's 7 columns)
- ingest: event normalization / filtering / tagging (write path)
- sinks: partitioned parquet + composite sinks (storage.py role)
- operators.queries: the read-side analysis surface
- batchmap / checkpoint: batch_run / batch_process / background retrieval
- operators.{text,dedup,similarity,multimodal}: the scale extensions
"""

from .schema import (
    CHECKPOINT_SCHEMA,
    CUSTOM_ID_PREFIX,
    DEFAULT_EVENT_TYPES,
    EVENT_TYPES,
    LOG_COLUMNS,
    LOG_SCHEMA,
    PAYLOAD_SCHEMA,
)
from .ingest import (
    extract_custom_id_from_tags,
    filter_event_types,
    normalize_events,
    payload_field,
    read_log_dataset,
    with_tags,
)
from .plans.session import get_spark, load_table, load_tables

__version__ = "0.1.0"

__all__ = [
    "CHECKPOINT_SCHEMA",
    "CUSTOM_ID_PREFIX",
    "DEFAULT_EVENT_TYPES",
    "EVENT_TYPES",
    "LOG_COLUMNS",
    "LOG_SCHEMA",
    "PAYLOAD_SCHEMA",
    "extract_custom_id_from_tags",
    "filter_event_types",
    "normalize_events",
    "payload_field",
    "read_log_dataset",
    "with_tags",
    "get_spark",
    "load_table",
    "load_tables",
    "__version__",
]
