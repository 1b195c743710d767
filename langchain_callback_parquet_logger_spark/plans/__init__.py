from .session import (
    cache_tracked,
    get_spark,
    load_table,
    load_tables,
    release_caches,
    spread,
    table_path,
)

__all__ = [
    "cache_tracked",
    "get_spark",
    "load_table",
    "load_tables",
    "release_caches",
    "spread",
    "table_path",
]
