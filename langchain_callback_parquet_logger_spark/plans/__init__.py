from .session import get_spark, table_path, load_table, load_tables

__all__ = ["get_spark", "table_path", "load_table", "load_tables"]
