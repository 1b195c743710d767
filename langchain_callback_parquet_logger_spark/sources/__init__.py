from .readers import read_events, read_log

__all__ = ["read_events", "read_log"]
