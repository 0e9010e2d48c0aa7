"""Sources & sinks (SURVEY §2.1)."""

from .io import read_table, write_table_resumable

__all__ = ["read_table", "write_table_resumable"]
