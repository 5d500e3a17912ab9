"""Scalar / name-level helper functions (SURVEY §2.9)."""

from .names import sanitize_column_name, sanitize_columns, dedupe_column_names

__all__ = [
    "sanitize_column_name",
    "sanitize_columns",
    "dedupe_column_names",
]
