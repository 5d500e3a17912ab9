"""Incremental / Structured Streaming variants (SURVEY §2.10 T1-T5)."""
