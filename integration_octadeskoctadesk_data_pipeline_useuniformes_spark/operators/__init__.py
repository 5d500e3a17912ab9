"""Relational + extension operators (SURVEY §2.2-2.8, §7 slice 8)."""
