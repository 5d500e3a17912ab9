"""Custom sources (SURVEY §2.1 S1-S9)."""

from .windows import split_windows

__all__ = ["split_windows"]
