"""Source/sink surface (SURVEY.md §2.2 — the reference delegates all
I/O to its host framework; here it is first-class engine API)."""

from topn_spark.sources.io import read, write

__all__ = ["read", "write"]
