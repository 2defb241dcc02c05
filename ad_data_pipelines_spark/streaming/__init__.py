"""Structured Streaming variants of the daily aggregate pipelines
(beyond-reference: the reference system is batch-only, SURVEY.md §2.9)."""
