"""Structured Streaming feeds: the replication layer as dataflow
(SURVEY.md §2.10)."""
