"""Structured Streaming ingest (optional path — the reference is pure
batch, SURVEY.md §2.8)."""
