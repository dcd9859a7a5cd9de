"""Streaming / incremental ingestion (SURVEY.md §2.10)."""
