"""Structured-Streaming incremental index maintenance (SURVEY.md §2.9)."""
