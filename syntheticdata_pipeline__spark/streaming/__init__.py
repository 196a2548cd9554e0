"""Structured Streaming layer (SURVEY.md §2.9 R1-R7)."""
