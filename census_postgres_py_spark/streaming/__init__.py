"""Structured Streaming operators (SURVEY.md §2.8 true-stream forms)."""
