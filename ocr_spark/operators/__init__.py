"""Spark operators of the extraction engine (SURVEY.md §2)."""
