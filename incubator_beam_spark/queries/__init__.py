"""Declared query inventory (one module per SURVEY.md §2 area)."""
