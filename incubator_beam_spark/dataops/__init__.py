"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal column plumbing.

These go beyond the reference's own surface (SURVEY.md §2.11 notes Beam's
ML ops are GCP-API wrappers) — they are first-class engine operators
designed for 100 TB corpora: everything is built-in-expression or
Arrow-batched, keyed shuffles only, broadcast where one side is small.
"""
