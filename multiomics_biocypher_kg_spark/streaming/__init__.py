"""Structured Streaming surface.

The reference is a batch ETL (SURVEY.md §2.11) — these operators are
the streaming twins of the batch stages for incremental corpus
ingestion: watermarked windowed aggregation and stateful
sessionization over the events stream shape.
"""
