"""Sources: corpus synthesis + file readers.

The engine's real input is an Iceberg table
``pages(url, warc_ts, html binary, text, lang)`` (BASELINE.json
input_hint). In this sandbox there is no Iceberg catalog, so
``pages.pages_from_documents`` deterministically synthesizes that
exact shape from the driver-provided ``documents`` parquet, and
``readers`` covers the reference's file-format surface (CSV
dialects, hash-header TSV, FASTA, GFF3-style attribute tables).
"""
