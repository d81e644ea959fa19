"""Scalar function library (native Column expressions first).

Mirrors the reference's utility surface (clean_text, CURIE
normalization, significance cascade, fold-change conversion,
timepoint parsing) re-expressed as pyspark.sql.functions
compositions — see each module's docstring for the reference
file:line it re-implements.
"""
