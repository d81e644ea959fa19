"""Local mimic of the driver's Spark-vs-DuckDB comparison.

Sorts columns by name, canonicalizes values (rounded floats,
stringified), sorts rows, and asserts exact equality — a stricter
local stand-in for the driver's order-insensitive value-hash.
"""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_value(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonicalization: collapse float noise
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def canon_frame(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare_query(spark, name: str, sf_dir: str, queries, oracles) -> None:
    sdf = queries[name](spark, sf_dir)
    spdf = sdf.toPandas()
    con = duckdb_con(sf_dir)
    opdf = con.sql(oracles[name]).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), (
        f"{name}: column mismatch {sorted(spdf.columns)} vs {sorted(opdf.columns)}"
    )
    assert len(spdf) == len(opdf), f"{name}: rowcount {len(spdf)} vs {len(opdf)}"
    s_rows, o_rows = canon_frame(spdf), canon_frame(opdf)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
