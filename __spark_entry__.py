"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query (full KG pipeline triples @ sf0.001)
queries()     -> every implemented operator (SURVEY.md §2)
oracle_sql()  -> matching DuckDB oracle per query

Implementation lives in multiomics_biocypher_kg_spark.registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multiomics_biocypher_kg_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full KG-construction DAG (extract -> mention ->
    link -> canonicalize -> materialize) on sf0.001; returns the
    (subj, pred, obj, edge_id) triple table."""
    return registry.QUERIES["kg_triples"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
