"""Heterogeneous KG edge union — materialized triples (mentions /
same_as_canonical) plus the web-locality edges (host -hosts-> page,
host -links_to-> host) — with its DuckDB CTE twin. Shared by the
2-hop path composition (registry_kg_embed) and the degree
distribution (registry_scale_ops).

All imports are lazy so this module sits outside the registry
family's import order (registry_web must be initialized before the
CTE builder runs, which holds at every decoration/call site).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hetero_edges_ctes() -> str:
    """CTE block `t, hosts, linksto, edges` for a `WITH` clause."""
    from multiomics_biocypher_kg_spark.oracle_fragments import (
        TRIPLES_SQL,
        URL_SQL,
    )
    from multiomics_biocypher_kg_spark.registry_web import (
        _HOST_GRAPH_SQL,
        _host_sql,
    )

    return f"""t AS ({TRIPLES_SQL}),
    hosts AS (
      SELECT {_host_sql(f"({URL_SQL})")} AS subj, 'hosts' AS pred,
        {URL_SQL} AS obj
      FROM documents
    ),
    linksto AS (
      SELECT src_host AS subj, 'links_to' AS pred, dst_host AS obj
      FROM ({_HOST_GRAPH_SQL})
    ),
    edges AS (
      SELECT subj, pred, obj FROM t
      UNION ALL SELECT * FROM hosts
      UNION ALL SELECT * FROM linksto
    )"""


def hetero_edges_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of hetero_edges_ctes -> (subj, pred, obj)."""
    from multiomics_biocypher_kg_spark.functions.urls import url_host
    from multiomics_biocypher_kg_spark.operators.linkgraph import (
        host_graph,
        href_edges,
    )
    from multiomics_biocypher_kg_spark.registry import kg_triples
    from multiomics_biocypher_kg_spark.sources.pages import (
        pages_from_documents,
    )

    pages = pages_from_documents(spark, sf_dir)
    t = kg_triples(spark, sf_dir).select("subj", "pred", "obj")
    hosts = pages.select(
        url_host(F.col("url")).alias("subj"),
        F.lit("hosts").alias("pred"),
        F.col("url").alias("obj"),
    )
    linksto = host_graph(href_edges(pages)).select(
        F.col("src_host").alias("subj"),
        F.lit("links_to").alias("pred"),
        F.col("dst_host").alias("obj"),
    )
    return t.unionByName(hosts).unionByName(linksto)
