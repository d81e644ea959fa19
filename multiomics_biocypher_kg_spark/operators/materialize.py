"""Stage 5 — materialize: typed nodes / edges / (subj,pred,obj) triples.

Mirrors the reference's BioCypher emission + import-time hygiene:

- deterministic edge ids by string composition (F20;
  /root/reference/multiomics_kg/adapters/omics_adapter.py:843) —
  deterministic ids are what make re-runs idempotent / MERGE-able,
- dedup of nodes and edges (skip_duplicate_nodes,
  /root/reference/config/biocypher_config.yaml:13),
- referential integrity: edges whose subj/obj is not a known node
  are dropped via leftsemi joins (skip_bad_relationships, :14).

Sink: partitioned parquet stage tables (partitioned by ``pred`` /
``label`` — the Iceberg layout of the design; this sandbox has no
Iceberg jars, so ``merge_into`` emulates MERGE INTO with
anti-join + union + atomic directory swap, preserving the
exactly-once resume semantics of the north rule).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def triples_from_links(links: DataFrame, subj_col: str = "url") -> DataFrame:
    """Resolved links -> distinct (subj, pred='mentions', obj) triples."""
    return (
        links.where(F.col("entity_id").isNotNull())
        .select(
            F.col(subj_col).alias("subj"),
            F.lit("mentions").alias("pred"),
            F.col("entity_id").alias("obj"),
        )
        .distinct()
    )


def sameas_triples(mapping: DataFrame) -> DataFrame:
    """canonical mapping -> (entity, same_as_canonical, canonical) triples,
    excluding self-loops and quarantined conflict components."""
    return (
        mapping.where(
            (F.col("is_conflict") == "false")
            & (F.col("entity_id") != F.col("canonical_id"))
        )
        .select(
            F.col("entity_id").alias("subj"),
            F.lit("same_as_canonical").alias("pred"),
            F.col("canonical_id").alias("obj"),
        )
        .distinct()
    )


def with_edge_id(triples: DataFrame) -> DataFrame:
    """Deterministic edge id (F20): subj|pred|obj composition."""
    return triples.withColumn(
        "edge_id", F.concat_ws("|", F.col("subj"), F.col("pred"), F.col("obj"))
    )


def referential_filter(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Drop edges whose endpoints are not materialized nodes (J12)."""
    ids = nodes.select(F.col("id").alias("_nid")).distinct()
    out = edges.join(ids, edges.subj == ids._nid, "leftsemi")
    return out.join(ids, edges.obj == ids._nid, "leftsemi")


def merge_into(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
) -> None:
    """Idempotent upsert into a parquet stage table (MERGE INTO
    emulation; on Iceberg this is a real ``MERGE INTO t USING u ON
    keys WHEN MATCHED UPDATE * WHEN NOT MATCHED INSERT *``).

    Re-running with the same updates is a no-op in content terms —
    the resume primitive of the north rule.
    """
    updates = updates.dropDuplicates(keys)
    if os.path.isdir(target_path):
        target = spark.read.parquet(target_path)
        kept = target.join(updates.select(*keys), keys, "left_anti")
        merged = kept.unionByName(updates, allowMissingColumns=True)
    else:
        merged = updates
    tmp = f"{target_path}__tmp_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(target_path):
        shutil.rmtree(target_path)
    os.rename(tmp, target_path)
