"""End-to-end KG-construction DAG.

extract -> mention -> link -> canonicalize -> materialize -> enrich
(SURVEY.md §7.1). Every stage is a pure DataFrame transform; the
returned dict is lazy — callers decide what to materialize (tests
collect tiny slices; ``run_staged`` persists each stage as a
partitioned parquet stage table with a lineage row, the
Iceberg-layout stand-in).

Same-as evidence: in the real corpus this comes from shared-ID /
co-mention evidence; for the deterministic driver corpus
``sameas_from_documents`` synthesizes a known-component-structure
graph (stars of 5 bridged in pairs -> components of 10), matching
FIXTURES.md A3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.operators.canonicalize import canonical_mapping
from multiomics_biocypher_kg_spark.operators.enrich import (
    entity_rollups,
    rank_percentile_bucket,
)
from multiomics_biocypher_kg_spark.operators.extract import extract
from multiomics_biocypher_kg_spark.operators.link import link, resolution_histogram
from multiomics_biocypher_kg_spark.operators.materialize import (
    sameas_triples,
    triples_from_links,
    with_edge_id,
)
from multiomics_biocypher_kg_spark.operators.mention import mentions_tokens
from multiomics_biocypher_kg_spark.sources.pages import pages_from_documents
from multiomics_biocypher_kg_spark.sources.vocab import vocab_df


def sameas_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic same-as evidence keyed off doc_id (FIXTURES A3):
    star edges d -> d - d%5, plus bridges d -> d+1 when d%10 == 4."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    ent = lambda c: F.format_string("ent:%06d", c)  # noqa: E731
    stars = docs.select(
        ent(F.col("doc_id")).alias("id_a"),
        ent(F.col("doc_id") - F.col("doc_id") % 5).alias("id_b"),
        F.lit("star").alias("source"),
    )
    bridges = docs.where(F.col("doc_id") % 10 == 4).select(
        ent(F.col("doc_id")).alias("id_a"),
        ent(F.col("doc_id") + 1).alias("id_b"),
        F.lit("bridge").alias("source"),
    )
    return stars.union(bridges).where(F.col("id_a") != F.col("id_b"))


def build_graph(
    spark: SparkSession, sf_dir: str, cc_checkpoint: str = "local"
) -> dict[str, DataFrame]:
    """Run the full DAG over the driver corpus; returns lazy stages.

    ``cc_checkpoint='reliable'`` makes the connected-components loop
    checkpoint to the durable dir set via setCheckpointDir — the
    multi-executor setting where a lost executor must not kill the
    lineage-truncated run."""
    pages = pages_from_documents(spark, sf_dir)
    vocab = vocab_df(spark)
    docs = extract(pages)
    mentions = mentions_tokens(docs, vocab)
    links = link(mentions, vocab)
    sameas = sameas_from_documents(spark, sf_dir)
    mapping = canonical_mapping(sameas, checkpoint=cc_checkpoint)

    mention_triples = triples_from_links(links, subj_col="url")
    same_triples = sameas_triples(mapping)
    triples = with_edge_id(mention_triples.unionByName(same_triples))

    rollups = entity_rollups(links)
    ranked = rank_percentile_bucket(
        rollups.withColumn("vocab_group", F.split("entity_id", ":")[0]),
        ["vocab_group"],
        "mention_count",
        "entity_id",
    )
    return {
        "pages": pages,
        "docs": docs,
        "mentions": mentions,
        "links": links,
        "link_histogram": resolution_histogram(links),
        "sameas": sameas,
        "mapping": mapping,
        "triples": triples,
        "entity_nodes": ranked,
    }


def run_staged(
    spark: SparkSession, sf_dir: str, workdir: str, cc_checkpoint: str = "local"
) -> dict[str, "DataFrame"]:
    """The DAG as idempotent, resumable stage tables (north rule):
    each stage = one parquet stage table + lineage row; re-running
    skips completed stages; a crashed half-write converges via the
    MERGE INTO emulation (see plans.lineage.StagedRunner)."""
    from multiomics_biocypher_kg_spark.plans.lineage import StagedRunner

    runner = StagedRunner(spark, workdir)
    stages = build_graph(spark, sf_dir, cc_checkpoint=cc_checkpoint)
    out: dict[str, DataFrame] = {}
    out["docs"] = runner.run_stage("extract", lambda: stages["docs"], ["url"])
    out["links"] = runner.run_stage(
        "link", lambda: stages["links"], ["url", "pos"]
    )
    out["mapping"] = runner.run_stage(
        "canonicalize", lambda: stages["mapping"], ["entity_id"]
    )
    out["triples"] = runner.run_stage(
        "materialize", lambda: stages["triples"], ["edge_id"]
    )
    out["entity_nodes"] = runner.run_stage(
        "enrich", lambda: stages["entity_nodes"], ["entity_id"]
    )
    return out
