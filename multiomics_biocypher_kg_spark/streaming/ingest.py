"""Streaming KG ingestion: the crawl keeps arriving.

``readStream`` over a documents directory flows through the SAME
pure transforms as the batch pipeline (pages synth -> extract ->
mention -> link are all stateless column programs, so they compose
with a streaming frame unchanged); the sink is ``foreachBatch`` into
the MERGE INTO emulation keyed by edge_id — so a re-delivered or
retried micro-batch upserts the same deterministic edge ids and the
triple table converges exactly-once in content terms (the same
resume primitive the batch StagedRunner uses; on Iceberg this is a
real MERGE INTO per micro-batch).

Scale notes: per-batch work is the batch plan (broadcast link joins,
no shuffle of the mention stream); the merge joins on edge_id — at
real scale the target is partitioned by pred and the join prunes to
touched partitions. Distinct-within-batch happens in foreachBatch
(a streaming-global distinct would need unbounded state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def streaming_triples_query(
    spark: SparkSession,
    docs_dir: str,
    target_path: str,
    checkpoint_dir: str,
    docs_schema: str = DOCS_SCHEMA,
):
    """Build (not start) the streaming query: documents dir ->
    mention triples upserted into ``target_path``."""
    from multiomics_biocypher_kg_spark.operators.extract import extract
    from multiomics_biocypher_kg_spark.operators.link import link
    from multiomics_biocypher_kg_spark.operators.materialize import (
        merge_into,
        triples_from_links,
        with_edge_id,
    )
    from multiomics_biocypher_kg_spark.operators.mention import mentions_tokens
    from multiomics_biocypher_kg_spark.sources.pages import pages_from_documents_df
    from multiomics_biocypher_kg_spark.sources.vocab import vocab_df

    vocab = vocab_df(spark)
    docs = spark.readStream.schema(docs_schema).parquet(docs_dir)
    links = link(mentions_tokens(extract(pages_from_documents_df(docs)), vocab), vocab)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        triples = with_edge_id(triples_from_links(batch_df, subj_col="url"))
        merge_into(spark, target_path, triples, keys=["edge_id"])

    return (
        links.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def run_streaming_triples(
    spark: SparkSession, docs_dir: str, target_path: str, checkpoint_dir: str
) -> DataFrame:
    """Run the ingestion to completion over what's currently in
    ``docs_dir`` (availableNow) and return the materialized triple
    table."""
    q = streaming_triples_query(spark, docs_dir, target_path, checkpoint_dir).start()
    q.awaitTermination()
    return spark.read.parquet(target_path)
