"""Deterministic synthetic page corpus (FIXTURES.md A1 shape).

Builds the input_hint table ``pages(url, warc_ts, html binary,
text, lang)`` from the driver's ``documents`` parquet with:

- unique urls; a hot host holding ~30% of rows (doc_id % 10 < 3)
  to exercise salting / AQE skew handling downstream,
- ``warc_ts`` deterministic and monotone per host,
- ``html`` synthesized entirely with native Column expressions
  (functions.text.synth_html_col): entities, script/style blocks,
  comments, nested tags, and ~1/17 rows with broken trailing markup,
- ``text`` kept as the byte-identical-per-url oracle column.

``doc_id`` is carried through as the parity join key to the DuckDB
oracle (a real corpus would not have it; nothing downstream depends
on it except tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions.text import synth_html_col

# 2026-01-01T00:00:00Z
_EPOCH0 = 1767225600
HOT_HOST = "hot.example.com"


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> pages DataFrame (input_hint shape + doc_id).

    The seed scan is REBALANCED to the session's core count before
    html synthesis when the parquet under-splits (tiny compressed
    seed -> 1-3 splits, then amplified ~20x into html in flight):
    this is the north-rule "repartition by url-hash for extraction"
    — the exchange moves the small PRE-amplification table, and the
    regexp-heavy synth/extract chain then uses every core. On a real
    corpus the input arrives in thousands of splits, so the guard is
    a no-op and no shuffle is added.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par, "doc_id")
    return pages_from_documents_df(docs)


def url_of(doc_id):  # Column -> Column
    """URL formula as a function of a doc-id column (shared by the
    page synthesizer and the outlink targets; SQL mirror:
    registry.url_sql)."""
    host = F.when(doc_id % 10 < 3, F.lit(HOT_HOST)).otherwise(
        F.concat(F.lit("h"), (doc_id % 50).cast("string"), F.lit(".example.org"))
    )
    return F.concat(
        F.lit("https://"), host, F.lit("/doc/"),
        F.lpad(doc_id.cast("string"), 6, "0"),
    )


PARTNER_URL = "https://partner.example.net/about"


def outlinks_of(doc_id):  # Column -> Column (array<string> of raw hrefs)
    """Deterministic nav outlinks per page — a crawl-graph stand-in:

    - a 7-bucket hub page, utm-tagged (canonicalization must strip it),
    - a 50-bucket section hub with a fragment (ditto),
    - a constant external partner link (a dangling PageRank node).

    Targets are pure functions of doc_id over the dense id range, so
    every intra-corpus target exists at any scale factor.
    """
    hub7 = F.concat(url_of(doc_id - doc_id % 7), F.lit("?utm_source=nav"))
    hub50 = F.concat(url_of(doc_id - doc_id % 50), F.lit("#top"))
    return F.array(hub7, hub50, F.lit(PARTNER_URL))


def anchor_texts_of(doc_id):  # Column -> Column (array<string>)
    """Per-link anchor texts, parallel to outlinks_of. The residues
    (3/5/2) are coprime-ish to the target buckets (7/50/1), so each
    link TARGET accumulates several distinct anchor surfaces with
    deterministic, non-uniform counts — what anchor-text surface-form
    mining needs to have real signal. SQL mirror: registry._ANCHORS_SQL."""
    return F.array(
        F.concat(F.lit("hub "), (doc_id % 3).cast("string")),
        F.concat(F.lit("section "), (doc_id % 5).cast("string")),
        F.concat(F.lit("partner "), (doc_id % 2).cast("string")),
    )


def pages_from_documents_df(docs: DataFrame) -> DataFrame:
    """The pure transform half — composes with readStream unchanged
    (streaming/ingest.py feeds a streaming documents frame through
    it)."""
    url = url_of(F.col("doc_id"))
    broken = (F.col("doc_id") % 17) == 0
    # ~1/23 pages carry <meta name="robots" content="noindex"> — the
    # crawl-politeness gate web_robots_gate must honor (SQL mirror:
    # doc_id % 23 = 1)
    noindex = (F.col("doc_id") % 23) == 1
    return docs.select(
        F.col("doc_id"),
        url.alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH0) + F.col("doc_id")).alias("warc_ts"),
        synth_html_col(
            url, F.col("text"), F.col("lang"), broken,
            outlinks=outlinks_of(F.col("doc_id")),
            anchors=anchor_texts_of(F.col("doc_id")),
            noindex=noindex,
        )
        .cast("binary")
        .alias("html"),
        F.col("text"),
        F.col("lang"),
    )
