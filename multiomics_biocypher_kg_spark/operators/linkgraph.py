"""Web link graph: href extraction -> host graph -> PageRank.

Common-Crawl-scale KG pipelines treat the hyperlink structure itself
as a first-class signal: host-level authority (PageRank) feeds crawl
prioritization and document quality scoring, and anchor edges are KG
evidence. (The reference's analog is its ontology edge tables +
closure/levels enrichment — same role: graph-derived features joined
back onto entities; cf. /root/reference/multiomics_kg/adapters/
cyanorak_annotation_adapter.py ontology edge emission.)

Design for 100 TB:

- ``href_edges``: the anchor regexp runs in the parquet scan
  projection (whole-stage codegen, zero Python); the explode is
  narrow (no shuffle). Canonicalization (functions.urls) collapses
  tracking-param/fragment variants BEFORE the first shuffle, so hot
  raw-variant families dedup map-side.
- ``host_graph``: one shuffle keyed by (src_host, dst_host); the
  partial aggregation is map-side combined, and AQE skew-join
  splitting handles hot hosts (tests/test_plans.py pins the skew
  path on this corpus's 30%-hot host).
- ``pagerank``: the per-iteration cost is ONE shuffle join
  (edges x ranks on src) + ONE aggregation (contributions by dst).
  Edge weights are normalized once up front and the normalized edge
  table is the loop invariant — repartition it by ``src`` and cache
  it so every iteration reuses the same co-partitioned build side.
  Scalar terms (node count, dangling mass) stay distributed as
  broadcast 1-row aggregates — no ``.collect()`` in the loop.
  ``checkpoint_every`` truncates plan lineage for deep iteration
  counts (local checkpoint here; on a real cluster use
  ``spark.sparkContext.setCheckpointDir`` + reliable checkpoints,
  same switch as operators.canonicalize.connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions.urls import canonical_url, url_host

ANCHOR_HREF_RE = r'<a href="([^"]+)"'


def href_edges(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> (src_url, dst_url) one row per anchor.

    ``dst_url`` is canonical (tracking params dropped, fragments
    stripped, params sorted) so downstream grouping keys are stable.
    """
    return (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(
                F.regexp_extract_all(
                    F.col("html").cast("string"), F.lit(ANCHOR_HREF_RE), F.lit(1)
                )
            ).alias("href"),
        )
        .select("src_url", canonical_url(F.col("href")).alias("dst_url"))
    )


def host_graph(edges: DataFrame) -> DataFrame:
    """(src_url, dst_url) -> (src_host, dst_host, n_links, n_pages).

    ``n_links`` counts anchors, ``n_pages`` distinct linking pages —
    both in ONE aggregation pass (count + countDistinct share the
    shuffle under partial aggregation).
    """
    return (
        edges.select(
            url_host(F.col("src_url")).alias("src_host"),
            url_host(F.col("dst_url")).alias("dst_host"),
            "src_url",
        )
        .groupBy("src_host", "dst_host")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("src_url").alias("n_pages"),
        )
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Weighted PageRank over ``edges(src, dst, weight)``.

    Fixed-iteration (deterministic — SQL-oracle-able by unrolling),
    with proper dangling-mass redistribution:

        rank' = (1-d)/n + d * (sum_in(p * rank) + dangling/n)

    where ``p`` is the out-weight-normalized edge weight and
    ``dangling`` is the total rank sitting on nodes with no
    out-edges. Self-loops are legal. Output: (node, rank) with
    sum(rank) == 1 every iteration.
    """
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    norm = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("out_w")).alias("p"))
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    has_out = edges.select("src").distinct()
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for i in range(iters):
        dangling = (
            ranks.join(has_out, ranks["node"] == has_out["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
        )
        contrib = (
            norm.join(ranks, norm["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("contrib"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_df))
            .crossJoin(F.broadcast(dangling))
            .join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") / F.col("n")
                    )
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
