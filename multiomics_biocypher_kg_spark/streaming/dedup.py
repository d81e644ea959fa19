"""Streaming dedup: drop re-crawled duplicates as they arrive.

Batch dedup (operators.dedup) answers "what is duplicated in this
corpus"; a live crawl needs the other direction — suppress a
duplicate AT INGEST, with BOUNDED state. Two watermark-scoped
variants over a streaming documents frame:

- ``streaming_exact_dedup``: ``dropDuplicatesWithinWatermark`` on
  the content hash — a duplicate arriving within the watermark
  horizon of its first copy is dropped; state for a hash is evicted
  once the watermark passes it, so state is (hashes seen within the
  horizon), NOT (all hashes ever) — the unbounded-state trap a
  plain streaming ``dropDuplicates`` falls into.
- ``streaming_url_latest``: re-crawls of the same url within a
  window deduplicate to one row per (url, window) via the windowed
  ``max_by`` aggregate (latest snapshot wins by event time) —
  the streaming twin of the batch ``web_latest_snapshot``.

Scale notes: both plans shuffle once on the dedup key (hash / url+
window) exactly like their batch twins; state is per-key and
watermark-evicted, so executor memory is bounded by (arrival rate x
horizon), not corpus size. At 100 TB-scale crawl rates the horizon
is the re-crawl SLA (hours-days), which is what makes within-
watermark semantics the only tractable exactly-once dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    docs: DataFrame,
    ts_col: str = "event_time",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked exact dedup on the content hash.

    ``docs`` is a STREAMING frame carrying an event-time column.
    -> the stream with within-watermark duplicates dropped
    (first-arrival wins; late copies beyond the horizon are the
    documented re-admit contract — the batch exact pass sweeps
    those)."""
    return (
        docs.withColumn("text_md5", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["text_md5"])
    )


def streaming_url_latest(
    docs: DataFrame,
    ts_col: str = "event_time",
    url_col: str = "url",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Latest snapshot per (url, event-time window) on a stream:
    windowed groupBy + max_by(event time) — one state row per
    (url, window), watermark-evicted on window close.

    -> (url, window_start, window_end, n_crawls, latest_md5,
    latest_ts)."""
    return (
        docs.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(url_col).alias("url"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_crawls"),
            F.expr(f"max_by(md5(text), {ts_col})").alias("latest_md5"),
            F.max(ts_col).alias("latest_ts"),
        )
        .select(
            "url",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_crawls",
            "latest_md5",
            "latest_ts",
        )
    )
