"""Streaming operators over the events shape
(event_id, ts, user_id, event_type, value, props).

- ``windowed_counts``: watermarked tumbling-window aggregation
  (late data up to 30 min folds into its window; older is dropped).
- ``streaming_mentions``: the incremental-ingest twin of the batch
  mention stage — a streaming DataFrame of documents flows through
  the SAME mentions_tokens/link operators (they are pure
  transformations, so they compose with readStream unchanged).
- ``run_events_batch_as_stream``: test harness — drives a parquet
  directory through a streaming query synchronously via the memory
  sink (processAllAvailable), so tests observe real streaming
  execution without an external source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def dedup_stream(docs: DataFrame) -> DataFrame:
    """Streaming exact dedup: content-hash ``dropDuplicates`` whose
    seen-hash state persists ACROSS micro-batches — a duplicate
    arriving hours after its original is still dropped, which is the
    property batch dedup-by-partition cannot give an incremental
    crawl. State is one row per distinct hash (the streaming twin of
    the dedup_incremental_lsh signature index); with an event-time
    column, ``dropDuplicatesWithinWatermark`` bounds that state for
    true-infinite streams."""
    return docs.withColumn("text_md5", F.md5("text")).dropDuplicates(
        ["text_md5"]
    )


def windowed_counts(events: DataFrame) -> DataFrame:
    """Watermarked 1-hour tumbling windows per event_type."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_events_batch_as_stream(
    spark: SparkSession, parquet_path: str, query_name: str = "stream_out"
) -> DataFrame:
    """Drive a parquet file through the streaming plan to completion
    (memory sink); returns the materialized result as a DataFrame."""
    import os
    import tempfile

    if os.path.isfile(parquet_path):
        # FileStreamSource needs a directory
        d = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(parquet_path, os.path.join(d, os.path.basename(parquet_path)))
        parquet_path = d
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(parquet_path)
    )
    agg = windowed_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running event count + running value sum maintained in state
    across micro-batches — the streaming twin of a cumulative
    aggregation, and the pattern slot for custom session/state logic
    the built-in operators can't express.

    Output one row per (user, batch) with the post-batch totals.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    out_schema = "user_id long, n_events long, sum_value double"
    state_schema = "n long, s double"

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "append", "NoTimeout"
    )


def run_stateful_batch_as_stream(
    spark: SparkSession, parquet_path: str, query_name: str = "stateful_out"
) -> DataFrame:
    """Drive the stateful operator over a parquet-backed stream."""
    import os
    import tempfile

    if os.path.isfile(parquet_path):
        d = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(parquet_path, os.path.join(d, os.path.basename(parquet_path)))
        parquet_path = d
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(parquet_path)
    )
    q = (
        stateful_user_counts(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
