"""Structured Streaming: windowed agg driven to completion via the
memory sink, cross-checked against the equivalent batch aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.streaming.events import (
    run_events_batch_as_stream,
    windowed_counts,
)
from tests.conftest import SF_TINY


def test_windowed_counts_stream_equals_batch(spark):
    path = f"{SF_TINY}/events.parquet"
    streamed = run_events_batch_as_stream(spark, path, "t_stream_eq").collect()
    batch = (
        spark.read.parquet(path)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n", "sum_value")
        .collect()
    )
    assert sorted(map(tuple, streamed)) == sorted(map(tuple, batch))
    assert len(streamed) > 0


def test_streaming_mentions_compose(spark):
    """The batch mention/link operators compose unchanged with
    readStream (pure transformations)."""
    import tempfile

    from multiomics_biocypher_kg_spark.operators.link import link
    from multiomics_biocypher_kg_spark.operators.mention import mentions_tokens
    from multiomics_biocypher_kg_spark.sources.vocab import vocab_df

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [("u1", "hash join beats sort", "en")],
            "url string, text string, lang string",
        ).write.mode("overwrite").parquet(f"{d}/docs")
        stream = spark.readStream.schema(
            "url string, text string, lang string"
        ).parquet(f"{d}/docs")
        vocab = vocab_df(spark)
        links = link(mentions_tokens(stream, vocab), vocab)
        q = (
            links.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_stream_links")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql("SELECT * FROM t_stream_links").collect()
        got = {(r.token, r.entity_id) for r in rows}
        assert ("hash", "kw:hash") in got and ("sort", "kw:sort") in got


def test_stateful_user_counts(spark):
    from multiomics_biocypher_kg_spark.streaming.events import (
        run_stateful_batch_as_stream,
    )

    path = f"{SF_TINY}/events.parquet"
    out = run_stateful_batch_as_stream(spark, path, "t_stateful").collect()
    got = {r.user_id: (r.n_events, r.sum_value) for r in out}
    batch = (
        spark.read.parquet(path)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    )
    expect = {r.user_id: (r.n, r.s) for r in batch}
    assert got == expect


def test_streaming_dedup_state_spans_micro_batches(spark):
    """Streaming exact dedup drops duplicates that arrive in LATER
    micro-batches: the seen-hash state is cross-batch, not per-batch
    — the property an incremental crawl needs from its dedup stage."""
    import tempfile

    from multiomics_biocypher_kg_spark.streaming.events import dedup_stream

    with tempfile.TemporaryDirectory() as d:
        schema = "doc_id long, text string"
        spark.createDataFrame(
            [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")],
            schema,
        ).coalesce(1).write.mode("overwrite").parquet(f"{d}/docs")
        stream = spark.readStream.schema(schema).parquet(f"{d}/docs")
        q = (
            dedup_stream(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("t_stream_dedup")
            .start()
        )
        try:
            q.processAllAvailable()
            first = spark.sql(
                "SELECT text FROM t_stream_dedup"
            ).collect()
            assert sorted(r.text for r in first) == [
                "alpha beta",
                "gamma delta",
            ]
            # second micro-batch: one genuinely new doc + one dup of
            # a batch-1 doc -> only the new one survives
            spark.createDataFrame(
                [(4, "epsilon zeta"), (5, "gamma delta")], schema
            ).coalesce(1).write.mode("append").parquet(f"{d}/docs")
            q.processAllAvailable()
            rows = spark.sql("SELECT text FROM t_stream_dedup").collect()
        finally:
            q.stop()
        assert sorted(r.text for r in rows) == [
            "alpha beta",
            "epsilon zeta",
            "gamma delta",
        ]
