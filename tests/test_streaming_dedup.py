"""Streaming watermarked dedup: within-watermark duplicates dropped
with BOUNDED state, and windowed latest-snapshot-per-url — driven to
completion via file source + memory sink and cross-checked against
closed-form expectations."""

from __future__ import annotations

import tempfile

from multiomics_biocypher_kg_spark.streaming.dedup import (
    streaming_exact_dedup,
    streaming_url_latest,
)

_SCHEMA = "doc_id long, url string, text string, event_time timestamp"


def _rows(spark, d, rows):
    spark.createDataFrame(rows, _SCHEMA).write.mode("overwrite").parquet(
        f"{d}/docs"
    )
    return spark.readStream.schema(_SCHEMA).parquet(f"{d}/docs")


def test_streaming_exact_dedup_drops_within_watermark(spark):
    rows = [
        (1, "u1", "alpha beta", "2026-01-01 10:00:00"),
        (2, "u2", "alpha beta", "2026-01-01 10:02:00"),   # dup of 1, inside horizon
        (3, "u3", "gamma delta", "2026-01-01 10:03:00"),
        (4, "u4", "alpha beta", "2026-01-01 10:04:00"),   # dup again
    ]
    with tempfile.TemporaryDirectory() as d:
        stream = _rows(
            spark,
            d,
            [(i, u, t, __import__("datetime").datetime.fromisoformat(ts))
             for i, u, t, ts in rows],
        )
        out = streaming_exact_dedup(stream)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_sdedup")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.sql("SELECT doc_id FROM t_sdedup").collect()
        kept = sorted(r.doc_id for r in got)
    # one representative per distinct content; all four arrive in one
    # micro-batch so the duplicates are inside the watermark horizon
    assert len(kept) == 2
    assert 3 in kept and (1 in kept or 2 in kept or 4 in kept)


def test_streaming_url_latest_window(spark):
    dt = __import__("datetime").datetime.fromisoformat
    rows = [
        (1, "u1", "v1", dt("2026-01-01 10:01:00")),
        (2, "u1", "v2", dt("2026-01-01 10:05:00")),   # same window, later -> wins
        (3, "u1", "v3", dt("2026-01-01 10:15:00")),   # next window
        (4, "u2", "w1", dt("2026-01-01 10:02:00")),
    ]
    with tempfile.TemporaryDirectory() as d:
        stream = _rows(spark, d, rows)
        out = streaming_url_latest(stream)
        # complete mode: emit windows every trigger without waiting
        # for watermark closure (the file source is exhausted after
        # one batch, so append-mode windows would never close here)
        q = (
            out.writeStream.outputMode("complete")
            .format("memory")
            .queryName("t_surl")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.sql(
            "SELECT url, window_start, n_crawls, latest_md5 FROM t_surl"
        ).collect()
    by_key = {(r.url, str(r.window_start)): r for r in got}
    k1 = ("u1", "2026-01-01 10:00:00")
    assert by_key[k1].n_crawls == 2
    import hashlib

    assert by_key[k1].latest_md5 == hashlib.md5(b"v2").hexdigest()
    assert by_key[("u1", "2026-01-01 10:10:00")].n_crawls == 1
    assert by_key[("u2", "2026-01-01 10:00:00")].n_crawls == 1
