"""Gap-based sessionization (applyInPandasWithState +
EventTimeTimeout) — streaming output value-gated against the
closed-form batch twin (lag-window gap split)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.streaming.sessions import (
    run_sessionize_batch_as_stream,
    sessionize_batch,
)
from tests.conftest import SF_TINY

GAP_S = 600


def _canon(rows):
    return sorted(
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            round(r["sum_value"], 2),
        )
        for r in rows
    )


def test_stream_sessions_match_batch_twin(spark, tmp_path):
    """Split the events table into time-ordered files (one per
    micro-batch so the watermark advances between batches and
    EventTimeTimeout fires), stream it through the stateful
    sessionizer, and compare the union of gap-closed and
    timeout-closed sessions against the batch gap-split — modulo
    each user's FINAL session, which stays open in state when the
    stream ends (the watermark never passes it)."""
    ev = (
        spark.read.parquet(f"{SF_TINY}/events.parquet")
        .where(F.col("user_id") < 8)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    src = str(tmp_path / "ev_stream")
    # 4 time-ordered files: ntile over the global ts order
    from pyspark.sql import Window

    ranked = ev.withColumn(
        "part", F.ntile(4).over(Window.orderBy("ts"))
    )
    import time

    for p in range(1, 5):
        ranked.where(F.col("part") == p).drop("part").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        # FileStreamSource orders micro-batches by file mtime (ms
        # resolution, ties broken by the random part-file name) —
        # space the writes so batch order == event-time order
        time.sleep(0.05)
    assert len([f for f in os.listdir(src) if f.endswith(".parquet")]) == 4

    streamed = run_sessionize_batch_as_stream(spark, src, gap_s=GAP_S).collect()
    batch = sessionize_batch(ev, gap_s=GAP_S)

    # drop each user's final (open-ended) session from the batch twin
    w = Window.partitionBy("user_id")
    closed_batch = (
        batch.withColumn("last_start", F.max("session_start").over(w))
        .where(F.col("session_start") != F.col("last_start"))
        .collect()
    )

    got = _canon(streamed)
    want = _canon(closed_batch)
    # every batch-closed session must be emitted by the stream; the
    # stream may additionally emit timeout-closed sessions that are
    # the batch's final sessions (watermark passed them before EOF)
    missing = [s for s in want if s not in got]
    assert not missing, f"stream missed closed sessions: {missing[:3]}"
    extra = [s for s in got if s not in want]
    finals = _canon(
        batch.withColumn("last_start", F.max("session_start").over(w))
        .where(F.col("session_start") == F.col("last_start"))
        .collect()
    )
    assert all(s in finals for s in extra), f"phantom sessions: {extra[:3]}"
    # both closure paths exercised
    assert {r["closed_by"] for r in streamed} <= {"gap", "timeout"}
    assert any(r["closed_by"] == "gap" for r in streamed)


def test_session_gap_semantics_tiny(spark, tmp_path):
    """Hand-built fixture: 1 user, events at t=0s,100s,1000s,1100s
    with gap 600 -> exactly two sessions [0,100] and [1000,1100]."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 7, "a", 1.0, "{}"),
        (2, t0 + dt.timedelta(seconds=100), 7, "a", 2.0, "{}"),
        (3, t0 + dt.timedelta(seconds=1000), 7, "a", 3.0, "{}"),
        (4, t0 + dt.timedelta(seconds=1100), 7, "a", 4.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        (r["session_start"], r["session_end"]): r
        for r in sessionize_batch(ev, gap_s=600).collect()
    }
    assert len(out) == 2
    (s1, s2) = sorted(out)
    assert out[s1]["n_events"] == 2 and out[s1]["sum_value"] == 3.0
    assert out[s2]["n_events"] == 2 and out[s2]["sum_value"] == 7.0
