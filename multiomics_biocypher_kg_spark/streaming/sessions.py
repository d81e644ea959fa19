"""Gap-based sessionization as a CUSTOM stateful streaming operator
(applyInPandasWithState + EventTimeTimeout) — the §2.11 pattern the
built-in operators cannot express: per-key state that closes on a
DATA-dependent condition (inactivity gap) rather than a fixed window.

Semantics (the standard web-analytics definition): events of one
user belong to the same session while consecutive event times are
within ``gap_s`` seconds; a longer silence closes the session. A
closed session is emitted either when a later event proves the gap
(arrival-closed) or when the event-time watermark passes
last_ts + gap (timeout-closed — the eviction path that bounds state
at web scale: open sessions only, never history).

Scale shape: state is ONE tuple per active user (start, last, n,
sum) — arrival rate x gap horizon, independent of corpus size; the
watermark timeout is exactly the state-eviction contract the
streaming watermarked dedup documents. Batch twin for verification:
``sessionize_batch`` (lag-window gap-split), so the streaming output
is value-gated against a closed-form DataFrame computation
(tests/test_streaming_sessions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.streaming.events import EVENTS_SCHEMA

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double, closed_by string"
)


def sessionize_stream(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """events (streaming, watermarked ts) -> closed sessions.

    One state row per open session; rows emit only when a session
    CLOSES (append mode). ``closed_by`` records the path taken
    ('gap' = a later event arrived past the gap, 'timeout' = the
    watermark passed last_ts + gap with no successor).
    """
    import datetime as dt

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    state_schema = "start long, last long, n long, s double"
    gap_us = gap_s * 1_000_000

    def _us(ts) -> int:
        # pandas Timestamp -> integer microseconds since epoch
        return int(pd.Timestamp(ts).value // 1000)

    def _row(uid, start, last, n, s, how):
        return {
            "user_id": uid,
            "session_start": pd.Timestamp(start, unit="us"),
            "session_end": pd.Timestamp(last, unit="us"),
            "n_events": n,
            "sum_value": round(s, 2),
            "closed_by": how,
        }

    def update(key, pdfs, state: GroupState):
        uid = key[0]
        closed = []
        if state.hasTimedOut:
            start, last, n, s = state.get
            closed.append(_row(uid, start, last, n, s, "timeout"))
            state.remove()
            yield pd.DataFrame(closed)
            return
        ev = pd.concat(list(pdfs), ignore_index=True)
        ev = ev.sort_values("ts", kind="mergesort")
        cur = state.get if state.exists else None
        for ts, val in zip(ev["ts"], ev["value"]):
            t = _us(ts)
            if cur is None:
                cur = (t, t, 1, float(val))
            elif t - cur[1] <= gap_us:
                cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + float(val))
            else:
                closed.append(_row(uid, cur[0], cur[1], cur[2], cur[3], "gap"))
                cur = (t, t, 1, float(val))
        state.update(cur)
        # evict when the watermark passes the open session's gap edge
        state.setTimeoutTimestamp(cur[1] // 1000 + gap_s * 1000)
        if closed:
            yield pd.DataFrame(closed)

    return (
        events.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, OUT_SCHEMA, state_schema, "append", "EventTimeTimeout"
        )
    )


def sessionize_batch(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Closed-form batch twin: gap-split via a lag window per user
    (new session whenever ts - prev_ts > gap), then one groupBy per
    session id. The per-user window sorts per-user event history —
    bounded fanout; at 10^12 events the streaming operator IS the
    scale path (state = open sessions only)."""
    w = Window.partitionBy("user_id").orderBy("ts")
    marked = events.select(
        "user_id",
        "ts",
        "value",
        (
            F.coalesce(
                # unix_micros over an NTZ->LTZ cast: the zone shift is
                # session-constant and cancels in the difference
                # (Spark 4 forbids a direct timestamp->double cast)
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
                > gap_s * 1_000_000,
                F.lit(True),
            )
        )
        .cast("long")
        .alias("new_sess"),
    ).withColumn("sess_no", F.sum("new_sess").over(w))
    return marked.groupBy("user_id", "sess_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def run_sessionize_batch_as_stream(
    spark: SparkSession,
    parquet_dir: str,
    gap_s: int = 1800,
    query_name: str = "sessions_out",
) -> DataFrame:
    """Drive sessionization over a parquet-backed stream, one file
    per micro-batch (multiple files -> the watermark advances between
    batches, so EventTimeTimeout eviction actually fires)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(parquet_dir)
    )
    q = (
        sessionize_stream(stream, gap_s=gap_s)
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
