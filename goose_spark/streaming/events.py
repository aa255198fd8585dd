"""Structured Streaming analytics over event streams — watermarks,
tumbling/sliding/session windows, late-data policy.

The reference's only time-indexed structures are sorted sets scored by
epoch-ms (scheduler/cron); it has no windowed aggregation at all
(SURVEY §2.5). These operators supply the streaming layer the engine
needs for the events table / job-metrics streams, with the batch-form
twins (q21 and the Q-J queries) giving the DuckDB-checkable semantics.

Late-data policy (SURVEY §2.5 watermark row): a watermark of
``delay`` drops events older than ``max(event_time) - delay`` once the
window closes — the streaming analog of goose's "backfill exactly one
missed cron run, not n" bounded-lateness stance (cron-jobs.md ADR).

All builders accept any streaming OR batch DataFrame with an event-time
column, so tests drive them with a file-source stream over the same
parquet the batch oracle reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(events: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    if events.isStreaming:
        return events.withWatermark(ts_col, delay)
    return events


def tumbling_counts(events: DataFrame, width: str = "1 hour",
                    ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Per (window, event_type) count + sum — the streaming twin of
    q21_tumbling_window_batch."""
    return (
        with_watermark(events, ts_col, delay)
        .groupBy(F.window(ts_col, width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )


def sliding_rates(events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes",
                  ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Sliding-window event rate per type (overlapping windows)."""
    return (
        with_watermark(events, ts_col, delay)
        .groupBy(F.window(ts_col, width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity (F.session_window — dynamic, data-driven window bounds)."""
    return (
        with_watermark(events, ts_col, delay)
        .groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total",
        )
    )


def effect_once(stream: DataFrame, keys: list[str], ts_col: str,
                within: str = "1 hour") -> DataFrame:
    """Effect-once guard: drop duplicate rows by key within a watermark
    horizon (``dropDuplicatesWithinWatermark``) — the engine's answer to
    at-least-once replays reaching a side-effecting sink (SURVEY §7.4.3:
    goose is at-least-once too and tells users to make jobs idempotent;
    this gives the sink-side dedup for effects that cannot be).

    State is bounded by the watermark horizon — only keys seen within
    ``within`` are retained, so it scales with throughput × horizon,
    not history."""
    return stream.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(keys)


def job_queue_depth_stream(log_stream: DataFrame) -> DataFrame:
    """Queue-depth gauge stream over the job ledger — the streaming
    analog of the metrics sweep at src/goose/brokers/redis/metrics.clj:
    14-44 (LLEN per queue + global total, emitted per trigger)."""
    return (
        log_stream.filter(F.col("status") == "enqueued")
        .groupBy("queue")
        .agg(F.count("*").alias("enqueued_total"))
    )


def enqueue_complete_latency_stream(
    events: DataFrame,
    delay: str = "1 hour",
    horizon_sec: int = 3600,
) -> DataFrame:
    """Stream-stream join: enqueue events ⋈ complete events per job_id
    within a bounded horizon, emitting per-job latency_ms — the
    streaming twin of qj12 (goose's enqueue→execute latency metric,
    src/goose/job.clj:45-61).

    Both sides carry a watermark and the join condition bounds the
    match window (t_enq ≤ t_done ≤ t_enq + horizon), so Spark can
    discard state for jobs older than watermark + horizon — state is
    O(in-flight jobs in the horizon), not history. This is the canonical
    watermarked interval-join shape for request/response correlation.
    """
    # watermarks require TIMESTAMP (not NTZ) event-time columns
    enq = (
        events.filter(F.col("kind") == "enqueue")
        .select("job_id", "queue", F.col("event_time").cast("timestamp").alias("t_enq"))
        .withWatermark("t_enq", delay)
    )
    done = (
        events.filter(F.col("kind") == "complete")
        .select(
            F.col("job_id").alias("done_job_id"),
            F.col("event_time").cast("timestamp").alias("t_done"),
        )
        .withWatermark("t_done", delay)
    )
    cond = (
        (F.col("job_id") == F.col("done_job_id"))
        & (F.col("t_done") >= F.col("t_enq"))
        & (F.col("t_done") <= F.col("t_enq") + F.expr(f"INTERVAL {horizon_sec} SECOND"))
    )
    ms = F.unix_millis(F.col("t_done").cast("timestamp")) - F.unix_millis(
        F.col("t_enq").cast("timestamp")
    )
    return enq.join(done, cond).select("queue", "job_id", ms.alias("latency_ms"))
