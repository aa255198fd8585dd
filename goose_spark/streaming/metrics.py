"""Metrics emission — goose's StatsD layer re-expressed on Spark.

Reference surface (``src/goose/metrics.clj:35-42,59-86``): counters
(jobs processed/success/failure/recovered), timings (execution latency,
per-fn latency, schedule/retry/cron latency classes), gauges (queue
depths, total enqueued/scheduled/dead sizes —
``src/goose/brokers/redis/metrics.clj:14-44``).

Engine mapping:
* per-micro-batch counters/timings → a ``MetricsSink`` fed from the
  worker's foreachBatch (same position in the execution path as goose's
  middleware wrap, ``src/goose/brokers/redis/worker.clj:46-55``)
* queue-depth gauges → ``events.job_queue_depth_stream`` aggregation
* engine-level progress (rows/sec, batch duration, watermark lag) →
  ``StreamingQueryListener`` (Spark emits these natively per trigger)

The sink here is an in-memory/stdout recorder; swap ``emit`` for a
StatsD/Prometheus client in production — the measurement points are the
part that mirrors the reference.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class MetricsSink:
    """Counter/timing/gauge recorder with goose's metric names
    (src/goose/metrics.clj:9-33)."""

    counters: dict = field(default_factory=dict)
    timings: dict = field(default_factory=dict)
    gauges: dict = field(default_factory=dict)

    def increment(self, key: str, n: int = 1, tags: dict | None = None) -> None:
        k = self._k(key, tags)
        self.counters[k] = self.counters.get(k, 0) + n

    def timing(self, key: str, ms: float, tags: dict | None = None) -> None:
        self.timings.setdefault(self._k(key, tags), []).append(ms)

    def gauge(self, key: str, value: float, tags: dict | None = None) -> None:
        self.gauges[self._k(key, tags)] = value

    @staticmethod
    def _k(key: str, tags: dict | None) -> str:
        if not tags:
            return key
        return key + "," + ",".join(f"{k}={v}" for k, v in sorted(tags.items()))

    # goose metric names — parity with src/goose/metrics.clj:9-33
    JOBS_PROCESSED = "jobs.processed"
    JOBS_SUCCESS = "jobs.success"
    JOBS_FAILURE = "jobs.failure"
    JOBS_RECOVERED = "jobs.recovered"
    EXECUTION_TIME = "job.execution_time"
    TOTAL_ENQUEUED_SIZE = "total_enqueued.size"
    QUEUE_SIZE = "enqueued.size"
    SCHEDULED_SIZE = "scheduled.size"
    DEAD_SIZE = "dead.size"

    def record_outcomes(self, statuses: list[str], wall_ms: float) -> None:
        """Feed from a micro-batch's outcome rows — the same counts the
        metrics middleware emits per job (metrics.clj:59-86)."""
        n = len(statuses)
        if not n:
            return
        self.increment(self.JOBS_PROCESSED, n)
        self.increment(self.JOBS_SUCCESS, sum(1 for s in statuses if s == "success"))
        self.increment(self.JOBS_FAILURE, sum(1 for s in statuses if s in ("retrying", "dead")))
        self.timing(self.EXECUTION_TIME, wall_ms / n)


class ProgressListener(StreamingQueryListener):
    """Streams Spark's native per-trigger progress (rows/sec, duration,
    state size) into a list — the engine-side replacement for goose's
    worker heartbeat visibility (W9)."""

    def __init__(self):
        self.progress: list[dict] = []

    def onQueryStarted(self, event):  # noqa: N802 (Spark API casing)
        pass

    def onQueryProgress(self, event):  # noqa: N802
        self.progress.append(json.loads(event.progress.json))

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass
