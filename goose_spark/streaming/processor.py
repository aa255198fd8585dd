"""Due-timers on the Spark 4 ``transformWithState`` processor API — the
modern twin of streaming/timers.py (applyInPandasWithState).

Same semantics, new engine surface: per-job keyed state holds the parked
row, ``registerTimer(run_at_ms)`` replaces ``setTimeoutDuration``, and
expiry emits the job as a front-priority enqueued row exactly once. The
processor API additionally gives named state slots with optional TTL and
explicit timer listing/deletion — the pieces the old GroupState API
emulated implicitly. Reference shape: the scheduler poll
(src/goose/brokers/redis/scheduler.clj:22-48), inverted — the state
store owns the clock, no polling loop.

ENVIRONMENTAL GATE: transformWithState's Python runner speaks protobuf
to the state server (pyspark/sql/streaming/proto/StateMessage_pb2), and
``google.protobuf`` is not installed in this container — the query
crashes at runner init with ImportError. ``due_jobs_v2`` raises
NotImplementedError up front when protobuf is absent (same honest-gate
pattern as the Kafka connector in sources/io.py); the processor class
itself is complete and test_timers.py::test_processor_api_fires_and_cancels
runs it for real wherever protobuf exists.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from goose_spark.schema import PRIORITY_FRONT, STATUS_ENQUEUED
from goose_spark.streaming.timers import OUTPUT_SCHEMA, STATE_SCHEMA, _ms


class DueTimerProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.parked = handle.getValueState("parked", STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        latest = None
        for pdf in rows:
            for row in pdf.sort_values("seq").itertuples():
                if latest is None or row.seq > latest.seq:
                    latest = row
        if latest is None:
            return iter(())
        if latest.status not in ("scheduled", "retrying") or _ms(latest.run_at) is None:
            # job moved on (executed / prioritised / deleted): cancel
            if self.parked.exists():
                self.parked.clear()
                for t in self.handle.listTimers():
                    self.handle.deleteTimer(t)
            return iter(())
        run_at_ms = _ms(latest.run_at)
        self.parked.update(
            (
                latest.queue,
                latest.execute_fn,
                latest.args,
                run_at_ms,
                int(latest.seq),
                None if pd.isna(latest.retry_count) else int(latest.retry_count),
                int(latest.max_retries),
                None if pd.isna(latest.cron_name) else latest.cron_name,
                None if pd.isna(latest.batch_id) else latest.batch_id,
                _ms(latest.enqueued_at),
            )
        )
        # re-arming: drop any earlier timer, then arm at run_at (clamped
        # forward so an already-due job still fires on the next eval)
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        now_ms = timerValues.getCurrentProcessingTimeInMs()
        self.handle.registerTimer(max(run_at_ms, now_ms + 1))
        return iter(())

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self.parked.exists():
            return iter(())
        (queue, fn, args, run_at_ms, seq, rc, mr, cron, batch, enq_ms) = self.parked.get()
        self.parked.clear()
        return iter(
            [
                pd.DataFrame(
                    {
                        "id": [key[0]],
                        "queue": [queue],
                        "execute_fn": [fn],
                        "args": [args],
                        "status": [STATUS_ENQUEUED],
                        "priority": [PRIORITY_FRONT],
                        "enqueued_at": [pd.Timestamp(enq_ms, unit="ms")],
                        "cron_name": [cron],
                        "batch_id": [batch],
                        "retry_count": [rc],
                        "max_retries": [mr],
                    }
                )
            ]
        )

    def close(self) -> None:
        pass


def due_jobs_v2(job_stream: DataFrame) -> DataFrame:
    """scheduled/retrying ledger rows → due-job emissions at run_at,
    via the transformWithState processor API."""
    try:
        import google.protobuf  # noqa: F401 — required by the TWS runner
    except ImportError as exc:  # pragma: no cover — absent in this env
        raise NotImplementedError(
            "transformWithState requires google.protobuf (the processor "
            "API's state-server wire format), which is not installed in "
            "this environment; use streaming.timers.due_jobs "
            "(applyInPandasWithState) — identical semantics"
        ) from exc
    return job_stream.groupBy("id").transformWithStateInPandas(
        statefulProcessor=DueTimerProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="ProcessingTime",
    )
