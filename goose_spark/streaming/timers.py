"""Per-job due-timers — the stateful-timeout formulation of the
scheduler (W5 retry timers / W7 due-scan).

The reference polls a sorted set every tick
(``src/goose/brokers/redis/scheduler.clj:22-48``); the Worker's
scheduled-store sweep mirrors that shape. This module is the
streaming-native alternative: each scheduled/retrying row arms a
per-key processing-time timeout at its ``run_at``; when the timeout
fires, the job is emitted as due (front-priority, the RPUSH-front
parity). No polling loop owns the clock — the state store does.

Notes:
* Spark evaluates timeouts whenever a micro-batch runs; with the
  default ``noDataMicroBatches`` behavior, stateful queries run empty
  batches so timers fire without new input.
* A newer row for the same job (e.g. the job got prioritised or
  deleted) re-arms or cancels: state keeps only the max-seq row, and a
  non-runnable latest status drops the timer.
"""

from __future__ import annotations

import math
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from goose_spark.schema import PRIORITY_FRONT, STATUS_ENQUEUED

# state: the fields needed to re-emit the job when due
STATE_SCHEMA = (
    "queue string, execute_fn string, args string, run_at_ms long, "
    "seq long, retry_count long, max_retries long, cron_name string, "
    "batch_id string, enqueued_at_ms long"
)
OUTPUT_SCHEMA = (
    "id string, queue string, execute_fn string, args string, "
    "status string, priority int, enqueued_at timestamp, "
    "cron_name string, batch_id string, retry_count long, max_retries long"
)


def _now_ms() -> int:
    return int(datetime.now(timezone.utc).timestamp() * 1000)


def _ms(ts) -> int | None:
    if ts is None or (isinstance(ts, float) and math.isnan(ts)) or pd.isna(ts):
        return None
    return int(pd.Timestamp(ts).value // 1_000_000)


def _due_one(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # timer fired → emit the parked job as due, front priority
        (queue, fn, args, run_at_ms, seq, rc, mr, cron, batch, enq_ms) = state.get
        state.remove()
        yield pd.DataFrame(
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
        return

    latest = None
    for pdf in pdfs:
        for row in pdf.sort_values("seq").itertuples():
            if latest is None or row.seq > latest.seq:
                latest = row
    if latest is None:
        return
    if latest.status not in ("scheduled", "retrying") or _ms(latest.run_at) is None:
        # job moved on (executed / prioritised / deleted) → cancel timer
        if state.exists:
            state.remove()
        return
    run_at_ms = _ms(latest.run_at)
    state.update(
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
    state.setTimeoutDuration(max(1, run_at_ms - _now_ms()))
    return
    yield  # pragma: no cover — make this a generator on all paths


def due_jobs(job_stream: DataFrame) -> DataFrame:
    """scheduled/retrying ledger rows → due-job emissions at run_at.

    Feed the emissions back to the ledger (front-priority enqueued rows)
    or straight into the execution path::

        due = due_jobs(ledger.log_stream(spark))
        due.writeStream.foreachBatch(lambda df, _: ledger.append_rows(
            [r.asDict() for r in df.collect()]))...
    """
    return job_stream.groupBy("id").applyInPandasWithState(
        _due_one,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
