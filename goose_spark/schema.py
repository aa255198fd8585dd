"""Engine schemas: job ledger, batches, cron registry.

The reference stores each job as one nippy-serialized blob in Redis
(``src/goose/utils.clj:13-28``); the engine gives the job map a fixed
columnar StructType (SURVEY §1.4) so the observability queries become
plain column scans with pushdown instead of client-side predicate loops
over SCAN cursors (``src/goose/brokers/redis/commands.clj:24-47``).

Field provenance (reference file:line):
  id/queue/execute_fn/args/enqueued_at  src/goose/job.clj:6-16
  run_at                                src/goose/brokers/redis/scheduler.clj:12-20,
                                        src/goose/brokers/redis/retry.clj:16-18
  retry_count/max_retries/error/        src/goose/retry.clj:61-66,79-91
    first_failed_at/last_retried_at/died_at
  batch_id                              src/goose/batch.clj:59
  cron_name                             src/goose/brokers/redis/cron.clj:83-87
  priority (front-vs-back enqueue)      src/goose/brokers/redis/commands.clj:128-132,
                                        src/goose/defaults.clj:76-77
"""

from __future__ import annotations

from pyspark.sql import types as T

# Job lifecycle states. The reference encodes these as *which Redis
# collection holds the job* (ready list / scheduled zset / dead zset /
# in-progress list); the ledger makes the state an explicit column.
STATUS_ENQUEUED = "enqueued"
STATUS_IN_PROGRESS = "in_progress"
STATUS_SCHEDULED = "scheduled"
STATUS_RETRYING = "retrying"
STATUS_SUCCESS = "success"
STATUS_DEAD = "dead"

ALL_STATUSES = (
    STATUS_ENQUEUED,
    STATUS_IN_PROGRESS,
    STATUS_SCHEDULED,
    STATUS_RETRYING,
    STATUS_SUCCESS,
    STATUS_DEAD,
)

# Default max-retries parity: src/goose/retry.clj:61.
DEFAULT_MAX_RETRIES = 27

# Priority semantics parity: 0 = back of queue (LPUSH), 1 = front (RPUSH)
# — src/goose/defaults.clj:76-77.
PRIORITY_BACK = 0
PRIORITY_FRONT = 1

JOB_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("queue", T.StringType(), False),
        T.StructField("execute_fn", T.StringType(), False),
        T.StructField("args", T.StringType(), True),  # JSON-encoded array
        T.StructField("status", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("enqueued_at", T.TimestampType(), False),
        T.StructField("run_at", T.TimestampType(), True),
        T.StructField("cron_name", T.StringType(), True),
        T.StructField("batch_id", T.StringType(), True),
        T.StructField("retry_count", T.IntegerType(), True),
        T.StructField("max_retries", T.IntegerType(), False),
        T.StructField("retry_queue", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("first_failed_at", T.TimestampType(), True),
        T.StructField("last_retried_at", T.TimestampType(), True),
        T.StructField("died_at", T.TimestampType(), True),
        T.StructField("worker_id", T.StringType(), True),
    ]
)

# Batch entity parity: src/goose/batch.clj:48-62 (id, callback-fn-sym,
# linger-sec, queue, total, status, created-at).
BATCH_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("callback_fn", T.StringType(), True),
        T.StructField("linger_sec", T.LongType(), True),
        T.StructField("queue", T.StringType(), False),
        T.StructField("total", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)

# Cron registry parity: src/goose/brokers/redis/cron.clj:13-21.
CRON_SCHEMA = T.StructType(
    [
        T.StructField("cron_name", T.StringType(), False),
        T.StructField("cron_schedule", T.StringType(), False),
        T.StructField("timezone", T.StringType(), False),
        T.StructField("execute_fn", T.StringType(), False),
        T.StructField("args", T.StringType(), True),
        T.StructField("queue", T.StringType(), False),
    ]
)

# Batch terminal-status enum: src/goose/batch.clj:31-38.
BATCH_IN_PROGRESS = "in-progress"
BATCH_SUCCESS = "success"
BATCH_DEAD = "dead"
BATCH_PARTIAL_SUCCESS = "partial-success"


def batch_status(enqueued: int, retrying: int, success: int, dead: int) -> str:
    """Pure status derivation — parity with src/goose/batch.clj:40-46.

    ``enqueued`` counts enqueued + in-progress members (the reference's
    enqueued set holds both until the ack removes them).
    """
    if enqueued + retrying > 0:
        return BATCH_IN_PROGRESS
    if dead == 0:
        return BATCH_SUCCESS
    if success == 0:
        return BATCH_DEAD
    return BATCH_PARTIAL_SUCCESS
