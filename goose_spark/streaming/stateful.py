"""Stateful streaming operators — the per-key state machines SURVEY §2
maps goose's Redis-transaction semantics onto.

``track_batches`` re-expresses the batch state machine (B2–B4) as a
keyed stateful streaming operator: goose guarantees exactly-one
completion callback by doing the SMOVE and the 4×SCARD read inside one
Redis MULTI (``src/goose/brokers/redis/batch.clj:117-134`` +
batch-jobs.md ADR "update & read within 1 transaction"). Spark gives
the identical guarantee structurally: state for one ``batch_id`` is
owned by one task and updated serially, so the counter-update +
terminal-check is race-free without any transaction.

API note: implemented on ``applyInPandasWithState`` (Spark 3.x/4.x
arbitrary state). The newer ``transformWithStateInPandas`` path needs
the protobuf state-server protocol, and this environment's protobuf
install is broken — the semantics are identical at this operator's
level of use (single ValueState per key, update mode).

State is per-batch *counters* (4 longs + a callback-emitted flag), not
member id-sets — at 100 TB / billions of jobs the status math only needs
cardinalities (SURVEY §7.4.6); id-level audit stays in the ledger.

The ``Worker`` keeps its driver-side counter recompute (simpler, exact
over the state view); this operator is the streaming-native formulation
exercised by its own scenario tests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from goose_spark.schema import batch_status

OUTPUT_SCHEMA = (
    "batch_id string, status string, enq long, retrying long, "
    "success long, dead long, is_terminal_transition long"
)
STATE_SCHEMA = "enq long, retrying long, success long, dead long, emitted long"

# status → counter bucket (goose's 4 member sets, batch.clj:14-19)
_BUCKET = {
    "enqueued": "enq",
    "in_progress": "enq",
    "scheduled": "enq",
    "retrying": "retrying",
    "success": "success",
    "dead": "dead",
}


def _row_delta(status: str, retry_count) -> tuple[str | None, str | None]:
    """(source_bucket, dest_bucket) for one transition row — the SMOVE
    source derivation of batch.clj:101-115: a row is self-contained
    because the job's retry state identifies the set it came from.
    ``None`` source = brand-new member; retrying→retrying nets zero."""
    rc = 0 if retry_count is None or pd.isna(retry_count) else int(retry_count)
    if status in ("enqueued", "scheduled"):
        return None, "enq"
    if status == "in_progress":
        return None, None  # stays in the enqueued bucket
    if status == "retrying":
        return ("enq", "retrying") if rc <= 1 else (None, None)
    if status in ("success", "dead"):
        return ("retrying" if rc >= 1 else "enq"), _BUCKET[status]
    return None, None  # deleted/tombstone rows don't move buckets


def _track_one(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    counters = {"enq": 0, "retrying": 0, "success": 0, "dead": 0}
    emitted = 0
    if state.exists:
        counters["enq"], counters["retrying"], counters["success"], counters["dead"], emitted = state.get

    # each transition row is an independent counter delta, so rows may
    # arrive across any trigger boundary in any grouping
    chunks = list(pdfs)
    rows = pd.concat(chunks) if chunks else pd.DataFrame()
    if len(rows):
        for status, rc in zip(
            rows.sort_values("seq")["status"], rows.sort_values("seq")["retry_count"]
        ):
            src, dst = _row_delta(status, rc)
            if src:
                counters[src] -= 1
            if dst:
                counters[dst] += 1

    derived = batch_status(
        counters["enq"], counters["retrying"], counters["success"], counters["dead"]
    )
    terminal = int(derived != "in-progress" and not emitted)
    if terminal:
        emitted = 1
    state.update(
        (counters["enq"], counters["retrying"], counters["success"], counters["dead"], emitted)
    )
    yield pd.DataFrame(
        {
            "batch_id": [key[0]],
            "status": [derived],
            "enq": [counters["enq"]],
            "retrying": [counters["retrying"]],
            "success": [counters["success"]],
            "dead": [counters["dead"]],
            "is_terminal_transition": [terminal],
        }
    )


def track_batches(job_stream: DataFrame) -> DataFrame:
    """Ledger rows (batch members only) → per-trigger batch status rows;
    ``is_terminal_transition=1`` exactly once per batch.

    Usage::

        out = track_batches(ledger.log_stream(spark)
                            .filter("batch_id IS NOT NULL"))
        out.writeStream.foreachBatch(enqueue_callbacks)...
    """
    return job_stream.groupBy("batch_id").applyInPandasWithState(
        _track_one,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
