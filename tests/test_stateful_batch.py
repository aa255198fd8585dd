"""transformWithStateInPandas batch tracker: counters accumulate across
micro-batches; the terminal transition fires exactly once."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from goose_spark.client import JobClient
from goose_spark.streaming.ledger import Ledger
from goose_spark.streaming.stateful import track_batches
from goose_spark.streaming.worker import Worker


@pytest.fixture()
def ledger(tmp_path):
    return Ledger(str(tmp_path / "ledger"))


def _drain(spark, ledger, tmp_path, name):
    stream = ledger.log_stream(spark).filter(F.col("batch_id").isNotNull())
    out = track_batches(stream)
    rows = []

    def collect(batch_df, _epoch):
        rows.extend(batch_df.collect())

    q = (
        out.writeStream.foreachBatch(collect)
        .option("checkpointLocation", str(tmp_path / f"ck-{name}"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return rows


def test_batch_tracker_terminal_once(spark, ledger, tmp_path):
    client = JobClient(ledger)
    res = client.perform_batch("noop", [(i,) for i in range(6)], queue="bq")

    # pass 1: only enqueue rows exist → in-progress
    rows1 = _drain(spark, ledger, tmp_path, "p1")
    assert len(rows1) == 1
    assert rows1[0]["status"] == "in-progress"
    assert rows1[0]["enq"] == 6 and rows1[0]["is_terminal_transition"] == 0

    # execute the jobs (appends success transition rows to the ledger)
    Worker(spark, ledger, retry_delay_fn=lambda n: 0).process_available()

    # pass 2: transitions consumed → terminal success, flagged exactly once
    rows2 = _drain(spark, ledger, tmp_path, "p1")
    assert len(rows2) == 1
    r = rows2[0]
    assert r["batch_id"] == res["id"]
    assert r["status"] == "success"
    assert (r["enq"], r["success"]) == (0, 6)
    assert r["is_terminal_transition"] == 1

    # pass 3: no new rows → no output, and a re-derived terminal would
    # not re-flag (emitted_terminal persisted in state)
    rows3 = _drain(spark, ledger, tmp_path, "p1")
    assert rows3 == []


def test_batch_tracker_partial_success(spark, ledger, tmp_path):
    client = JobClient(ledger)
    client.perform_batch("flaky", [("s1", 0), ("s2", 99)], queue="bq", max_retries=0)
    Worker(spark, ledger, retry_delay_fn=lambda n: 0).process_available()
    rows = _drain(spark, ledger, tmp_path, "p2")
    assert len(rows) == 1
    r = rows[0]
    assert r["status"] == "partial-success"
    assert (r["success"], r["dead"]) == (1, 1)
    assert r["is_terminal_transition"] == 1
