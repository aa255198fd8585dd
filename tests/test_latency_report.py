"""Latency report API: class dispatch precedence mirrors job.clj:45-55."""

from __future__ import annotations

from datetime import timedelta

from goose_spark.api import LedgerAPI
from goose_spark.client import JobClient
from tests.test_streaming_worker import utcnow


def test_latency_classes_and_positive_lag(spark, tmp_path):
    root = str(tmp_path / "ledger")
    client = JobClient(root)
    client.perform_async("noop")                                   # execution class
    client.perform_at(utcnow() - timedelta(seconds=5), "noop")     # past-due → execution
    client.perform_in_sec(3600, "noop")                            # schedule class
    api = LedgerAPI(spark, root)
    rows = api.latency_report().collect()
    classes = sorted(r["latency_class"] for r in rows)
    assert classes == ["execution", "execution", "schedule"]
    for r in rows:
        if r["latency_class"] == "execution":
            assert r["latency_sec"] >= 0  # lag vs enqueued_at
