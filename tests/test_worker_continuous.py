"""Continuous-mode worker: live processingTime stream + timer thread,
graceful shutdown (W11) — jobs enqueued while running get executed
without explicit passes."""

from __future__ import annotations

import time

from goose_spark.api import LedgerAPI
from goose_spark.client import JobClient
from goose_spark.streaming.worker import Worker


def test_continuous_worker_processes_live_enqueues(spark, tmp_path):
    root = str(tmp_path / "ledger")
    client = JobClient(root)
    client.perform_async("noop", 0)

    worker = Worker(spark, root, retry_delay_fn=lambda n: 0)
    handle = worker.start(trigger_sec=0.5)
    try:
        deadline = time.time() + 90  # generous: suite runs under load
        api = LedgerAPI(spark, root)
        # enqueue WHILE the stream is live
        for i in range(1, 5):
            client.perform_async("noop", i)
        while time.time() < deadline:
            counts = api.dashboard_counts()
            if counts.get("success") == 5:
                break
            time.sleep(0.5)
        assert api.dashboard_counts().get("success") == 5
    finally:
        handle.stop()
    # graceful shutdown: stream stopped, no stuck in-flight state
    assert not handle.streaming_query.isActive
