"""Quickstart: the full engine surface in one script.

Run:  python examples/quickstart.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from datetime import datetime, timedelta, timezone

from goose_spark.api import LedgerAPI
from goose_spark.client import JobClient
from goose_spark.console import Console
from goose_spark.session import get_spark
from goose_spark.streaming.metrics import MetricsSink
from goose_spark.streaming.worker import Worker


# 1. define job functions. Module-qualified names resolve on executors
# via import (goose's require-resolve); @job_fn registry keys work for
# functions defined inside the goose_spark package.
def greet(name):
    return f"hello {name}"


GREET = "examples.quickstart:greet"


def main() -> None:
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")
    ledger_dir = tempfile.mkdtemp(prefix="gosling-")

    # 2. produce — Spark-free client, like a goose client process
    client = JobClient(ledger_dir, queue="default")
    for i in range(20):
        client.perform_async(GREET, f"user-{i}")
    client.perform_in_sec(3600, GREET, "later")               # scheduled
    client.perform_every("hourly", "0 * * * *", GREET, "cron")
    batch = client.perform_batch(GREET, [(f"b{i}",) for i in range(5)],
                                 callback_fn="noop")
    client.perform_async("always-fail", max_retries=1)          # will retry→die

    # 3. consume — one streaming worker pass (checkpointed, availableNow);
    #    error/death handlers are registry fn-syms fired executor-side
    sink = MetricsSink()
    cursor = client.ledger.mark()  # time-travel cursor: pre-execution
    worker = Worker(spark, ledger_dir, metrics=sink, emit_in_progress=True,
                    error_handler="record-error-handler",
                    death_handler="record-death-handler")
    worker.process_available()
    worker.process_available()  # runs the batch callback

    # 4. observe — API + console over the ledger
    api = LedgerAPI(spark, ledger_dir)
    console = Console(api)
    print("dashboard:", json.dumps(api.dashboard_counts(), sort_keys=True))
    print("home page:", json.dumps(console.page_home(), sort_keys=True, default=str))
    print("batch page:", json.dumps(console.page_batch(batch["id"]), sort_keys=True))
    print("workers:", [w["worker_id"] for w in api.workers()])
    print("metrics:", json.dumps(sink.counters, sort_keys=True))

    # 4b. HTML console — same pages rendered for a browser; mount with
    #     console_html.serve(console, port=8080).serve_forever()
    from goose_spark.console_html import ConsoleHtml

    html = ConsoleHtml(console)
    print("html home bytes:", len(html.home()))

    # 4c. time travel — the queue as it looked before the worker ran
    #     (Delta VERSION AS OF analog; compaction advances the horizon)
    then = api.state_as_of(seq=cursor).groupBy("status").count().collect()
    print("state as-of pre-execution:", sorted((r["status"], r["count"]) for r in then))

    # 5. manage — replay the (eventually) dead job, retention, compaction
    now = datetime.now(timezone.utc).replace(tzinfo=None)
    print("dead peek:", [d["execute_fn"] for d in api.peek_dead(5)])
    print("compaction:", worker.ledger.compact(spark))

    # 6. analytics — any declared query over the driver testdata
    from goose_spark.queries import load_all

    q = load_all()["q06_multiway_join_agg"]
    q.builder(spark, "/root/testdata/sf0.001").show()

    spark.stop()


if __name__ == "__main__":
    main()
