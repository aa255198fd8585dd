"""W4 middleware chain: user middlewares compose around job execution
in goose's order (first listed = outermost), on the executors."""

from __future__ import annotations

import os

from goose_spark.client import JobClient
from goose_spark.streaming.worker import Worker


def test_middleware_composition_order(spark, tmp_path):
    root = str(tmp_path / "ledger")
    trace = str(tmp_path / "trace")
    os.makedirs(trace)

    def tracer(tag):
        def mw(next_fn):
            def wrapped(job):
                path = os.path.join(trace, job["id"])
                with open(path, "a") as f:
                    f.write(f"{tag}-before\n")
                result = next_fn(job)
                with open(path, "a") as f:
                    f.write(f"{tag}-after\n")
                return result

            return mw_name_keeper(wrapped)

        return mw

    def mw_name_keeper(fn):
        return fn

    client = JobClient(root)
    res = client.perform_async("noop", 1)
    worker = Worker(spark, root, retry_delay_fn=lambda n: 0,
                    middlewares=(tracer("outer"), tracer("inner")))
    worker.process_available()

    lines = open(os.path.join(trace, res["id"])).read().splitlines()
    assert lines == ["outer-before", "inner-before", "inner-after", "outer-after"]


def test_middleware_sees_job_fields(spark, tmp_path):
    root = str(tmp_path / "ledger")
    seen = str(tmp_path / "seen")
    os.makedirs(seen)

    def capture(next_fn):
        def wrapped(job):
            with open(os.path.join(seen, job["id"]), "w") as f:
                f.write(f"{job['queue']}|{job['execute_fn']}|{job['args']}")
            return next_fn(job)

        return wrapped

    client = JobClient(root, queue="mw-q")
    res = client.perform_async("noop", 42)
    Worker(spark, root, middlewares=(capture,)).process_available()
    content = open(os.path.join(seen, res["id"])).read()
    assert content == "mw-q|noop|[42]"


def test_middleware_exception_triggers_retry_path(spark, tmp_path):
    root = str(tmp_path / "ledger")

    def veto(next_fn):
        def wrapped(job):
            raise PermissionError("vetoed by middleware")

        return wrapped

    client = JobClient(root)
    client.perform_async("noop", max_retries=0)
    w = Worker(spark, root, retry_delay_fn=lambda n: 0, middlewares=(veto,))
    w.process_available()
    from goose_spark.api import LedgerAPI

    api = LedgerAPI(spark, root)
    dead = api.peek_dead(1)
    assert dead and "vetoed by middleware" in dead[0]["error"]
