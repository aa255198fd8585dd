"""Console data-layer pages: route-shaped assemblies, filter dispatch,
param validation — patterned on the reference console tests
(test/goose/brokers/redis/console/page_test.clj / data_test.clj)."""

from __future__ import annotations

import pytest

from goose_spark.api import LedgerAPI
from goose_spark.client import JobClient
from goose_spark.console import Console
from goose_spark.streaming.worker import Worker


@pytest.fixture()
def setup(spark, tmp_path):
    root = str(tmp_path / "ledger")
    client = JobClient(root)
    for i in range(25):
        client.perform_async("noop", i)
    client.perform_async("always-fail", max_retries=0)
    client.perform_in_sec(3600, "noop")
    client.perform_every("nightly", "30 2 * * *", "noop")
    b = client.perform_batch("noop", [(i,) for i in range(4)], queue="bq")
    console = Console(LedgerAPI(spark, root))
    return client, console, b, root


def test_home_dashboard(spark, setup):
    _, console, _, _ = setup
    home = console.page_home()
    assert home["enqueued"] == 30  # 25 + fail-job + 4 batch members
    assert home["scheduled"] == 1
    assert home["cron"] == 1


def test_enqueued_pagination_and_total(spark, setup):
    _, console, _, _ = setup
    p1 = console.page_enqueued("default", page=1)
    p2 = console.page_enqueued("default", page=2)
    assert p1["total"] == 26 and len(p1["jobs"]) == 10
    assert len(p2["jobs"]) == 10
    assert {j["id"] for j in p1["jobs"]}.isdisjoint({j["id"] for j in p2["jobs"]})


def test_filter_dispatch(spark, setup):
    client, console, _, _ = setup
    by_fn = console.page_enqueued("default", filter_type="execute-fn",
                                  filter_value="always-fail")
    assert by_fn["total"] == 1 and by_fn["jobs"][0]["execute_fn"] == "always-fail"
    # filtered results are bounded by limit (scan-seq + take parity)
    unex = console.page_enqueued("default", filter_type="type", filter_value="unexecuted")
    assert unex["total"] == 10
    unex_all = console.page_enqueued("default", filter_type="type",
                                     filter_value="unexecuted", limit=100)
    assert unex_all["total"] == 26
    with pytest.raises(ValueError):
        console.page_enqueued("default", filter_type="nope", filter_value="x")
    with pytest.raises(ValueError):
        console.page_enqueued("default", filter_type="type", filter_value="bogus")


def test_param_validation_defaults(spark, setup):
    _, console, _, _ = setup
    assert console.page_enqueued("default", page="garbage")["page"] == 1
    assert console.page_enqueued("default", page=-5)["page"] == 1


def test_dead_and_batch_pages(spark, setup):
    client, console, b, root = setup
    Worker(spark, root, retry_delay_fn=lambda n: 0).process_available()
    dead = console.page_dead()
    assert dead["total"] == 1 and dead["jobs"][0]["execute_fn"] == "always-fail"
    batch = console.page_batch(b["id"])
    assert batch["status"] == "success" and batch["counts"]["success"] == 4
    assert console.page_batch("nonexistent") is None
    assert console.page_scheduled()["total"] == 1
