"""spark.sql surface over the registered views (goose_spark/sql.py):
the console queries and testdata analytics runnable as plain ANSI SQL."""

from __future__ import annotations

from goose_spark.sql import refresh_jobs_view, register_views
from tests.conftest import SF_CORRECT


def test_testdata_views_queryable(spark):
    created = register_views(spark, SF_CORRECT)
    assert "lineitem" in created and "documents" in created
    row = spark.sql(
        """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
           GROUP BY l_returnflag ORDER BY l_returnflag LIMIT 1"""
    ).collect()[0]
    assert row["n"] > 0
    # events view goes through the dtype-normalizing loader
    assert dict(spark.table("events").dtypes)["ts"] == "timestamp"


def test_jobs_view_tracks_live_ledger(spark, tmp_path):
    from goose_spark.client import JobClient
    from goose_spark.streaming.worker import Worker

    root = str(tmp_path / "ledger")
    client = JobClient(root)
    for i in range(5):
        client.perform_async("noop", i)
    register_views(spark, ledger_root=root)
    assert spark.sql("SELECT COUNT(*) n FROM jobs").collect()[0]["n"] == 5

    # the jobs view is a snapshot (file listing resolved at register
    # time); a worker pass becomes visible after refresh — the console's
    # re-scan-per-page-load contract
    Worker(spark, root).process_available()
    refresh_jobs_view(spark, root)
    by_status = {
        r["status"]: r["n"]
        for r in spark.sql(
            "SELECT status, COUNT(*) n FROM jobs GROUP BY status"
        ).collect()
    }
    assert by_status.get("success") == 5
