"""SQL session surface: register every engine table as a temp view so
the whole query layer is drivable from ``spark.sql`` — the analog of the
reference's console/data layer being "just queries over the broker's
collections" (src/goose/brokers/redis/console/data.clj), except the
language is ANSI SQL instead of bespoke cursor scans.

    from goose_spark.sql import register_views
    register_views(spark, "/root/testdata/sf0.01", ledger_root=root)
    spark.sql("SELECT status, COUNT(*) FROM jobs GROUP BY status")

Views registered:
  - the testdata star schema (region … embeddings), through the same
    dtype-normalizing loader the query registry uses;
  - ``jobs`` — the ledger's latest-seq state view (tombstone-filtered,
    the same DataFrame `LedgerAPI` queries run on), when a ledger root
    is given.

The testdata views re-plan per query. The ``jobs`` view is a SNAPSHOT:
Spark resolves the parquet file listing when the view is registered, so
commits that land after registration are invisible until
``refresh_jobs_view`` re-registers it (same contract as the reference's
console pages, which re-scan on every page load — data.clj re-issues
the SCAN; here the re-scan is the re-registration).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from goose_spark.queries.base import t
from goose_spark.session import TESTDATA_TABLES


def register_views(
    spark: SparkSession,
    sf_dir: str | None = None,
    ledger_root: str | None = None,
) -> list[str]:
    """Register temp views; returns the list of view names created."""
    created: list[str] = []
    if sf_dir is not None:
        for name in TESTDATA_TABLES:
            t(spark, sf_dir, name).createOrReplaceTempView(name)
            created.append(name)
    if ledger_root is not None:
        refresh_jobs_view(spark, ledger_root)
        created.append("jobs")
    return created


def refresh_jobs_view(spark: SparkSession, ledger_root: str) -> None:
    """(Re-)register ``jobs`` against the ledger's CURRENT state — call
    after worker passes / API mutations to see their commits."""
    from goose_spark.streaming.ledger import Ledger

    Ledger(ledger_root).state(spark).createOrReplaceTempView("jobs")
