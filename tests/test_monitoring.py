"""Streaming monitoring rollup: incremental counts == full recompute,
effect-once crash-replay (exact counts must not double), and the
maintained-table anomaly scan == the batch q83 query."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from goose_spark.operators.monitoring import (
    anomalies_from_hourly,
    attach_counts_stream,
    counts_upsert,
    hourly_counts,
)
from goose_spark.queries import load_all
from goose_spark.queries.base import t
from tests.conftest import SF_CORRECT

REG = load_all()


def _counts(spark, table_dir):
    return sorted(
        (r["event_type"], r["hour_idx"], r["n"])
        for r in spark.read.parquet(table_dir).collect()
    )


def test_incremental_upsert_matches_full_recompute(spark, tmp_path):
    e = t(spark, SF_CORRECT, "events")
    table = str(tmp_path / "counts")
    # split on event_id parity: both halves touch the SAME hours, so
    # the merge path (not just append) is exercised
    counts_upsert(spark, e.filter(F.col("event_id") % 2 == 0), table)
    counts_upsert(spark, e.filter(F.col("event_id") % 2 == 1), table)
    want = sorted(
        (r["event_type"], r["hour_idx"], r["n"])
        for r in hourly_counts(e).collect()
    )
    assert _counts(spark, table) == want


def test_crash_replay_does_not_double_counts(spark, tmp_path):
    e = t(spark, SF_CORRECT, "events").limit(500)
    src = str(tmp_path / "src")
    e.coalesce(1).write.mode("overwrite").parquet(src)
    table = str(tmp_path / "counts")
    ck = str(tmp_path / "ck")
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    attach_counts_stream(stream, table, ck).awaitTermination()
    first = _counts(spark, table)
    assert sum(n for _, _, n in first) == 500

    # crash between merge and checkpoint commit: drop the commit
    # marker, restart — the batch replays, the effect marker suppresses
    shutil.rmtree(os.path.join(ck, "commits"))
    stream = spark.readStream.schema(schema).parquet(src)
    attach_counts_stream(stream, table, ck).awaitTermination()
    assert _counts(spark, table) == first  # counts did NOT double

    # a genuinely new batch still merges
    spark.read.parquet(src).limit(10).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    attach_counts_stream(stream, table, ck).awaitTermination()
    assert sum(n for _, _, n in _counts(spark, table)) == 510


def test_table_scan_matches_batch_q83(spark, tmp_path):
    e = t(spark, SF_CORRECT, "events")
    table = str(tmp_path / "counts")
    counts_upsert(spark, e, table)
    got = sorted(
        map(tuple, anomalies_from_hourly(
            spark.read.parquet(table).drop("day_idx")
        ).collect())
    )
    want = sorted(map(tuple, REG["q83_rate_anomaly"].builder(spark, SF_CORRECT).collect()))
    assert got == want and len(got) > 0
