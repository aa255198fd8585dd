"""Drive the streaming layer with the job_events fixture (FIXTURES.md
§2.4): the 1k burst with its 1% failure cohort, the out-of-order cohort,
and the 20-job batch cohort."""

from __future__ import annotations

from pyspark.sql import functions as F

from goose_spark.queries.base import fixture
from goose_spark.streaming import events as ev


def test_fixture_shape(spark):
    je = fixture(spark, "job_events")
    kinds = {r["kind"]: r["n"] for r in je.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert kinds["enqueue"] == 1000 + 50 + 20  # burst + late cohort + batch
    assert kinds.get("fail", 0) >= 1  # ~1% of 1000 + batch fail slots
    assert kinds["complete"] + kinds.get("fail", 0) == 1000 + 20


def test_stream_tumbling_over_job_events(spark, tmp_path):
    # parquet ms-timestamps surface as TIMESTAMP_NTZ; watermarks need
    # TIMESTAMP (session-tz) — cast once at the ingest edge
    je = fixture(spark, "job_events").withColumn(
        "event_time", F.col("event_time").cast("timestamp")
    )
    path = str(tmp_path / "je")
    je.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(je.schema).parquet(path)

    agg = (
        ev.with_watermark(stream, "event_time", "5 minutes")
        .groupBy(F.window("event_time", "1 minute").alias("w"), "kind")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "kind", "n")
    )
    q = (
        agg.writeStream.format("memory").queryName("je_tumbling")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    stream_rows = spark.sql("SELECT * FROM je_tumbling")
    batch_rows = (
        je.groupBy(F.window("event_time", "1 minute").alias("w"), "kind")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "kind", "n")
    )
    assert sorted(map(tuple, stream_rows.collect())) == sorted(map(tuple, batch_rows.collect()))


def test_batch_cohort_payload_consistency(spark):
    je = fixture(spark, "job_events")
    cohort = je.filter(F.col("queue") == "batch-q")
    batch_ids = [r["payload"] for r in cohort.select("payload").distinct().collect()]
    assert len(batch_ids) == 1  # one batch id tags the whole cohort
    per_kind = {r["kind"]: r["n"] for r in cohort.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert per_kind["enqueue"] == 20
    assert per_kind["complete"] + per_kind["fail"] == 20
