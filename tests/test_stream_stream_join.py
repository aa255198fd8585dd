"""Watermarked stream-stream join scenario: enqueue⋈complete latency
over the job_events fixture replayed as a file-source stream, checked
against the equivalent batch join (the qj12 oracle shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from goose_spark.queries.base import FIXTURES_DIR
from goose_spark.streaming.events import enqueue_complete_latency_stream


def _events_schema(spark):
    return spark.read.parquet(f"{FIXTURES_DIR}/job_events.parquet").schema


def test_stream_stream_latency_matches_batch(spark, tmp_path):
    import shutil

    src = tmp_path / "stream-src"
    src.mkdir()
    shutil.copy(f"{FIXTURES_DIR}/job_events.parquet", src / "part-0.parquet")
    schema = _events_schema(spark)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    lat = enqueue_complete_latency_stream(stream, delay="0 seconds", horizon_sec=86400 * 365)
    q = (
        lat.writeStream.format("memory")
        .queryName("ss_latency")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["job_id"], r["latency_ms"])
        for r in spark.sql("SELECT job_id, latency_ms FROM ss_latency").collect()
    }

    # batch reference: same interval join, plain DataFrames
    ev = spark.read.parquet(f"{FIXTURES_DIR}/job_events.parquet")
    enq = ev.filter(F.col("kind") == "enqueue").select(
        "job_id", F.col("event_time").alias("t_enq")
    )
    done = ev.filter(F.col("kind") == "complete").select(
        F.col("job_id").alias("j2"), F.col("event_time").alias("t_done")
    )
    ms = F.unix_millis(F.col("t_done").cast("timestamp")) - F.unix_millis(
        F.col("t_enq").cast("timestamp")
    )
    want = {
        (r["job_id"], r["latency_ms"])
        for r in enq.join(done, (F.col("job_id") == F.col("j2")) & (F.col("t_done") >= F.col("t_enq")))
        .select("job_id", ms.alias("latency_ms"))
        .collect()
    }
    assert got == want
    assert len(got) > 0
