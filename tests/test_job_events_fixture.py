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


def test_q91_merge_reconciles_any_shard_split(spark):
    """MERGE correctness invariant (q91): reconciling latest-per-key
    states of ANY 2-way split of the log must reproduce the latest-per-
    key state of the WHOLE log — the algebraic property that makes the
    shard-merge a compaction primitive (splits are associative). Checked
    for the registered md5 split and three other deterministic splits,
    plus merge_action consistency."""
    from goose_spark.queries import load_all
    from pyspark.sql.window import Window

    reg = load_all()
    ev_df = fixture(spark, "job_events").select("job_id", "kind", "seq", "queue")
    w = Window.partitionBy("job_id").orderBy(F.col("seq").desc())
    truth = {
        r["job_id"]: (r["kind"], r["seq"], r["queue"])
        for r in ev_df.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1").collect()
    }

    # registered md5 split (the q91 query itself)
    got = reg["q91_merge_upsert_state"].builder(spark, None).collect()
    assert {r["job_id"]: (r["kind"], r["seq"], r["queue"]) for r in got} == truth
    actions = {r["merge_action"] for r in got}
    assert actions == {"update", "skip", "insert", "keep"}  # all populated

    # three more splits: seq parity, seq thirds, job_id hash — same
    # reconciliation algebra, recomputed inline
    def latest(df):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1").drop("rn")
        )

    for split in [F.col("seq") % 2 == 0,
                  F.col("seq") % 3 != 1,
                  F.crc32(F.col("job_id")) % 2 == 0]:
        a = latest(ev_df.filter(split)).alias("a")
        b = latest(ev_df.filter(~split)).alias("b")
        b_wins = F.col("a.job_id").isNull() | (
            F.col("b.job_id").isNotNull() & (F.col("b.seq") > F.col("a.seq"))
        )
        merged = {
            r["job_id"]: (r["kind"], r["seq"], r["queue"])
            for r in a.join(b, F.col("a.job_id") == F.col("b.job_id"), "full_outer")
            .select(
                F.coalesce("a.job_id", "b.job_id").alias("job_id"),
                F.when(b_wins, F.col("b.kind")).otherwise(F.col("a.kind")).alias("kind"),
                F.when(b_wins, F.col("b.seq")).otherwise(F.col("a.seq")).alias("seq"),
                F.when(b_wins, F.col("b.queue")).otherwise(F.col("a.queue")).alias("queue"),
            ).collect()
        }
        assert merged == truth
