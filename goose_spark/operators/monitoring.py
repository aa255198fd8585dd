"""Streaming monitoring rollup — the maintained-table form of q83's
rate-anomaly query.

Batch q83 rescans raw events per run; a monitoring pipeline instead
maintains an (event_type, hour) count table incrementally and runs the
anomaly scan over THAT — O(types × hours) rows, never the raw stream.
This module is that leg:

  hourly_counts         the shared pre-aggregation (q83 uses it too)
  counts_upsert         merge one micro-batch into the table; the
                        table partitions by day, so the write cost per
                        trigger is O(days touched), not O(history)
                        (sketches.rollup_upsert's layout)
  attach_counts_stream  foreachBatch wiring. Count ADDITION is not
                        idempotent (unlike sketch union), so each
                        batch merges under an effect-once marker
                        (streaming/effects.py) — the attach_index_
                        stream contract: checkpoint-commit loss
                        replays the batch, the marker suppresses the
                        duplicate merge. Retire effects dir and
                        checkpoint TOGETHER.
  anomalies_from_hourly the trailing-24-bucket z-score scan (exact
                        BIGINT window sums — q83's kernel, shared)

No reference analog (nilenso/goose is a job library); this extends the
monitoring family (q83/qj10/qj13) with the streaming maintenance shape
the sketch rollup (q78) and ANN index (ss5) already follow.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: trailing window length (observed hourly buckets) and anomaly bar
BASELINE_BUCKETS = 24
Z_BAR = 3.0


def hourly_counts(events: DataFrame) -> DataFrame:
    """(event_type, hour_idx, n) — the monitoring pre-aggregation."""
    return (
        events.select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour_idx"),
        )
        .groupBy("event_type", "hour_idx")
        .agg(F.count("*").alias("n"))
    )


def counts_upsert(spark: SparkSession, batch_events: DataFrame,
                  table_dir: str) -> None:
    """Merge one micro-batch's hourly counts into the day-partitioned
    table: sum with the stored counts of ONLY the touched days, then
    dynamic-partition-overwrite those day partitions."""
    new = hourly_counts(batch_events).withColumn(
        "day_idx", (F.col("hour_idx") / 24).cast("long")
    )
    if os.path.isdir(table_dir) and any(
        not f.startswith("_") for f in os.listdir(table_dir)
    ):
        days = [r["day_idx"] for r in new.select("day_idx").distinct().collect()]
        old = spark.read.parquet(table_dir).filter(F.col("day_idx").isin(days))
        new = (
            new.unionByName(old)
            .groupBy("event_type", "hour_idx", "day_idx")
            .agg(F.sum("n").alias("n"))
        )
    (
        new.repartition("day_idx")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day_idx")
        .parquet(table_dir)
    )


def attach_counts_stream(stream: DataFrame, table_dir: str, checkpoint: str,
                         effects_dir: str | None = None):
    """Maintain the hourly-count table from an event stream. Returns
    the started query. Each micro-batch merges under an effect-once
    marker: exact counts would double on checkpoint-replay otherwise."""
    from goose_spark.streaming.effects import EffectOnceTable

    effects = EffectOnceTable(effects_dir or checkpoint.rstrip("/") + "_effects")

    def upsert(bdf: DataFrame, bid: int) -> None:
        if bdf.isEmpty():
            return
        effects.run_once(
            f"hourly-counts:{bid}",
            lambda: counts_upsert(bdf.sparkSession, bdf, table_dir),
        )

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def anomalies_from_hourly(hourly: DataFrame) -> DataFrame:
    """Trailing-``BASELINE_BUCKETS`` z-score per (type, hour): mean and
    variance from exact BIGINT window sums so the result is
    engine-reproducible (q83's kernel — q83 IS this scan over the
    on-the-fly pre-agg)."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_idx")
        .rowsBetween(-BASELINE_BUCKETS, -1)
    )
    stats = hourly.select(
        "event_type", "hour_idx", "n",
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
        F.count("n").over(w).alias("c"),
    )
    mean = F.col("s1").cast("double") / F.col("c")
    var = (F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("c")) / (
        F.col("c") - 1
    )
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        stats.filter(
            (F.col("c") == BASELINE_BUCKETS)
            & ((F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("c")) > 0)
        )
        .select(
            "event_type", "hour_idx", "n",
            F.round(mean, 6).alias("mean_n"),
            F.round(z, 6).alias("z"),
            (F.abs(z) >= Z_BAR).alias("is_anomaly"),
        )
        .orderBy("event_type", "hour_idx")
    )
