"""Mergeable-sketch rollup tables — the 100 TB answer to "distinct
users / quantiles over an arbitrary date range" without rescanning raw
events.

The pattern (Druid/Pinot/BigQuery materialized rollups): one pass over
the raw table builds a tiny per-period sketch table (HLL for distinct,
KLL for quantiles — both mergeable, both in Spark 4's datasketches
function family); every later range query unions O(periods) sketches
instead of O(rows) events. The estimate is approximate with published
error bounds (HLL lgK=12 → ~1.6% RSE), which is why the registry entry
is rows-only like the other sketch queries (SURVEY §2.6 approx rule) —
the error bound itself is pinned by tests/test_sketches.py against
exact answers.

All sketch work is JVM-side (datasketches-java via Catalyst
expressions): zero Python in the hot path, partial aggregation
(map-side sketch building) applies like any other agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goose_spark.queries.base import register, t

LG_K = 12  # HLL lgConfigK: 2^12 registers, ~1.6% relative standard error


def daily_sketch_table(events: DataFrame) -> DataFrame:
    """One row per day: HLL sketch of user_id, KLL sketch of value,
    exact row count. THIS is the table a 100 TB deployment materializes
    (O(days × sketch bytes) ≈ KBs/day); the raw scan happens once."""
    return events.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("user_hll"),
        F.kll_sketch_agg_double("value").alias("value_kll"),
        F.count("*").alias("n"),
    )


def range_rollup(sketches: DataFrame, bucket_expr) -> DataFrame:
    """Merge the per-day sketches up to ``bucket_expr`` (e.g. a week
    truncation): distinct-user estimate via HLL union, value median via
    KLL merge, exact row total. Input is the tiny sketch table — this
    never touches raw events, which is the entire point."""
    return (
        sketches.groupBy(bucket_expr.alias("bucket"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg("user_hll", F.lit(True))
            ).alias("est_users"),
            F.kll_sketch_get_quantile_double(
                F.expr("kll_merge_agg_double(value_kll)"), F.lit(0.5)
            ).alias("est_p50_value"),
            F.sum("n").alias("n_events"),
        )
        .orderBy("bucket")
    )


def theta_weekly_retention(events: DataFrame) -> DataFrame:
    """Week-over-week retained-user estimates from THETA sketches —
    the set-ALGEBRA sketch: HLL unions only, theta also intersects, so
    "users active in week N ∩ week N+1" never needs a rescan or a
    distinct-join. Per-week sketches (one raw pass), then a tiny
    O(weeks) self-join on week+7d and a scalar theta_intersection.
    At 100 TB the sketch table is KBs and every retention/overlap
    matrix query is driver-cheap."""
    wk = events.groupBy(
        F.date_trunc("week", "ts").alias("week")
    ).agg(F.theta_sketch_agg("user_id").alias("users_theta"))
    nxt = wk.select(
        F.col("week").alias("_nw"),
        F.col("users_theta").alias("_nsk"),
    )
    return (
        wk.join(nxt, F.col("_nw") == F.col("week") + F.expr("INTERVAL 7 DAYS"))
        .select(
            F.date_format("week", "yyyy-MM-dd").alias("week"),
            F.theta_sketch_estimate("users_theta").cast("bigint").alias("est_users"),
            F.theta_sketch_estimate(
                F.theta_intersection("users_theta", "_nsk")
            ).cast("bigint").alias("est_retained"),
        )
        .withColumn(
            "retention",
            F.round(F.col("est_retained") / F.col("est_users"), 4),
        )
        .orderBy("week")
    )


# --- incremental (streaming) rollup maintenance ----------------------------


def _daily_sketches(events: DataFrame) -> DataFrame:
    """Streaming-safe sketch rows: day string partition key, HLL users,
    KLL values. No exact counters — sketch union is IDEMPOTENT under
    replay (re-merging a batch's users is a set union no-op), which is
    what makes the foreachBatch upsert effectively-once without a
    transactional sink; an exact count would double on replay, so
    counts stay on the ledger/metrics path."""
    return events.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.hll_sketch_agg("user_id", F.lit(LG_K)).alias("user_hll"),
        F.kll_sketch_agg_double("value").alias("value_kll"),
    )


def rollup_upsert(spark: SparkSession, batch_events: DataFrame,
                  rollup_dir: str) -> None:
    """Merge one micro-batch into the per-day sketch table: sketch the
    batch, union with the existing sketches of ONLY the touched days,
    dynamic-partition-overwrite those day partitions. Untouched days'
    files are never rewritten — the write cost per trigger is
    O(days touched by the batch), not O(history)."""
    import os

    new = _daily_sketches(batch_events)
    if os.path.isdir(rollup_dir) and any(
        not f.startswith("_") for f in os.listdir(rollup_dir)
    ):
        days = [r["day"] for r in new.select("day").distinct().collect()]
        old = spark.read.parquet(rollup_dir).filter(F.col("day").isin(days))
        new = (
            new.unionByName(old)
            .groupBy("day")
            .agg(
                F.hll_union_agg("user_hll", F.lit(True)).alias("user_hll"),
                F.expr("kll_merge_agg_double(value_kll)").alias("value_kll"),
            )
        )
    (
        # repartition ON the partition column: same one-file-per-day
        # layout, but the touched days write in PARALLEL — repartition(1)
        # was a single-task funnel once a batch spans many days
        new.repartition("day")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(rollup_dir)
    )


def attach_rollup_stream(stream: DataFrame, rollup_dir: str,
                         checkpoint: str):
    """Wire rollup maintenance onto an event stream: every micro-batch
    upserts its days' sketches. Returns the started query."""

    def upsert(bdf: DataFrame, _bid: int) -> None:
        rollup_upsert(bdf.sparkSession, bdf, rollup_dir)

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


@register(
    "q78_sketch_rollup",
    None,  # approximate estimates — rows-only, error bound pinned in tests
    doc="Weekly distinct-user + median-value report computed ENTIRELY "
        "from a per-day mergeable-sketch rollup (HLL lgK=12 + KLL), "
        "never re-reading raw events: the materialized-rollup pattern "
        "that turns arbitrary-range distinct counting from an O(rows) "
        "rescan into an O(periods) sketch union at 100 TB. JVM-side "
        "datasketches aggs with map-side partials; "
        "tests/test_sketches.py pins the estimates against exact "
        "countDistinct/percentile (≤5% / ±10-rank error).",
)
def q78(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    daily = daily_sketch_table(e)
    out = range_rollup(daily, F.date_format(F.date_trunc("week", "day"), "yyyy-MM-dd"))
    return out.select(
        F.col("bucket").alias("week"),
        F.col("est_users").cast("bigint").alias("est_users"),
        F.round("est_p50_value", 4).alias("est_p50_value"),
        "n_events",
    )
