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
