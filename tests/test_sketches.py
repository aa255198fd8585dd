"""operators/sketches.py — the rollup must answer range queries from
sketches alone, within the sketches' published error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from goose_spark.operators.sketches import daily_sketch_table, range_rollup
from goose_spark.queries.base import t
from tests.conftest import SF_CORRECT


def test_weekly_estimates_within_bounds(spark):
    """HLL lgK=12 (~1.6% RSE → assert ≤5%) and KLL default-k median
    (assert within the exact p45–p55 band) per week, vs exact answers
    computed from the raw table."""
    e = t(spark, SF_CORRECT, "events")
    daily = daily_sketch_table(e)
    got = {
        r["bucket"]: r
        for r in range_rollup(
            daily, F.date_format(F.date_trunc("week", "day"), "yyyy-MM-dd")
        ).collect()
    }
    exact = {
        r["wk"]: r
        for r in e.groupBy(
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("wk")
        )
        .agg(
            F.countDistinct("user_id").alias("d"),
            F.expr("percentile(value, 0.45)").alias("lo"),
            F.expr("percentile(value, 0.55)").alias("hi"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert set(got) == set(exact) and len(got) >= 4
    for wk, g in got.items():
        x = exact[wk]
        assert abs(g["est_users"] - x["d"]) <= max(0.05 * x["d"], 2), (wk, g, x)
        assert x["lo"] <= g["est_p50_value"] <= x["hi"], (wk, g, x)
        assert g["n_events"] == x["n"]  # counts are exact, not sketched


def test_rollup_never_rescans_raw_events(spark):
    """The point of the pattern: once the sketch table is materialized,
    the range query's plan reads ONLY the sketch table."""
    e = t(spark, SF_CORRECT, "events")
    import tempfile

    path = tempfile.mkdtemp(prefix="sketch-rollup-")
    daily_sketch_table(e).write.mode("overwrite").parquet(path)
    sk = spark.read.parquet(path)
    plan = (
        range_rollup(sk, F.date_format(F.date_trunc("week", "day"), "yyyy-MM-dd"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "events.parquet" not in plan
    assert plan.count("Scan parquet") == 1


def test_union_merge_equals_single_pass(spark):
    """Mergeability contract: unioning per-day sketches estimates the
    same cardinality as one sketch over the whole range (bit-identical
    registers, so the estimates are EQUAL, not just close)."""
    e = t(spark, SF_CORRECT, "events")
    merged = range_rollup(daily_sketch_table(e), F.lit("all")).collect()[0]
    single = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("d")
    ).collect()[0]
    assert merged["est_users"] == single["d"]
