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


def test_theta_retention_within_bounds(spark):
    """Theta intersection estimates week-over-week retained users
    within 10% of the exact overlap (theta default lgK is generous for
    150 users — expect near-exact)."""
    from goose_spark.operators.sketches import theta_weekly_retention

    e = t(spark, SF_CORRECT, "events")
    got = {r["week"]: r for r in theta_weekly_retention(e).collect()}
    wk = e.select(
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("wk"),
        "user_id",
    ).distinct()
    nxt = wk.select(F.col("wk").alias("nw"), F.col("user_id").alias("nu"))
    exact = {
        r["wk"]: r
        for r in wk.join(
            nxt,
            (F.col("nu") == F.col("user_id"))
            & (
                F.col("nw")
                == F.date_format(F.date_add(F.to_date("wk"), 7), "yyyy-MM-dd")
            ),
        )
        .groupBy("wk")
        .agg(F.countDistinct("user_id").alias("retained"))
        .collect()
    }
    assert len(got) >= 3
    for wkday, g in got.items():
        x = exact[wkday]["retained"]
        assert abs(g["est_retained"] - x) <= max(0.1 * x, 2), (wkday, g, x)
        assert 0 < g["retention"] <= 1.0


def test_streaming_rollup_matches_batch_and_replays_idempotently(spark, tmp_path):
    """foreachBatch upsert across two file-stream chunks converges to
    the same HLL estimates as one batch pass, and re-merging the same
    events is a no-op (sketch union is a set union)."""
    from goose_spark.operators.sketches import (
        attach_rollup_stream,
        rollup_upsert,
    )

    e = t(spark, SF_CORRECT, "events").select("ts", "user_id", "value")
    src = str(tmp_path / "src")
    half = e.filter(F.dayofmonth("ts") <= 15)
    rest = e.filter(F.dayofmonth("ts") > 15)
    half.write.mode("overwrite").parquet(src)
    rollup = str(tmp_path / "rollup")
    ck = str(tmp_path / "ck")

    stream = spark.readStream.schema(e.schema).parquet(src)
    q = attach_rollup_stream(stream, rollup, ck)
    q.awaitTermination(120)
    rest.write.mode("append").parquet(src)
    q2 = attach_rollup_stream(
        spark.readStream.schema(e.schema).parquet(src), rollup, ck
    )
    q2.awaitTermination(120)

    def estimates(path):
        return {
            r["day"]: r["d"]
            for r in spark.read.parquet(path)
            .select(
                "day", F.hll_sketch_estimate("user_hll").cast("bigint").alias("d")
            )
            .collect()
        }

    streamed = estimates(rollup)
    batch_dir = str(tmp_path / "batch")
    rollup_upsert(spark, e, batch_dir)
    assert streamed == estimates(batch_dir)

    # replay: merging the first half AGAIN changes nothing
    rollup_upsert(spark, half, rollup)
    assert estimates(rollup) == streamed


def test_q29_percentile_approx_rank_space(spark):
    """Tight rank-space property for q29's sketches (r12 advice #2): the
    gate's value envelope at q ± 0.01 is ~100x looser than
    percentile_approx's published guarantee (rank error ≤ 1/accuracy),
    so a sketch violating its contract by an order of magnitude could
    still pass the gate. This second pass — test-only, sf0.01 — pins the
    tight bound: for each returnflag group, the returned value's rank
    interval [#rows < v, #rows <= v] must intersect
    [N*(q − 2/acc), N*(q + 2/acc)] (±2/accuracy: the sketch guarantee
    plus one rank of tie/interpolation slack, the r11 bound)."""
    from goose_spark.queries.relational_ext import _Q29_ACC

    li = t(spark, SF_CORRECT, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    eps = 2.0 / _Q29_ACC
    approx = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag").agg(
            F.percentile_approx("l_quantity", 0.5, _Q29_ACC).alias("p50q"),
            F.percentile_approx("l_extendedprice", 0.99, _Q29_ACC).alias("p99p"),
            F.count("*").alias("n"),
        ).collect()
    }
    assert len(approx) == 3
    # one rank-counting pass per (column, quantile), all three groups at once
    checks = [("l_quantity", "p50q", 0.5), ("l_extendedprice", "p99p", 0.99)]
    for col, key, q in checks:
        by_rf = {
            r["l_returnflag"]: r
            for r in li.groupBy("l_returnflag").agg(
                *[
                    F.sum(
                        (F.col(col) < F.lit(float(approx[rf][key]))).cast("long")
                    ).alias(f"lt_{i}")
                    for i, rf in enumerate(sorted(approx))
                ],
                *[
                    F.sum(
                        (F.col(col) <= F.lit(float(approx[rf][key]))).cast("long")
                    ).alias(f"le_{i}")
                    for i, rf in enumerate(sorted(approx))
                ],
            ).collect()
        }
        for i, rf in enumerate(sorted(approx)):
            n = approx[rf]["n"]
            lo_rank, hi_rank = by_rf[rf][f"lt_{i}"], by_rf[rf][f"le_{i}"]
            want_lo, want_hi = n * (q - eps), n * (q + eps)
            assert lo_rank <= want_hi and hi_rank >= want_lo, (
                rf, col, q, lo_rank, hi_rank, want_lo, want_hi, n,
            )
