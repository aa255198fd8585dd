"""SQL surface parity for the temporal operators: the generated SQL in
operators/temporal_sql.py must return IDENTICAL rows to the DataFrame
forms on the q73/q74/q81 input shapes (same events table the graded
queries use), and the generated plans must keep the scalable silhouette
(hash equi-join on the bucket — no NestedLoop/Cartesian)."""

from __future__ import annotations

from pyspark.sql import functions as F

from goose_spark.operators.asof import asof_join
from goose_spark.operators.intervals import (
    banded_join,
    interval_overlap_join,
    sessionize_intervals,
)
from goose_spark.operators.temporal_sql import (
    asof_join_sql,
    banded_join_sql,
    interval_overlap_join_sql,
    register_asof_view,
)
from goose_spark.queries.base import t
from tests.conftest import SF_CORRECT


def _rows(df):
    return sorted(tuple(map(str, r)) for r in df.collect())


def _no_nested_loop(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_asof_sql_parity_q73_shape(spark):
    e = t(spark, SF_CORRECT, "events")
    p = e.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_event_id"), "ts"
    )
    p.createOrReplaceTempView("_p")
    v.createOrReplaceTempView("_v")
    want = asof_join(p, v, on="user_id", right_cols=["view_event_id"])
    got = spark.sql(
        asof_join_sql(spark, "_p", "_v", on="user_id",
                      right_cols=["view_event_id"])
    )
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)
    _no_nested_loop(got)


def test_asof_sql_parity_forward(spark):
    e = t(spark, SF_CORRECT, "events")
    p = e.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_event_id"), "ts"
    )
    p.createOrReplaceTempView("_p")
    v.createOrReplaceTempView("_v")
    want = asof_join(p, v, on="user_id", right_cols=["view_event_id"],
                     direction="forward")
    got = spark.sql(
        asof_join_sql(spark, "_p", "_v", on="user_id",
                      right_cols=["view_event_id"], direction="forward")
    )
    assert _rows(got) == _rows(want)


def test_banded_sql_parity_q74_shape(spark):
    e = t(spark, SF_CORRECT, "events")
    err = e.filter(F.col("event_type") == "error").select("event_id", "ts")
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "ts", "value"
    )
    err.createOrReplaceTempView("_err")
    pur.createOrReplaceTempView("_pur")
    want = banded_join(err, pur, band_sec=300)
    got = spark.sql(banded_join_sql(spark, "_err", "_pur", band_sec=300))
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)
    _no_nested_loop(got)


def test_overlap_sql_parity_q81_shape(spark):
    e = t(spark, SF_CORRECT, "events")
    iv = sessionize_intervals(e, 30)
    errw = e.filter(F.col("event_type") == "error").select(
        (F.col("ts") - F.expr("INTERVAL 10 MINUTES")).alias("ws"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("we"),
    )
    iv.createOrReplaceTempView("_iv")
    errw.createOrReplaceTempView("_errw")
    want = interval_overlap_join(iv, errw, bucket_sec=1800,
                                 b_start="ws", b_end="we")
    got = spark.sql(
        interval_overlap_join_sql(spark, "_iv", "_errw", bucket_sec=1800,
                                  b_start="ws", b_end="we")
    )
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)
    _no_nested_loop(got)


def test_register_view_composes_in_sql(spark):
    """The registered output view is a plain table to downstream SQL —
    the surface a spark.sql-only consumer actually composes over."""
    e = t(spark, SF_CORRECT, "events")
    e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    ).createOrReplaceTempView("_p2")
    e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_event_id"), "ts"
    ).createOrReplaceTempView("_v2")
    register_asof_view(spark, "asof_out", "_p2", "_v2", on="user_id",
                       right_cols=["view_event_id"])
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM asof_out WHERE view_event_id IS NOT NULL"
    ).collect()[0]["n"]
    direct = asof_join(
        spark.table("_p2"), spark.table("_v2"), on="user_id",
        right_cols=["view_event_id"],
    ).filter(F.col("view_event_id").isNotNull()).count()
    assert n == direct
