"""End-to-end temporal-analytics walkthrough — the events-side
counterpart of examples/data_pipeline.py, composed from the round-7
operator families:

    events
      → sessionize                 (gaps-and-islands: per-user interval
                                    table — the q30/q76 primitive)
      → as-of enrichment           (operators/asof.py: each purchase
                                    gets the user's latest preceding
                                    view, merge_asof semantics)
      → error blast-radius         (operators/intervals.py: banded join
                                    of errors to ALL purchases within
                                    ±5 min — bucket-blocked, no
                                    nested-loop; then sessions ×
                                    error-windows overlap join with the
                                    exactly-once bucket guard)
      → concurrency profile        (sweep-line on the two-pass
                                    distributed prefix sum: daily peak
                                    concurrent sessions)
      → sketch rollup              (per-day HLL+KLL table; the report
                                    reads sketches, never raw events)
      → z-order layout             (cluster the enriched fact on
                                    (user_id, epoch-minute) so BOTH
                                    per-user and per-time filters prune
                                    files downstream)

Run:  python examples/temporal_analytics.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

GAP_MIN = 30


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> dict:
    from goose_spark.operators.asof import asof_join
    from goose_spark.operators.intervals import (
        banded_join,
        interval_concurrency,
        interval_overlap_join,
        sessionize_intervals,
    )
    from goose_spark.operators.layout import cluster_by_zorder
    from goose_spark.operators.sketches import daily_sketch_table, range_rollup
    from goose_spark.queries.base import t

    owns_session = spark is None
    if owns_session:
        from goose_spark.session import get_spark

        spark = get_spark("temporal-analytics-example")
        spark.sparkContext.setLogLevel("ERROR")

    e = t(spark, sf_dir, "events")
    stats: dict = {"events": e.count()}

    # 1. sessionize → interval table (the shared q76/q81 primitive)
    iv = sessionize_intervals(e, GAP_MIN)
    stats["sessions"] = iv.count()

    # 2. as-of enrichment: purchase ← latest preceding view
    p = e.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    enriched = asof_join(p, v, on="user_id", right_cols=["view_id"])
    stats["purchases_with_view"] = enriched.filter(F.col("view_id").isNotNull()).count()

    # 3a. error blast radius, point form: purchases within ±5 min of an error
    err = e.filter(F.col("event_type") == "error").select("event_id", "ts")
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "ts", "value"
    )
    stats["purchases_near_errors"] = (
        banded_join(err, pur, band_sec=300).select("p_id").distinct().count()
    )

    # 3b. interval form: sessions overlapping ±10-min error windows
    errw = err.select(
        (F.col("ts") - F.expr("INTERVAL 10 MINUTES")).alias("ws"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("we"),
    )
    touched = interval_overlap_join(
        iv, errw, bucket_sec=GAP_MIN * 60, b_start="ws", b_end="we"
    )
    stats["sessions_touching_errors"] = (
        touched.select("user_id_a", "sid_a").distinct().count()
    )

    # 4. daily peak concurrency (two-pass sweep line)
    lv = interval_concurrency(iv, spark)
    peaks = (
        lv.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.max("level").alias("peak"))
        .orderBy("day")
        .collect()
    )
    stats["peak_concurrency"] = max(r["peak"] for r in peaks)

    # 5. sketch rollup: the report never rescans raw events
    out = tempfile.mkdtemp(prefix="temporal-example-")
    daily_sketch_table(e).write.mode("overwrite").parquet(f"{out}/rollup")
    sk = spark.read.parquet(f"{out}/rollup")
    weekly = range_rollup(
        sk, F.date_format(F.date_trunc("week", "day"), "yyyy-MM-dd")
    ).collect()
    stats["weeks"] = len(weekly)
    stats["est_users_week1"] = int(weekly[0]["est_users"])

    # 6. z-order the enriched fact for downstream multi-dim pruning
    fact = enriched.select(
        "user_id",
        (F.unix_micros("ts") / 60_000_000).cast("long").alias("minute"),
        "event_id",
    )
    cluster_by_zorder(fact, ["user_id", "minute"], num_files=4).write.mode(
        "overwrite"
    ).parquet(f"{out}/fact_zorder")
    stats["fact_files"] = len(
        [f for f in os.listdir(f"{out}/fact_zorder") if f.endswith(".parquet")]
    )

    if owns_session:
        for k, val in stats.items():
            print(f"{k}: {val}")
    return stats


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
