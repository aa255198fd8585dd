"""Temporal-analytics queries over the events table: banded (bounded-Δt)
join, staged funnel, and sweep-line peak concurrency — the three event
silhouettes q30/q52/q57/q69/q73 don't cover.

Each is built on the scale-shaped operator form (operators/intervals.py)
with the naive ANSI formulation as its DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goose_spark.queries.base import register, t

BAND_SEC = 300  # ±5 minutes
GAP_MIN = 30  # session gap, minutes (same as q30)


@register(
    "q74_banded_time_join",
    f"""SELECT a.event_id,
               COUNT(b.event_id) AS n_nearby,
               CAST(COALESCE(ROUND(SUM(CAST(b.value AS DECIMAL(18,2))), 2), 0)
                    AS DOUBLE) AS purchase_value
        FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') a
        LEFT JOIN (SELECT event_id, ts, value FROM events
                   WHERE event_type = 'purchase') b
          ON b.ts BETWEEN a.ts - INTERVAL {BAND_SEC} SECOND
                      AND a.ts + INTERVAL {BAND_SEC} SECOND
        GROUP BY a.event_id
        ORDER BY a.event_id""",
    doc="Banded time join with NO selective equi-key: every error event "
        "joined to ALL purchases (any user) within ±5 minutes. Catalyst "
        "would plan the raw inequality join as a broadcast-nested-loop "
        "(O(|L|·|R|) compares); operators/intervals.banded_join buckets "
        "both sides by floor(epoch/band) and explodes the left into its "
        "3 adjacent buckets, so it runs as ONE ordinary hash shuffle "
        "whose candidates are bounded by events-per-2-bands — AQE skew "
        "split covers hot bands. Left-join zeros recovered with a "
        "co-partitioned join back to the error side.",
)
def q74(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.intervals import banded_join

    e = t(spark, sf, "events")
    err = e.filter(F.col("event_type") == "error").select("event_id", "ts")
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "ts", "value"
    )
    pairs = banded_join(err, pur, band_sec=BAND_SEC)
    near = pairs.groupBy("event_id").agg(
        F.count("*").alias("n_nearby"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2).alias("_pv"),
    )
    return (
        err.select("event_id")
        .join(near, "event_id", "left")
        .select(
            "event_id",
            F.coalesce("n_nearby", F.lit(0)).alias("n_nearby"),
            F.coalesce("_pv", F.lit(0)).cast("double").alias("purchase_value"),
        )
        .orderBy("event_id")
    )


@register(
    "q75_event_funnel",
    """WITH s AS (SELECT user_id, MIN(ts) AS s1 FROM events
                  WHERE event_type = 'signup' GROUP BY user_id),
            c AS (SELECT e.user_id, MIN(e.ts) AS c1
                  FROM events e JOIN s ON e.user_id = s.user_id
                  WHERE e.event_type = 'click' AND e.ts > s.s1
                  GROUP BY e.user_id),
            p AS (SELECT e.user_id, MIN(e.ts) AS p1
                  FROM events e JOIN c ON e.user_id = c.user_id
                  WHERE e.event_type = 'purchase' AND e.ts > c.c1
                  GROUP BY e.user_id)
       SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM s
       UNION ALL SELECT '2_click', COUNT(*) FROM c
       UNION ALL SELECT '3_purchase', COUNT(*) FROM p
       ORDER BY stage""",
    doc="Staged re-qualification funnel — the STRICT variant of ev1's "
        "first-touch funnel: stage N's timestamp is the first qualifying "
        "event AFTER stage N-1's (a user whose only-ever-first click "
        "predates signup still converts here via a later click; ev1's "
        "global-first-touch comparison would drop them). Three "
        "conditional min-ts aggregations chained by per-stage joins — "
        "every shuffle hashes on user_id, so stages 2 and 3 join "
        "co-partitioned aggregate outputs, and each stage's frame "
        "shrinks monotonically.",
)
def q75(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("s1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p1"))
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage(s, "1_signup")
        .unionAll(stage(c, "2_click"))
        .unionAll(stage(p, "3_purchase"))
        .orderBy("stage")
    )


@register(
    "q76_peak_concurrency",
    f"""WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN ts - LAG(ts) OVER w > INTERVAL '{GAP_MIN}' MINUTE
                      OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS ns
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, ts,
                 SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged),
        iv AS (SELECT user_id, sid, MIN(ts) AS s, MAX(ts) AS e
               FROM sess GROUP BY user_id, sid),
        pts AS (SELECT s AS ts, 1 AS delta FROM iv
                UNION ALL SELECT e, -1 FROM iv),
        lv AS (SELECT ts, delta,
                      SUM(delta) OVER (ORDER BY ts, delta DESC
                                       ROWS UNBOUNDED PRECEDING) AS level
               FROM pts)
       SELECT strftime(ts, '%Y-%m-%d') AS day,
              CAST(MAX(level) AS BIGINT) AS peak,
              COUNT(*) AS n_transitions
       FROM lv GROUP BY day ORDER BY day""",
    doc="Peak concurrent sessions per day, sweep-line form: sessionize "
        "(q30's gaps-and-islands), emit ±1 interval endpoints, running "
        "net-open count, daily MAX. The oracle's global ordered running "
        "sum is the single-partition scale-killer; the Spark side rides "
        "operators/intervals.interval_concurrency — per-day delta "
        "subtotals, O(days) driver offsets, per-day parallel windows "
        "(the sp3/sp4 two-pass prefix sum). Daily MAX over tied "
        "endpoints is permutation-invariant, so both formulations agree "
        "exactly (see the operator docstring for the argument).",
)
def q76(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.intervals import (
        interval_concurrency,
        sessionize_intervals,
    )

    iv = sessionize_intervals(t(spark, sf, "events"), GAP_MIN)
    lv = interval_concurrency(iv, spark, "start", "end", bucket="day")
    return (
        lv.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.max("level").alias("peak"),
            F.count("*").alias("n_transitions"),
        )
        .orderBy("day")
    )


ERR_WIN_MIN = 10  # half-width of the error impact window


@register(
    "q81_interval_overlap_join",
    f"""WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN ts - LAG(ts) OVER w > INTERVAL '{GAP_MIN}' MINUTE
                      OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS ns
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sess AS (
          SELECT user_id, ts,
                 SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged),
        iv AS (SELECT user_id, sid, MIN(ts) AS s, MAX(ts) AS e
               FROM sess GROUP BY user_id, sid),
        w AS (SELECT ts - INTERVAL {ERR_WIN_MIN} MINUTE AS ws,
                     ts + INTERVAL {ERR_WIN_MIN} MINUTE AS we
              FROM events WHERE event_type = 'error'),
        p AS (SELECT iv.user_id, iv.sid, COUNT(*) AS np
              FROM iv JOIN w ON iv.s <= w.we AND w.ws <= iv.e
              GROUP BY iv.user_id, iv.sid)
       SELECT iv.user_id,
              COUNT(*) AS n_sessions,
              SUM(CASE WHEN p.np IS NOT NULL THEN 1 ELSE 0 END)
                AS overlapped_sessions,
              CAST(COALESCE(SUM(p.np), 0) AS BIGINT) AS overlap_pairs
       FROM iv LEFT JOIN p ON iv.user_id = p.user_id AND iv.sid = p.sid
       GROUP BY iv.user_id ORDER BY iv.user_id""",
    doc="Interval×interval overlap join: per-user sessions (q76's "
        "gaps-and-islands intervals) against ±10-minute error impact "
        "windows — how many of each user's sessions overlapped an "
        "error window, and how many windows each hit. The oracle's raw "
        "inequality join is the O(|A|·|B|) nested loop; the Spark side "
        "runs operators/intervals.interval_overlap_join — both sides "
        "explode over spanned time buckets, equi-join on the bucket, "
        "and the max-start-bucket guard keeps every overlapping pair "
        "in EXACTLY one bucket (no distinct, no lost pairs). The "
        "interval big brother of q74's point-banded join.",
)
def q81(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.intervals import (
        interval_overlap_join,
        sessionize_intervals,
    )

    e = t(spark, sf, "events")
    iv = sessionize_intervals(e, GAP_MIN)
    errw = e.filter(F.col("event_type") == "error").select(
        (F.col("ts") - F.expr(f"INTERVAL {ERR_WIN_MIN} MINUTES")).alias("ws"),
        (F.col("ts") + F.expr(f"INTERVAL {ERR_WIN_MIN} MINUTES")).alias("we"),
    )
    pairs = interval_overlap_join(
        iv, errw, bucket_sec=GAP_MIN * 60, b_start="ws", b_end="we"
    )
    per_sess = pairs.groupBy(
        F.col("user_id_a").alias("user_id"), F.col("sid_a").alias("sid")
    ).agg(F.count("*").alias("np"))
    return (
        iv.join(per_sess, ["user_id", "sid"], "left")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(F.when(F.col("np").isNotNull(), 1).otherwise(0)).alias(
                "overlapped_sessions"
            ),
            F.coalesce(F.sum("np"), F.lit(0)).cast("bigint").alias("overlap_pairs"),
        )
        .orderBy("user_id")
    )


@register(
    "q82_ohlc_downsample",
    """WITH b AS (
         SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id, value,
                ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                   ORDER BY ts, event_id) AS rn_a,
                ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                   ORDER BY ts DESC, event_id DESC) AS rn_d
         FROM events)
       SELECT CAST(EXTRACT(YEAR FROM bucket) AS BIGINT) AS y,
              CAST(EXTRACT(MONTH FROM bucket) AS BIGINT) AS m,
              CAST(EXTRACT(DAY FROM bucket) AS BIGINT) AS d,
              CAST(EXTRACT(HOUR FROM bucket) AS BIGINT) AS h,
              event_type,
              MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
              MAX(value) AS high, MIN(value) AS low,
              MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
              COUNT(*) AS n,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
       FROM b GROUP BY 1,2,3,4,5 ORDER BY y, m, d, h, event_type""",
    doc="OHLC time-bucket downsampling (hourly, per event type): "
        "open/close via deterministic (ts, event_id)-ordered row_number "
        "windows, high/low/total as plain aggregates. One shuffle on the "
        "(type, bucket) key serves both windows AND the groupBy — the "
        "canonical metrics-rollup silhouette for a timeseries store.",
)
def q82(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = t(spark, sf, "events").withColumn("bucket", F.date_trunc("hour", "ts"))
    wa = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    # group on the SAME (event_type, bucket) key the windows partition
    # by — the one exchange serves both windows and the aggregate;
    # y/m/d/h are derived after the agg (grouping on derived columns
    # would force a second shuffle)
    return (
        e.withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
        .groupBy("event_type", "bucket")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total"),
        )
        .select(
            F.year("bucket").cast("long").alias("y"),
            F.month("bucket").cast("long").alias("m"),
            F.dayofmonth("bucket").cast("long").alias("d"),
            F.hour("bucket").cast("long").alias("h"),
            "event_type", "open", "high", "low", "close", "n", "total",
        )
        .orderBy("y", "m", "d", "h", "event_type")
    )


@register(
    "q83_rate_anomaly",
    """WITH hourly AS (
         SELECT event_type,
                CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_idx,
                COUNT(*) AS n
         FROM events GROUP BY 1, 2),
       stats AS (
         SELECT event_type, hour_idx, n,
                SUM(n)     OVER w AS s1,
                SUM(n * n) OVER w AS s2,
                COUNT(n)   OVER w AS c
         FROM hourly
         WINDOW w AS (PARTITION BY event_type ORDER BY hour_idx
                      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
       SELECT event_type, hour_idx, n,
              ROUND(CAST(s1 AS DOUBLE) / c, 6) AS mean_n,
              ROUND((n - CAST(s1 AS DOUBLE) / c)
                    / sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / c) / (c - 1)), 6) AS z,
              CAST(ABS((n - CAST(s1 AS DOUBLE) / c)
                   / sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / c) / (c - 1))) >= 3.0
                   AS BOOLEAN) AS is_anomaly
       FROM stats
       WHERE c = 24 AND (s2 - CAST(s1 AS DOUBLE) * s1 / c) > 0
       ORDER BY event_type, hour_idx""",
    doc="Event-rate anomaly flags: hourly counts per type, z-score vs "
        "the trailing 24 observed buckets. Mean/variance are derived "
        "from exact BIGINT sums (s1, s2, c) so both engines evaluate "
        "bit-identical doubles — no stddev_samp implementation "
        "divergence. Plan: one (type, hour) pre-agg shrinks the stream "
        "to O(types × hours) rows, then a per-type ordered window — "
        "the monitoring silhouette over any metric stream.",
)
def q83(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.monitoring import (
        anomalies_from_hourly,
        hourly_counts,
    )

    return anomalies_from_hourly(hourly_counts(t(spark, sf, "events")))


@register(
    "q85_retention_cohorts",
    """WITH cohort AS (
         SELECT user_id,
                CAST(MIN(date_trunc('week', ts)) AS DATE) AS cw
         FROM events WHERE event_type = 'signup' GROUP BY user_id),
       activity AS (
         SELECT DISTINCT user_id,
                CAST(date_trunc('week', ts) AS DATE) AS wk
         FROM events)
       SELECT c.cw AS cohort_week,
              CAST(datediff('day', c.cw, a.wk) / 7 AS INT) AS week_k,
              COUNT(DISTINCT a.user_id) AS active_users
       FROM cohort c JOIN activity a USING (user_id)
       WHERE a.wk >= c.cw
       GROUP BY 1, 2 ORDER BY 1, 2""",
    doc="Weekly cohort retention matrix: users cohorted by the week of "
        "their first signup event; active_users = distinct cohort "
        "members with ANY event k weeks later. All-integer arithmetic "
        "(week-truncated dates, day-diff/7 is exact) — no float "
        "divergence. Plan: one per-user min-agg (cohort), one distinct "
        "(user, week) pre-agg that shrinks the stream before the join; "
        "both sides then hash on user_id, so the join co-partitions at "
        "any user count (the planner broadcasts the cohort only while "
        "it fits — no forced hint, no scale cliff). The classic "
        "growth-analytics silhouette, shuffle-bounded by user count.",
)
def q85(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    cohort = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.date_trunc("week", "ts")).cast("date").alias("cw"))
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    return (
        activity.join(cohort, "user_id")
        .filter(F.col("wk") >= F.col("cw"))
        .select(
            F.col("cw").alias("cohort_week"),
            (F.datediff("wk", "cw") / 7).cast("int").alias("week_k"),
            "user_id",
        )
        .groupBy("cohort_week", "week_k")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_k")
    )


@register(
    "q89_event_transitions",
    """WITH s AS (
         SELECT user_id, event_type,
                LEAD(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS nxt
         FROM events),
       c AS (SELECT event_type, nxt, COUNT(*) AS n_trans
             FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
       SELECT event_type, nxt AS next_type, n_trans,
              ROUND(n_trans * 1.0 /
                    SUM(n_trans) OVER (PARTITION BY event_type), 6) AS p_next
       FROM c ORDER BY event_type, next_type""",
    doc="First-order Markov transition matrix over per-user event "
        "sequences: P(next type | type) from one user-partitioned "
        "lead() window + one O(types²) count aggregate — probabilities "
        "are exact-integer-count ratios (identical doubles on both "
        "engines). The behavioral twin of tx15's token bigrams: the "
        "session-flow model product analytics fits at any scale. One "
        "user_id shuffle for the window, then the stream collapses to "
        "types² rows — the normalizing window runs on that tiny table.",
)
def q89(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = t(spark, sf, "events").select("user_id", "event_type", "ts", "event_id")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = (
        e.withColumn("nxt", F.lead("event_type").over(seq))
        .filter(F.col("nxt").isNotNull())
        .groupBy("event_type", "nxt")
        .agg(F.count("*").alias("n_trans"))
    )
    norm = Window.partitionBy("event_type")
    return (
        c.select(
            "event_type",
            F.col("nxt").alias("next_type"),
            "n_trans",
            F.round(
                F.col("n_trans") * 1.0 / F.sum("n_trans").over(norm), 6
            ).alias("p_next"),
        )
        .orderBy("event_type", "next_type")
    )


@register(
    "q94_windowed_funnel",
    """WITH s AS (SELECT user_id, MIN(ts) AS s1 FROM events
                  WHERE event_type = 'signup' GROUP BY user_id),
       c AS (SELECT e.user_id, MIN(e.ts) AS c1
             FROM events e JOIN s ON e.user_id = s.user_id
             WHERE e.event_type = 'click'
               AND e.ts > s.s1 AND e.ts <= s.s1 + INTERVAL '72' HOUR
             GROUP BY e.user_id),
       p AS (SELECT e.user_id, MIN(e.ts) AS p1
             FROM events e JOIN c ON e.user_id = c.user_id
             WHERE e.event_type = 'purchase'
               AND e.ts > c.c1 AND e.ts <= c.c1 + INTERVAL '72' HOUR
             GROUP BY e.user_id),
       n AS (SELECT (SELECT COUNT(*) FROM s) AS n_s,
                    (SELECT COUNT(*) FROM c) AS n_c,
                    (SELECT COUNT(*) FROM p) AS n_p)
       SELECT '1_signup' AS stage, n_s AS n_users,
              ROUND(1.0, 6) AS conv_from_prev FROM n
       UNION ALL SELECT '2_click_72h', n_c,
              ROUND(n_c * 1.0 / NULLIF(n_s, 0), 6) FROM n
       UNION ALL SELECT '3_purchase_72h', n_p,
              ROUND(n_p * 1.0 / NULLIF(n_c, 0), 6) FROM n
       ORDER BY stage""",
    doc="Time-bound conversion funnel: each stage must occur within 72 "
        "hours of the PREVIOUS stage's qualifying event (q75 is the "
        "unbounded variant) — the attribution-window form every growth "
        "team actually reports, with per-stage conversion rates as "
        "exact-count ratios. Same scale shape as q75: chained "
        "conditional min-ts aggregations, every shuffle hashed on "
        "user_id, each stage's frame shrinking monotonically; the "
        "window bound is a residual predicate on the co-partitioned "
        "join, costing nothing extra.",
)
def q94(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    win = F.expr("INTERVAL 72 HOURS")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter((F.col("ts") > F.col("s1")) & (F.col("ts") <= F.col("s1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter((F.col("ts") > F.col("c1")) & (F.col("ts") <= F.col("c1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p1"))
    )
    n = (
        s.agg(F.count("*").alias("n_s"))
        .crossJoin(F.broadcast(c.agg(F.count("*").alias("n_c"))))
        .crossJoin(F.broadcast(p.agg(F.count("*").alias("n_p"))))
    )
    one = n.select(
        F.lit("1_signup").alias("stage"),
        F.col("n_s").alias("n_users"),
        F.round(F.lit(1.0), 6).alias("conv_from_prev"),
    )
    two = n.select(
        F.lit("2_click_72h"),
        F.col("n_c"),
        F.round(F.col("n_c") * 1.0 / F.nullif("n_s", F.lit(0)), 6),
    )
    three = n.select(
        F.lit("3_purchase_72h"),
        F.col("n_p"),
        F.round(F.col("n_p") * 1.0 / F.nullif("n_c", F.lit(0)), 6),
    )
    return one.unionAll(two).unionAll(three).orderBy("stage")


@register(
    "q95_cusum_shift",
    """WITH hourly AS (
         SELECT event_type,
                CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_idx,
                COUNT(*) AS n
         FROM events GROUP BY 1, 2),
       tot AS (
         SELECT event_type, hour_idx, n,
                SUM(n) OVER (PARTITION BY event_type) AS t,
                COUNT(*) OVER (PARTITION BY event_type) AS b
         FROM hourly),
       pfx AS (
         SELECT event_type, hour_idx, t, b,
                SUM(b * n - t) OVER (PARTITION BY event_type
                                     ORDER BY hour_idx
                                     ROWS UNBOUNDED PRECEDING) AS p
         FROM tot),
       cs AS (
         SELECT event_type, hour_idx, t, b,
                p - LEAST(0, MIN(p) OVER (PARTITION BY event_type
                                          ORDER BY hour_idx
                                          ROWS UNBOUNDED PRECEDING)) AS s
         FROM pfx),
       mx AS (
         SELECT event_type, hour_idx, t, b, s,
                MAX(s) OVER (PARTITION BY event_type) AS max_s
         FROM cs)
       SELECT event_type,
              CAST(MAX(b) AS BIGINT) AS n_buckets,
              CAST(MAX(t) AS BIGINT) AS n_events,
              CAST(MAX(max_s) // MAX(b) AS BIGINT) AS max_excess_events,
              CAST(MIN(CASE WHEN s = max_s THEN hour_idx END) AS BIGINT)
                  AS peak_hour_idx,
              CAST(SUM(CASE WHEN s * 10 > b * t THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_alarm_hours
       FROM mx GROUP BY event_type ORDER BY event_type""",
    doc="CUSUM changepoint detection over per-type hourly rates, in the "
        "distributed-friendly closed form: the recursive "
        "S_i = max(0, S_{i-1} + x_i - k) (which looks inherently "
        "sequential) equals P_i - min(0, min prefix of P) for "
        "P = cumsum(x - k) — two ordered windows over the O(types x "
        "hours) pre-agg, no iteration, no UDF. All arithmetic is "
        "EXACT BIGINT (deviations scaled by the bucket count so the "
        "mean never becomes a float); the alarm is 'cumulative excess "
        "over the mean rate exceeds 10% of total traffic'. q83 flags "
        "single spiky hours; CUSUM catches slow sustained drifts those "
        "z-scores miss — the complementary monitoring alarm. Empty "
        "hours are absent observations (the q83 convention).",
)
def q95(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from goose_spark.operators.monitoring import hourly_counts

    h = hourly_counts(t(spark, sf, "events"))
    per_type = Window.partitionBy("event_type")
    ordered = (
        Window.partitionBy("event_type")
        .orderBy("hour_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = h.select(
        "event_type", "hour_idx", "n",
        F.sum("n").over(per_type).alias("t"),
        F.count("*").over(per_type).alias("b"),
    )
    pfx = tot.withColumn(
        "p", F.sum(F.col("b") * F.col("n") - F.col("t")).over(ordered)
    )
    cs = pfx.withColumn(
        "s", F.col("p") - F.least(F.lit(0), F.min("p").over(ordered))
    )
    mx = cs.withColumn("max_s", F.max("s").over(per_type))
    return (
        mx.groupBy("event_type")
        .agg(
            F.max("b").cast("long").alias("n_buckets"),
            F.max("t").cast("long").alias("n_events"),
            F.expr("MAX(max_s) div MAX(b)").cast("long").alias("max_excess_events"),
            F.min(F.when(F.col("s") == F.col("max_s"), F.col("hour_idx")))
            .cast("long").alias("peak_hour_idx"),
            F.sum(
                F.when(F.col("s") * 10 > F.col("b") * F.col("t"), 1).otherwise(0)
            ).cast("long").alias("n_alarm_hours"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q96 — linear multi-touch attribution
# ---------------------------------------------------------------------------

ATTR_WINDOW_H = 72  # lookback window per purchase

_Q96_ORACLE = f"""
WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts, value
           FROM events WHERE event_type = 'purchase'),
tch AS (SELECT user_id, ts AS t_ts, event_type AS channel
        FROM events WHERE event_type IN ('view', 'click')),
tp AS (SELECT p.p_id, p.value, tch.channel
       FROM p JOIN tch ON tch.user_id = p.user_id
        AND tch.t_ts < p.p_ts
        AND tch.t_ts >= p.p_ts - INTERVAL '{ATTR_WINDOW_H}' HOUR),
n AS (SELECT p_id, COUNT(*) AS n_t FROM tp GROUP BY p_id),
contrib AS (SELECT tp.channel, tp.p_id,
                   CAST(ROUND(tp.value / n.n_t, 6) AS DECIMAL(18,6)) AS c
            FROM tp JOIN n USING (p_id)),
direct AS (SELECT 'direct' AS channel, p.p_id,
                  CAST(ROUND(p.value, 6) AS DECIMAL(18,6)) AS c
           FROM p LEFT JOIN n ON n.p_id = p.p_id WHERE n.p_id IS NULL),
allc AS (SELECT * FROM contrib UNION ALL SELECT * FROM direct)
SELECT channel, COUNT(*) AS n_touchpoints,
       COUNT(DISTINCT p_id) AS n_purchases,
       ROUND(CAST(SUM(c) AS DOUBLE), 4) AS attributed_value
FROM allc GROUP BY channel ORDER BY channel"""


@register(
    "q96_linear_attribution",
    _Q96_ORACLE,
    doc=f"Linear multi-touch attribution: each purchase's value is split "
        f"evenly across every view/click touch in the preceding "
        f"{ATTR_WINDOW_H} h (touchless purchases attribute to 'direct'), "
        f"summed per channel — the marketing-attribution shape (q73's "
        f"as-of join is last-touch; this is the multi-touch generality). "
        f"Scale shape: the touch join is user_id-hashed with the window "
        f"bound as a residual predicate (q74/q94's banded-join form, "
        f"bounded per user-activity window, never time-cross); the "
        f"per-purchase touch count is one p_id hash-agg; contributions "
        f"round to DECIMAL(18,6) BEFORE summation, so the per-channel "
        f"totals are order-independent and hash-match at any "
        f"parallelism.",
)
def q96(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    win = F.expr(f"INTERVAL {ATTR_WINDOW_H} HOURS")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id",
        F.col("ts").alias("p_ts"), "value",
    )
    tch = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    tp = (
        p.join(tch, "user_id")
        .filter(
            (F.col("t_ts") < F.col("p_ts"))
            & (F.col("t_ts") >= F.col("p_ts") - win)
        )
        .select("p_id", "value", "channel")
    )
    n = tp.groupBy("p_id").agg(F.count("*").alias("n_t"))
    contrib = tp.join(n, "p_id").select(
        "channel", "p_id",
        F.round(F.col("value") / F.col("n_t"), 6)
        .cast("decimal(18,6)").alias("c"),
    )
    direct = (
        p.join(n, "p_id", "left_anti")
        .select(
            F.lit("direct").alias("channel"),
            "p_id",
            F.round(F.col("value"), 6).cast("decimal(18,6)").alias("c"),
        )
    )
    return (
        contrib.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.count("*").alias("n_touchpoints"),
            F.count_distinct("p_id").alias("n_purchases"),
            F.round(F.sum("c").cast("double"), 4).alias("attributed_value"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# q98 — time-decayed engagement score (half-life recency weighting)
# ---------------------------------------------------------------------------

DECAY_TOPK = 100  # report size (TakeOrdered funnel, O(k) to the driver)

_Q98_ORACLE = f"""
WITH horizon AS (SELECT MAX(CAST(ts AS DATE)) AS h FROM events),
w AS (SELECT user_id,
             DATE_DIFF('day', CAST(ts AS DATE), h) AS age_d,
             CAST(ROUND((CASE WHEN event_type = 'purchase'
                              THEN value
                              ELSE value * CAST(0.1 AS DOUBLE) END)
                        / CAST(CAST(1 AS BIGINT)
                               << LEAST(DATE_DIFF('day', CAST(ts AS DATE), h), 60)
                               AS DOUBLE), 6)
                  AS DECIMAL(18,6)) AS contrib
      FROM events, horizon)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(MIN(age_d) AS BIGINT) AS freshest_d,
       ROUND(CAST(SUM(contrib) AS DOUBLE), 4) AS score
FROM w GROUP BY user_id
ORDER BY score DESC, user_id LIMIT {DECAY_TOPK}"""


@register(
    "q98_decayed_engagement",
    _Q98_ORACLE,
    doc="Recency-weighted engagement score per user with a 1-day "
        "half-life: each event contributes value x 2^(-age_days) "
        "(purchases at full weight, other events at 10%), the feature-"
        "store recency feature every ranking/churn model consumes. "
        "Hash-match despite float weights: the decay factor is an EXACT "
        "power of two (1 / (1 << age), never a transcendental pow), the "
        "age exponent is an integer day difference, and per-event "
        "contributions round to DECIMAL(18,6) BEFORE the sum, so the "
        "per-user total is order-independent at any parallelism (q96's "
        "trick). Plan: one user_id hash-agg over arithmetic-only "
        "columns with the 1-row horizon broadcast; top-k is a "
        "TakeOrdered funnel. At 100 TB the agg is map-side-combinable "
        "and the horizon would come from partition stats.",
)
def q98(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    horizon = e.agg(F.max(F.col("ts").cast("date")).alias("h"))
    age = F.datediff(F.col("h"), F.col("ts").cast("date"))
    # exact binary weight: contributions below 2^-60 round to 0 at the
    # 6-decimal quantum anyway, and the shift stays inside a long
    den = F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), "
        "CAST(least(datediff(h, CAST(ts AS DATE)), 60) AS INT)) AS DOUBLE)"
    )
    base = F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
        F.col("value") * F.lit(0.1)
    )
    contrib = F.round(base / den, 6).cast("decimal(18,6)")
    return (
        e.join(F.broadcast(horizon))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(age).cast("long").alias("freshest_d"),
            F.round(F.sum(contrib).cast("double"), 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), "user_id")
        .limit(DECAY_TOPK)
    )


# ---------------------------------------------------------------------------
# q99 — churn cohorts (inactivity x spend-tier lifecycle grid)
# ---------------------------------------------------------------------------

_Q99_ORACLE = """
WITH horizon AS (SELECT MAX(ts) AS h FROM events),
u AS (SELECT user_id,
             MAX(ts) AS last_ts,
             COUNT(*) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(ROUND(value, 6) AS DECIMAL(18,6))
                           ELSE CAST(0 AS DECIMAL(18,6)) END)
                  AS DECIMAL(18,6)) AS ltv
      FROM events GROUP BY user_id),
g AS (SELECT user_id, n_events, ltv,
             (epoch_us(h) - epoch_us(last_ts)) // 3600000000 AS idle_h
      FROM u, horizon)
SELECT CASE WHEN idle_h <= 6 THEN 'active'
            WHEN idle_h <= 24 THEN 'lapsing' ELSE 'churned' END AS lifecycle,
       CASE WHEN ltv >= 900 THEN 'whale'
            WHEN ltv >= 500 THEN 'regular' ELSE 'casual' END AS spend_tier,
       COUNT(*) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(n_events) AS BIGINT) // COUNT(*) AS events_per_user,
       ROUND(CAST(SUM(ltv) AS DOUBLE), 4) AS cohort_ltv
FROM g GROUP BY 1, 2 ORDER BY lifecycle, spend_tier"""


@register(
    "q99_churn_cohorts",
    _Q99_ORACLE,
    doc="Lifecycle-cohort grid: users bucketed by inactivity age (hours "
        "since last event vs the corpus horizon: active/lapsing/churned) "
        "x purchase-LTV spend tier (casual/regular/whale), with "
        "per-cohort event volume and LTV — the churn dashboard every "
        "retention team reads. Two map-side-combinable hash-aggs "
        "(per-user max/count/sum, then the 9-cell cohort rollup) with "
        "the 1-row horizon broadcast between them; LTV rounds to "
        "DECIMAL(18,6) per event before summation so cohort totals "
        "hash-match at any parallelism; events_per_user is exact "
        "integer floor division (DuckDB // == Spark div). Inactivity age is exact "
        "epoch-microsecond integer arithmetic (floor hours), identical on "
        "both engines — never calendar boundary-crossing date_diff.",
)
def q99(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    horizon = e.agg(F.max("ts").alias("h"))
    purchase_val = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value"), 6).cast("decimal(18,6)"),
    ).otherwise(F.lit(0).cast("decimal(18,6)"))
    u = e.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").alias("n_events"),
        F.sum(purchase_val).cast("decimal(18,6)").alias("ltv"),
    )
    idle_h = F.expr("(unix_micros(h) - unix_micros(last_ts)) div 3600000000")
    lifecycle = (
        F.when(idle_h <= 6, "active")
        .when(idle_h <= 24, "lapsing")
        .otherwise("churned")
    )
    tier = (
        F.when(F.col("ltv") >= 900, "whale")
        .when(F.col("ltv") >= 500, "regular")
        .otherwise("casual")
    )
    return (
        u.join(F.broadcast(horizon))
        .groupBy(lifecycle.alias("lifecycle"), tier.alias("spend_tier"))
        .agg(
            F.count("*").alias("n_users"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.expr("CAST(SUM(n_events) AS BIGINT) div COUNT(*)").alias(
                "events_per_user"
            ),
            F.round(F.sum("ltv").cast("double"), 4).alias("cohort_ltv"),
        )
        .orderBy("lifecycle", "spend_tier")
    )
