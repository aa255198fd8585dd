"""Sessionization and as-of operators over the events table — the
batch-form twins of the streaming session windows, plus the gap-table
as-of join (SURVEY §2.5 row 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from goose_spark.queries.base import register, t

GAP_MIN = 30  # session gap, minutes


@register(
    "q30_sessionization_batch",
    f"""WITH flagged AS (
          SELECT user_id, event_id, ts, value,
                 CASE WHEN ts - LAG(ts) OVER w > INTERVAL '{GAP_MIN}' MINUTE
                      OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sessions AS (
          SELECT user_id, event_id, value,
                 SUM(new_session) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
        FROM sessions GROUP BY user_id, session_id
        ORDER BY user_id, session_id""",
    doc="Batch sessionization (gaps-and-islands): lag-gap flag → running "
        "sum = session id → per-session aggregate. The batch twin of "
        "streaming.events.session_windows; one window + one agg shuffle, "
        "both on user_id.",
)
def q30(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    new_session = F.when(
        F.lag("ts").over(w).isNull() | (gap > GAP_MIN * 60), 1
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        e.select("user_id", "event_id", "ts", "value", new_session.alias("new_session"))
        .select("user_id", "event_id", "value",
                F.sum("new_session").over(run).cast("long").alias("session_id"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double").alias("total"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "q31_asof_last_error",
    """WITH prior AS (
         SELECT user_id, event_id, ts, event_type,
                MAX(CASE WHEN event_type = 'error' THEN ts END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_error_ts
         FROM events)
       SELECT user_id, event_id,
              CAST(FLOOR((FLOOR(epoch(ts)) - FLOOR(epoch(last_error_ts))) / 60) AS BIGINT)
                AS min_since_error
       FROM prior
       WHERE event_type = 'purchase' AND last_error_ts IS NOT NULL
       ORDER BY user_id, event_id LIMIT 200""",
    doc="As-of join expressed as a running MAX over prior rows: for each "
        "purchase, the most recent preceding error of the same user — the "
        "single-pass window formulation of point-in-time correctness "
        "(no range-join explosion; sorts once per user).",
)
def q31(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_error = F.max(
        F.when(F.col("event_type") == "error", F.col("ts"))
    ).over(w)
    return (
        e.select("user_id", "event_id", "ts", "event_type", last_error.alias("last_error_ts"))
        .filter((F.col("event_type") == "purchase") & F.col("last_error_ts").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.floor(
                (F.col("ts").cast("long") - F.col("last_error_ts").cast("long")) / 60
            ).cast("long").alias("min_since_error"),
        )
        .orderBy("user_id", "event_id")
        .limit(200)
    )


@register(
    "q52_retention_cohorts",
    """WITH f AS (
         SELECT user_id, CAST(MIN(date_trunc('week', ts)) AS DATE) AS cohort
         FROM events GROUP BY user_id),
       a AS (
         SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
         FROM events),
       sz AS (SELECT cohort, COUNT(*) AS cohort_size FROM f GROUP BY cohort)
       SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_wk,
              CAST(date_diff('day', f.cohort, a.wk) / 7 AS BIGINT) AS week_offset,
              COUNT(DISTINCT a.user_id) AS n_users,
              ROUND(CAST(COUNT(DISTINCT a.user_id) AS DOUBLE) / ANY_VALUE(sz.cohort_size), 4)
                AS retention
       FROM f JOIN a ON a.user_id = f.user_id
       JOIN sz ON sz.cohort = f.cohort
       GROUP BY f.cohort, week_offset
       ORDER BY cohort_wk, week_offset""",
    doc="Weekly retention cohorts over the events stream: cohort = first "
        "active ISO week per user, retention = distinct users active at "
        "each week offset over cohort size — the engagement matrix every "
        "product pipeline ships. Two shuffles on user_id (first-touch agg "
        "+ distinct active weeks) and one tiny (cohort × offset) agg; "
        "week alignment makes the day-diff an exact multiple of 7 on "
        "both engines.",
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    f = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).cast("date").alias("cohort")
    )
    a = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    sz = f.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    return (
        f.join(a, "user_id")
        .join(F.broadcast(sz), "cohort")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_wk"),
            F.expr("CAST(datediff(wk, cohort) DIV 7 AS BIGINT)").alias("week_offset"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.round(
                F.countDistinct("user_id").cast("double") / F.first("cohort_size"), 4
            ).alias("retention"),
        )
        .orderBy("cohort_wk", "week_offset")
    )


@register(
    "q57_sliding_window",
    """WITH b AS (SELECT time_bucket(INTERVAL '30 minutes', ts,
                                     TIMESTAMP '1970-01-01 00:00:00') AS b30,
                         event_type, value
                  FROM events),
        w AS (SELECT unnest([b30, b30 - INTERVAL '30 minutes']) AS w_start,
                     event_type, value
              FROM b)
       SELECT w_start, event_type, COUNT(*) AS n,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
                AS total
       FROM w GROUP BY w_start, event_type ORDER BY w_start, event_type""",
    doc="Sliding (hop) windows, batch form: 1-hour windows every 30 "
        "minutes over events — the batch twin of Structured Streaming's "
        "F.window(ts, '1 hour', '30 minutes') hop aggregation "
        "(streaming/events.py uses the same operator on the live path). "
        "Spark expands each event into width/hop = 2 window rows then "
        "hash-aggregates; the oracle derives both epoch-aligned hops "
        "per event explicitly. One map-side-combinable shuffle on "
        "(window, event_type) at any scale.",
)
def q57(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total"),
        )
        .select(
            F.col("w.start").alias("w_start"), "event_type", "n", "total"
        )
        .orderBy("w_start", "event_type")
    )


@register(
    "q73_asof_join",
    """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
            v AS (SELECT * FROM events WHERE event_type = 'view')
       SELECT p.user_id, p.event_id,
              v.event_id AS view_event_id,
              CAST(FLOOR(epoch(p.ts)) - FLOOR(epoch(v.ts)) AS BIGINT)
                AS secs_since_view
       FROM p ASOF LEFT JOIN v
         ON p.user_id = v.user_id AND v.ts <= p.ts
       ORDER BY p.user_id, p.event_id""",
    doc="TWO-TABLE as-of join (operators/asof.py): every purchase gets "
        "the user's latest preceding view — the merge_asof/ASOF-JOIN/aj "
        "temporal primitive Spark lacks. Union + one key shuffle + one "
        "per-key sort + running last(struct) window: O(n log n) per key "
        "with NO range-join candidate explosion, left-join null on no "
        "match. DuckDB's native ASOF LEFT JOIN is the oracle.",
)
def q73(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.asof import asof_join

    e = t(spark, sf, "events")
    p = e.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_event_id"), "ts"
    )
    j = asof_join(p, v, on="user_id", right_cols=["view_event_id"])
    return (
        j.select(
            "user_id",
            "event_id",
            "view_event_id",
            (F.col("ts").cast("long") - F.col("ts_right").cast("long"))
            .cast("long").alias("secs_since_view"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# q92 — native session_window API (the Structured Streaming session
# operator, exercised in batch and pinned against the SQL islands form)
# ---------------------------------------------------------------------------

#: q92 gap: the synthetic users emit ~67 events over 30 days (median
#: inter-event gap ≈ 7.3 h), so an 8-hour gap produces a real mix of
#: single- and multi-event sessions; q30's 30-minute gap would make
#: nearly every session a singleton here.
Q92_GAP_HOURS = 8

_Q92_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= INTERVAL '{Q92_GAP_HOURS}' HOUR
              THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged),
per AS (
  SELECT user_id, sid, COUNT(*) AS n_events,
         epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
  FROM sessions GROUP BY user_id, sid)
SELECT CAST(LEAST(n_events, 5) AS INT) AS n_events_bucket,
       COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS total_events,
       ROUND(SUM(dur_us) * 1.0 / COUNT(*) / 1000000, 6) AS avg_duration_sec
FROM per GROUP BY 1 ORDER BY n_events_bucket"""


@register(
    "q92_session_window",
    _Q92_ORACLE,
    doc=f"Native session_window (the Structured Streaming session "
        f"operator, batch-run): per-user {Q92_GAP_HOURS}-hour-gap "
        f"sessions via F.session_window — Spark's built-in interval "
        f"merge — summarized as a session-length histogram with exact "
        f"integer-microsecond durations. The DuckDB oracle derives the "
        f"SAME sessions with the gaps-and-islands SQL (q30's form), so "
        f"the two independent session constructions cross-check each "
        f"other bit-for-bit: a semantics drift in either (strict-vs-"
        f"non-strict gap, boundary merge) breaks the hash. Plan: one "
        f"user_id shuffle feeds the SessionWindow aggregate, then the "
        f"stream collapses to O(sessions) rows.",
)
def q92(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events").select("user_id", "ts")
    per = (
        e.groupBy(
            F.session_window("ts", f"{Q92_GAP_HOURS} hours"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
        )
    )
    return (
        per.groupBy(F.least("n_events", F.lit(5)).cast("int").alias("n_events_bucket"))
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("total_events"),
            F.round(F.sum("dur_us") * 1.0 / F.count("*") / 1000000, 6)
            .alias("avg_duration_sec"),
        )
        .orderBy("n_events_bucket")
    )


# ---------------------------------------------------------------------------
# q93 — SCD2-style state-interval compression (dimension history build)
# ---------------------------------------------------------------------------

_Q93_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, event_type AS state, ts,
         CASE WHEN LAG(event_type) OVER w IS NULL
                   OR event_type <> LAG(event_type) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
grp AS (
  SELECT user_id, state, ts,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS g
  FROM seq),
iv AS (
  SELECT user_id, MIN(state) AS state, MIN(ts) AS valid_from,
         COUNT(*) AS n_events
  FROM grp GROUP BY user_id, g),
scd AS (
  SELECT user_id, state, valid_from, n_events,
         LEAD(valid_from) OVER (PARTITION BY user_id
                                ORDER BY valid_from) AS valid_to
  FROM iv)
SELECT state,
       COUNT(*) AS n_intervals,
       CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_current,
       CAST(SUM(n_events) AS BIGINT) AS total_events,
       ROUND(SUM(CASE WHEN valid_to IS NOT NULL
                      THEN epoch_us(valid_to) - epoch_us(valid_from)
                      ELSE 0 END) * 1.0
             / NULLIF(SUM(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END), 0)
             / 1000000, 6) AS avg_closed_duration_sec
FROM scd GROUP BY state ORDER BY state"""


@register(
    "q93_state_intervals",
    _Q93_ORACLE,
    doc="SCD2 dimension-history build (state-interval compression): "
        "each user's event-type sequence collapses into change-point "
        "intervals [valid_from, valid_to) with the open interval as the "
        "current state — the slowly-changing-dimension type-2 construction "
        "every warehouse runs, distinct from q30's gap sessions (state "
        "CHANGE, not time gap, starts an interval) and q69's calendar "
        "islands. Exact integer-microsecond durations; summarized per "
        "state so the output is O(states). Plan: one user_id shuffle "
        "feeds both window passes (change flag + interval lead share "
        "the partitioning), then an O(states) aggregate.",
)
def q93(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("event_type").over(w).isNull()
        | (F.col("event_type") != F.lag("event_type").over(w)),
        1,
    ).otherwise(0)
    grp = (
        e.withColumn("chg", chg)
        .withColumn(
            "g",
            F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    iv = grp.groupBy("user_id", "g").agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    wl = Window.partitionBy("user_id").orderBy("valid_from")
    scd = iv.withColumn("valid_to", F.lead("valid_from").over(wl))
    closed = F.col("valid_to").isNotNull()
    dur_us = F.unix_micros("valid_to") - F.unix_micros("valid_from")
    return (
        scd.groupBy("state")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum(F.when(~closed, 1).otherwise(0)).cast("long").alias("n_current"),
            F.sum("n_events").cast("long").alias("total_events"),
            F.round(
                F.sum(F.when(closed, dur_us).otherwise(0)) * 1.0
                / F.nullif(F.sum(closed.cast("long")), F.lit(0))
                / 1000000,
                6,
            ).alias("avg_closed_duration_sec"),
        )
        .orderBy("state")
    )
