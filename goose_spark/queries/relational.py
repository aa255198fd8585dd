"""Relational query inventory Q1–Q22 (SURVEY.md §2.6).

These exercise the classical-operator surface the reference lacks
(SURVEY §2.5 gap table) over the driver testdata star schema. Every
builder is declarative DataFrame API — Catalyst supplies pushdown,
pruning, join selection; explicit ``broadcast()`` hints mark the
dimension sides that must never shuffle at 100 TB (region/nation are
KBs at any scale factor; per-group aggregates are bounded by key
cardinality, not data volume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from goose_spark.queries.base import register, t

_DEC = "decimal(18,2)"


# --------------------------------------------------------------------------
# scans / filters
# --------------------------------------------------------------------------

@register(
    "q01_scan_project_limit",
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
       ORDER BY l_orderkey, l_linenumber LIMIT 100""",
    doc="Scan + projection + total-order LIMIT. Column pruning reaches the "
        "parquet reader (ReadSchema shows 3 cols).",
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@register(
    "q02_filter_conjunctive",
    """SELECT l_orderkey, l_linenumber FROM lineitem
       WHERE l_quantity > 30 AND l_returnflag = 'R'
       ORDER BY l_orderkey, l_linenumber""",
    doc="Conjunctive numeric+string predicate; both pushed to parquet "
        "(PushedFilters: GreaterThan, EqualTo).",
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "lineitem")
        .filter((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# aggregation
# --------------------------------------------------------------------------

@register(
    "q03_hash_agg_tpch_q1",
    """SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
              COUNT(*) AS cnt
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
    doc="TPC-H Q1 shape: partial (map-side) agg + final agg after a shuffle "
        "on a 6-value key — shuffle volume is O(groups), not O(rows). "
        "Decimal cast pre-aggregation keeps sums exact across engines.",
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # exact decimal sum internally; final cast to double so both
            # engines render identically under pandas canonicalization
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("sum_price"),
            F.count("*").alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q04_group_having_count_distinct",
    """SELECT o_orderpriority, COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS custs
       FROM orders GROUP BY o_orderpriority
       HAVING COUNT(*) > 10 ORDER BY o_orderpriority""",
    doc="GROUP BY + HAVING + COUNT DISTINCT (expand + two-phase agg).",
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.countDistinct("o_custkey").alias("custs"))
        .filter(F.col("n") > 10)
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------

@register(
    "q05_inner_equijoin",
    """SELECT c.c_mktsegment, COUNT(*) AS n
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",
    doc="Hash equi-join; AQE picks broadcast when customer fits the "
        "threshold, shuffled-hash/SMJ beyond it.",
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .orderBy("c_mktsegment")
    )


@register(
    "q06_multiway_join_agg",
    """SELECT n.n_name,
              CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2)
                   AS DOUBLE) AS revenue
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       WHERE r.r_name = 'ASIA'
       GROUP BY n.n_name ORDER BY n.n_name""",
    doc="TPC-H Q5 shape. region/nation broadcast (bytes at any SF); the "
        "region filter prunes nations *before* the fact join, so the big "
        "lineitem⋈orders join is the only large shuffle.",
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    nations = broadcast(n.join(broadcast(r), n.n_regionkey == r.r_regionkey).select("n_nationkey", "n_name"))
    cust = c.join(nations, c.c_nationkey == nations.n_nationkey).select("c_custkey", "n_name")
    revenue = F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount").cast(_DEC))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .orderBy("n_name")
    )


@register(
    "q07_left_outer_join",
    """SELECT c.c_custkey, COALESCE(COUNT(o.o_orderkey), 0) AS n_orders
       FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       GROUP BY c.c_custkey ORDER BY n_orders DESC, c.c_custkey LIMIT 50""",
    doc="Left outer join + null-safe count, expressed as aggregate-then-"
        "join: orders collapses to one row per custkey BEFORE the join, so "
        "the join moves |distinct custkeys| rows instead of |orders| rows. "
        "Catalyst does not rewrite join-then-aggregate into this cheaper "
        "form automatically, so the plan states it.",
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select("c_custkey")
    per_cust = (
        t(spark, sf, "orders")
        .select("o_custkey")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("_cnt"))
    )
    return (
        c.join(per_cust, per_cust.o_custkey == c.c_custkey, "left")
        .select("c_custkey", F.coalesce(F.col("_cnt"), F.lit(0)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "c_custkey")
        .limit(50)
    )


@register(
    "q08_semi_anti_join",
    """SELECT (SELECT COUNT(*) FROM customer c
               WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS with_orders,
              (SELECT COUNT(*) FROM customer c
               WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS without_orders""",
    doc="Left-semi and left-anti joins (EXISTS / NOT EXISTS decorrelation).",
)
def q08(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select("c_custkey")
    o = t(spark, sf, "orders").select("o_custkey")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(F.count("*").alias("with_orders"))
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(F.count("*").alias("without_orders"))
    return semi.crossJoin(anti)


@register(
    "q09_range_join",
    """SELECT COUNT(*) AS n
       FROM lineitem l JOIN orders o
         ON l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL '60' DAY""",
    doc="Equi-key + range residual: executes as a hash join on l_orderkey "
        "with the interval predicate as a post-join filter — no cartesian.",
)
def q09(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return li.join(o, cond).agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# window functions
# --------------------------------------------------------------------------

@register(
    "q10_window_row_number",
    """SELECT * FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) t
       WHERE rn <= 3 ORDER BY o_custkey, rn LIMIT 200""",
    doc="Top-k per key. Spark 3.5+/4.x inserts WindowGroupLimit: the rn<=3 "
        "filter is pushed below the sort so each partition keeps 3 rows "
        "pre-shuffle — this is the scalable per-key top-k.",
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        t(spark, sf, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
        .limit(200)
    )


@register(
    "q11_window_running_sum",
    """SELECT o_custkey, o_orderkey,
              ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
       FROM orders ORDER BY o_custkey, o_orderkey LIMIT 200""",
    doc="Running-sum frame; sequential accumulation order is pinned by the "
        "total ORDER BY inside each partition, so doubles agree with the "
        "oracle bit-for-bit.",
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t(spark, sf, "orders")
        .select("o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running"))
        .orderBy("o_custkey", "o_orderkey")
        .limit(200)
    )


@register(
    "q12_window_lag",
    """SELECT user_id, event_id,
              ROUND(value - LAG(value) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id), 4) AS delta
       FROM events ORDER BY user_id, event_id LIMIT 200""",
    doc="LAG with deterministic ordering; first row per user yields NULL.",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf, "events")
        .select("user_id", "event_id", F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta"))
        .orderBy("user_id", "event_id")
        .limit(200)
    )


# --------------------------------------------------------------------------
# grouping sets / set ops
# --------------------------------------------------------------------------

@register(
    "q13_rollup",
    """SELECT r.r_name, n.n_name, COUNT(*) AS n
       FROM customer c
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY ROLLUP (r.r_name, n.n_name)
       ORDER BY r.r_name NULLS FIRST, n.n_name NULLS FIRST""",
    doc="ROLLUP over broadcast-joined dims (Expand + single shuffle).",
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select("c_nationkey")
    n = broadcast(t(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey"))
    r = broadcast(t(spark, sf, "region"))
    joined = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("r_name", "n_name")
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


@register(
    "q14_union_all",
    """SELECT nk, COUNT(*) AS n FROM (
         SELECT c_nationkey AS nk FROM customer
         UNION ALL
         SELECT s_nationkey AS nk FROM supplier) t
       GROUP BY nk ORDER BY nk""",
    doc="UNION ALL then aggregate — no dedup shuffle, one agg shuffle.",
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionAll(s).groupBy("nk").agg(F.count("*").alias("n")).orderBy("nk")


@register(
    "q15_intersect_except",
    """SELECT 'both' AS tag, COUNT(*) AS n FROM (
         SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier) t
       UNION ALL
       SELECT 'cust_only' AS tag, COUNT(*) AS n FROM (
         SELECT c_nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier) t2
       ORDER BY tag""",
    doc="INTERSECT / EXCEPT — Catalyst plans them as semi/anti joins over "
        "distinct inputs.",
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select("c_nationkey")
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("c_nationkey"))
    both = c.intersect(s).agg(F.count("*").alias("n")).select(F.lit("both").alias("tag"), "n")
    cust_only = c.subtract(s).agg(F.count("*").alias("n")).select(
        F.lit("cust_only").alias("tag"), "n"
    )
    return both.unionAll(cust_only).orderBy("tag")


# --------------------------------------------------------------------------
# scalar function coverage
# --------------------------------------------------------------------------

@register(
    "q16_string_functions",
    """SELECT p_brand, COUNT(*) AS n,
              MIN(UPPER(SUBSTR(p_name, 1, 5))) AS first5,
              MAX(LENGTH(p_name)) AS maxlen
       FROM part WHERE LOWER(p_type) LIKE '%brass%'
       GROUP BY p_brand ORDER BY p_brand""",
    doc="String function coverage (UPPER/LOWER/SUBSTR/LENGTH/LIKE); all "
        "whole-stage-codegen expressions.",
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "part")
        .filter(F.lower(F.col("p_type")).like("%brass%"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.min(F.upper(F.substring("p_name", 1, 5))).alias("first5"),
            F.max(F.length("p_name")).cast("long").alias("maxlen"),
        )
        .orderBy("p_brand")
    )


@register(
    "q17_date_functions",
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
              CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
              COUNT(*) AS n
       FROM orders GROUP BY 1, 2 ORDER BY y, m""",
    doc="Date part extraction + aggregate.",
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("y"),
            F.month("o_orderdate").cast("long").alias("m"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("y", "m")
    )


@register(
    "q18_math_case_conditional_agg",
    """SELECT l_returnflag,
              CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS hi_disc,
              ROUND(CAST(SUM(ABS(CAST(l_extendedprice AS DECIMAL(18,2))
                                 * CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
                    / COUNT(*), 2) AS avg_tax_amt,
              MAX(l_orderkey % 7) AS mod7
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    doc="CASE + conditional agg + modulo. The average is computed as "
        "exact-decimal-sum / count so both engines divide identical doubles.",
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    tax_amt = F.abs(F.col("l_extendedprice").cast(_DEC) * F.col("l_tax").cast(_DEC))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).cast("long").alias("hi_disc"),
            F.round(F.sum(tax_amt).cast("double") / F.count("*"), 2).alias("avg_tax_amt"),
            F.max(F.col("l_orderkey") % 7).alias("mod7"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q19_subqueries",
    """SELECT c_custkey, ROUND(c_acctbal, 2) AS bal
       FROM customer c
       WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
         AND c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                 / COUNT(*)
                          FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
       ORDER BY bal DESC, c_custkey LIMIT 100""",
    doc="IN-subquery (semi join) + correlated scalar subquery, decorrelated "
        "into a per-nation aggregate joined back (broadcast: 25 rows).",
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    nations = t(spark, sf, "nation").filter(F.col("n_regionkey") == 1).select("n_nationkey")
    avg_bal = broadcast(
        c.groupBy("c_nationkey").agg(
            (F.sum(F.col("c_acctbal").cast(_DEC)).cast("double") / F.count("*")).alias("nation_avg")
        ).withColumnRenamed("c_nationkey", "nk")
    )
    return (
        c.join(broadcast(nations), c.c_nationkey == nations.n_nationkey, "left_semi")
        .join(avg_bal, F.col("c_nationkey") == avg_bal.nk)
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", F.round("c_acctbal", 2).alias("bal"))
        .orderBy(F.col("bal").desc(), "c_custkey")
        .limit(100)
    )


@register(
    "q20_distinct_topk",
    """SELECT DISTINCT p_type FROM part ORDER BY p_type LIMIT 25""",
    doc="DISTINCT + sort + LIMIT (partial distinct map-side, TakeOrdered).",
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    return t(spark, sf, "part").select("p_type").distinct().orderBy("p_type").limit(25)


@register(
    "q21_tumbling_window_batch",
    """SELECT CAST(EXTRACT(YEAR FROM ts) AS BIGINT) AS y,
              CAST(EXTRACT(MONTH FROM ts) AS BIGINT) AS m,
              CAST(EXTRACT(DAY FROM ts) AS BIGINT) AS d,
              CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS h,
              event_type, COUNT(*) AS n,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
       FROM events GROUP BY 1,2,3,4,5 ORDER BY y, m, d, h, event_type""",
    doc="Batch-form tumbling window (hour buckets) over the events stream "
        "table; streaming form lives in goose_spark.streaming.",
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    return (
        e.groupBy(
            F.year("ts").cast("long").alias("y"),
            F.month("ts").cast("long").alias("m"),
            F.dayofmonth("ts").cast("long").alias("d"),
            F.hour("ts").cast("long").alias("h"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast(_DEC)), 2).cast("double").alias("total"),
        )
        .orderBy("y", "m", "d", "h", "event_type")
    )


@register(
    "q22_text_analysis_documents",
    """SELECT lang, source, COUNT(*) AS docs,
              ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 2) AS avg_chars,
              CAST(SUM(CASE WHEN LENGTH(text) >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS long_docs
       FROM documents GROUP BY lang, source ORDER BY lang, source""",
    doc="Text-stats aggregate over documents (exact integer sums → "
        "identical division on both engines).",
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count("*").alias("docs"),
            F.round(F.sum("n_chars").cast("double") / F.count("*"), 2).alias("avg_chars"),
            F.sum(F.when(F.length("text") >= 100, 1).otherwise(0)).cast("long").alias("long_docs"),
        )
        .orderBy("lang", "source")
    )
