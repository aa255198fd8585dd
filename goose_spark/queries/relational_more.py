"""Additional operator coverage: CUBE grouping sets, bag-semantics set
ops, edit-distance, calendar truncation, array-column statistics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goose_spark.queries.base import register, t


@register(
    "q32_cube",
    """SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY CUBE (c_mktsegment, o_orderpriority)
       ORDER BY c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST""",
    doc="CUBE grouping sets (all 4 groupings in one Expand + one shuffle).",
)
def q32(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders").select("o_custkey", "o_orderpriority")
    c = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .cube("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "q33_bag_set_ops",
    """SELECT 'intersect_all' AS tag, COUNT(*) AS n FROM (
         SELECT c_nationkey FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier) t
       UNION ALL
       SELECT 'except_all' AS tag, COUNT(*) AS n FROM (
         SELECT c_nationkey FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier) t2
       ORDER BY tag""",
    doc="Bag-semantics INTERSECT ALL / EXCEPT ALL (multiplicity-aware — "
        "complements q15's set semantics).",
)
def q33(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select("c_nationkey")
    s = t(spark, sf, "supplier").select(F.col("s_nationkey").alias("c_nationkey"))
    ia = c.intersectAll(s).agg(F.count("*").alias("n")).select(
        F.lit("intersect_all").alias("tag"), "n"
    )
    ea = c.exceptAll(s).agg(F.count("*").alias("n")).select(
        F.lit("except_all").alias("tag"), "n"
    )
    return ia.unionAll(ea).orderBy("tag")


@register(
    "q34_edit_distance",
    """SELECT p_brand,
              CAST(MIN(levenshtein(SUBSTR(p_name, 1, 12), LOWER(p_type))) AS BIGINT) AS min_dist,
              CAST(MAX(levenshtein(SUBSTR(p_name, 1, 12), LOWER(p_type))) AS BIGINT) AS max_dist
       FROM part GROUP BY p_brand ORDER BY p_brand""",
    doc="Edit-distance (levenshtein) — string-similarity primitive for "
        "fuzzy dedup; identical DP definition on both engines.",
)
def q34(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part")
    dist = F.levenshtein(F.substring("p_name", 1, 12), F.lower("p_type"))
    return (
        p.groupBy("p_brand")
        .agg(
            F.min(dist).cast("long").alias("min_dist"),
            F.max(dist).cast("long").alias("max_dist"),
        )
        .orderBy("p_brand")
    )


@register(
    "q35_date_trunc_week",
    """SELECT strftime(CAST(date_trunc('week', o_orderdate) AS DATE), '%Y-%m-%d') AS wk,
              COUNT(*) AS n,
              CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
       FROM orders GROUP BY 1 ORDER BY wk LIMIT 100""",
    doc="Calendar-week truncation (ISO Monday start on both engines) + "
        "weekly revenue — the reporting-rollup primitive.",
)
def q35(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return (
        # wk as a formatted string: DuckDB DATE round-trips through pandas
        # as datetime64 ('... 00:00:00') while Spark DateType stays date —
        # string on both sides removes the rendering asymmetry.
        o.groupBy(
            F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd").alias("wk")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total"),
        )
        .orderBy("wk")
        .limit(100)
    )


@register(
    "q36_array_stats",
    """SELECT label, COUNT(*) AS n,
              ROUND(CAST(AVG(embedding[1]) AS DOUBLE), 6) AS avg_dim0,
              ROUND(CAST(MIN(embedding[1]) AS DOUBLE), 6) AS min_dim0,
              ROUND(CAST(MAX(list_max(CAST(embedding AS DOUBLE[]))) AS DOUBLE), 6) AS max_any_dim
       FROM embeddings GROUP BY label ORDER BY label""",
    doc="Array-column statistics over embeddings (element access + "
        "array-max) — the profiling pass before similarity work.",
)
def q36(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "embeddings")
    dim0 = F.element_at("embedding", 1).cast("double")
    arr_max = F.array_max(F.transform("embedding", lambda v: v.cast("double")))
    return (
        e.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(dim0), 6).alias("avg_dim0"),
            F.round(F.min(dim0), 6).alias("min_dim0"),
            F.round(F.max(arr_max), 6).alias("max_any_dim"),
        )
        .orderBy("label")
    )
