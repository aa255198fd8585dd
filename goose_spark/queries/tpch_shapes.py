"""TPC-H-shaped analytical queries (Q3 / Q10 / Q18 silhouettes on the
testdata's column subset) — the canonical decision-support shapes:
selective fact join + top-k, returned-item revenue attribution, and a
having-filtered semi-join on an aggregate."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goose_spark.queries.base import register, t

_DEC = "decimal(18,2)"


@register(
    "q37_shipping_priority",
    """SELECT l.l_orderkey,
              CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2)
                   AS DOUBLE) AS revenue,
              o.o_orderdate
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
         AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
         AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
       GROUP BY l.l_orderkey, o.o_orderdate
       ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""",
    doc="TPC-H Q3 shape: segment+date-selective joins, revenue per order, "
        "top-10. Both date predicates push to the scans; customer filter "
        "shrinks the build side before the fact join.",
)
def q37(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        t(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    revenue = F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount").cast(_DEC))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        # exact decimal sum internally; final money column to double so both
        # engines render identically on the driver's pandas canonicalization
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q38_returned_items",
    """SELECT c.c_custkey, c.c_name, n.n_name,
              CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2)
                   AS DOUBLE) AS revenue
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       WHERE l.l_returnflag = 'R'
       GROUP BY c.c_custkey, c.c_name, n.n_name
       ORDER BY revenue DESC, c_custkey LIMIT 20""",
    doc="TPC-H Q10 shape: returned-item revenue attribution per customer "
        "(broadcast nation; returnflag pushed to the lineitem scan).",
)
def q38(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select("c_custkey", "c_name", "c_nationkey")
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = (
        t(spark, sf, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    n = F.broadcast(t(spark, sf, "nation").select("n_nationkey", "n_name"))
    revenue = F.col("l_extendedprice").cast(_DEC) * (F.lit(1) - F.col("l_discount").cast(_DEC))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q39_large_quantity_orders",
    """SELECT o.o_orderkey, o.o_orderdate,
              CAST(ROUND(o.o_totalprice, 2) AS DOUBLE) AS total,
              CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
       FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE o.o_orderkey IN (
         SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
         HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
       GROUP BY o.o_orderkey, o.o_orderdate, o.o_totalprice
       ORDER BY qty DESC, o_orderkey LIMIT 20""",
    doc="TPC-H Q18 shape: IN over a HAVING-filtered aggregate. The IN "
        "subquery's sum IS the output qty (orderkey is unique in "
        "orders), so the plan computes the per-order aggregate once, "
        "filters it, and joins orders to the survivors — one lineitem "
        "scan and one shuffle instead of the literal semi-join form's "
        "two of each.",
)
def q39(spark: SparkSession, sf: str) -> DataFrame:
    # the HAVING filter and the output aggregate are the SAME per-order
    # quantity sum (o_orderkey is unique in orders, so grouping the
    # joined rows by (okey, date, totalprice) degenerates to the
    # per-orderkey sum): compute it once and join orders to the
    # filtered aggregate — one lineitem scan + one shuffle instead of
    # the semi-join form's two of each (optimization r14, guide §2.2;
    # oracle equivalence is exact, not approximate)
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate", "o_totalprice")
    per = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("q"))
        .filter(F.col("q") > 150)
    )
    return (
        o.join(per, o.o_orderkey == per.l_orderkey)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).cast("double").alias("total"),
            F.col("q").cast("double").alias("qty"),
        )
        .orderBy(F.col("qty").desc(), "o_orderkey")
        .limit(20)
    )
