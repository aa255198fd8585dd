"""TPC-H Q8/Q17/Q21/Q22 silhouettes adapted to the testdata's column
subset (no partsupp/commitdate/phone columns — see each doc for the
substitution). These complete the classic decision-support shapes the
round-5 inventory still lacked: market-share ratio-of-sums over a 6-way
join, a correlated per-group average decorrelated into one reusable
aggregate, the fact-table self-join with semi+anti semantics, and an
anti-join against a scalar threshold.

Hash-stability rules as everywhere (SURVEY §2.6): exact DECIMAL(18,2)
money math pre-aggregation, doubles only for final division/rounding,
total ORDER BY, identical aliases both engines. Correlated-average
comparisons are cross-multiplied (qty * 5 * cnt < sum) so both engines
compare exact decimals instead of engine-rounded divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from goose_spark.queries.base import register, t

_DEC = "decimal(18,2)"


def _money(col: str) -> F.Column:
    return F.col(col).cast(_DEC)


def _volume() -> F.Column:
    return _money("l_extendedprice") * (F.lit(1) - _money("l_discount"))


@register(
    "q53_market_share",
    """SELECT o_year,
              ROUND(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
                                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                    / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
       FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
                    CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
                    n2.n_name AS nation
             FROM part
             JOIN lineitem ON p_partkey = l_partkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation n1 ON c_nationkey = n1.n_nationkey
             JOIN region ON n1.n_regionkey = r_regionkey
             JOIN nation n2 ON s_nationkey = n2.n_nationkey
             WHERE r_name = 'ASIA' AND p_type = 'PROMO') all_nations
       GROUP BY o_year ORDER BY o_year""",
    doc="TPC-H Q8 silhouette: NATION_1's market share of PROMO-part "
        "revenue among ASIA customers, per order year. Ratio of two "
        "exact-decimal sums over a 6-way join; part/supplier/nation/"
        "region broadcast, so the only shuffles are the two fact joins "
        "(lineitem⋈orders on orderkey, then orders⋈customer on custkey). "
        "The p_type filter prunes lineitem via the broadcast hash table "
        "before either exchange.",
)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = t(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    s = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    o = t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf, "nation").select("n_nationkey", "n_regionkey", "n_name")
    r = t(spark, sf, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    # customer-side nation restricted to the ASIA region (broadcast chain)
    n1 = F.broadcast(
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
            F.col("n_nationkey").alias("cnk")
        )
    )
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("nation")))
    vol = _volume().alias("volume")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(n2, s.s_nationkey == F.col("snk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, c.c_nationkey == F.col("cnk"))
        .select(F.year("o_orderdate").alias("o_year"), vol, "nation")
    )
    zero = F.lit(0).cast(_DEC)
    nat_vol = F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(zero)
    return (
        joined.groupBy("o_year")
        .agg(
            F.round(
                F.sum(nat_vol).cast("double") / F.sum("volume").cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q54_small_qty_revenue",
    """WITH pq AS (SELECT l_partkey AS pk,
                          SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
                          COUNT(*) AS cnt
                   FROM lineitem GROUP BY l_partkey)
       SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0, 2)
                   AS DOUBLE) AS avg_yearly,
              COUNT(*) AS n_lines
       FROM lineitem
       JOIN part ON p_partkey = l_partkey
       JOIN pq ON pk = l_partkey
       WHERE p_brand = 'Brand#1'
         AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sq""",
    doc="TPC-H Q17 silhouette: revenue from small-quantity orders of "
        "Brand#1 parts, where 'small' = below 20% of that part's average "
        "quantity. The correlated AVG subquery is decorrelated into one "
        "per-part aggregate joined back on partkey; the comparison is "
        "cross-multiplied (qty*5*cnt < Σqty) so it stays in exact "
        "decimals. The partkey aggregate and the partkey join share one "
        "exchange; the brand filter broadcasts.",
)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_money("l_quantity")).alias("sq"), F.count("*").alias("cnt")
    )
    p = t(spark, sf, "part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    small = _money("l_quantity") * F.lit(5) * F.col("cnt") < F.col("sq")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pq, li.l_partkey == pq.pk)
        .filter(small)
        .agg(
            (F.round(F.sum(_money("l_extendedprice")) / F.lit(7.0), 2))
            .cast("double")
            .alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q55_waiting_suppliers",
    """WITH lo AS (SELECT l_orderkey, l_suppkey,
                          CASE WHEN l_shipdate > o_orderdate + INTERVAL '60' DAY
                               THEN 1 ELSE 0 END AS late
                   FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
            os AS (SELECT l_orderkey,
                          COUNT(DISTINCT l_suppkey) AS n_supp,
                          COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END)
                            AS n_late_supp
                   FROM lo GROUP BY l_orderkey)
       SELECT s_name, COUNT(DISTINCT lo.l_orderkey) AS numwait
       FROM lo
       JOIN os ON os.l_orderkey = lo.l_orderkey
       JOIN supplier ON s_suppkey = lo.l_suppkey
       JOIN nation ON n_nationkey = s_nationkey
       WHERE lo.late = 1 AND os.n_supp >= 2 AND os.n_late_supp = 1
         AND n_name = 'NATION_1'
       GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 50""",
    doc="TPC-H Q21 silhouette (l_shipdate > o_orderdate + 60d standing in "
        "for receipt>commit): NATION_1 suppliers who were the sole late "
        "supplier on multi-supplier orders. The EXISTS/NOT-EXISTS pair is "
        "decorrelated into one per-order aggregate (distinct suppliers, "
        "distinct late suppliers) self-joined back on orderkey — the "
        "aggregate and the join reuse the same orderkey exchange, dims "
        "broadcast, and no correlated per-row subquery survives at scale.",
)
def q55(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    ).cast("int")
    # one explicit orderkey clustering right after the fact join: hash
    # partitioning on l_orderkey satisfies the (ok,sk) grain agg, the
    # per-order agg AND the ok equi-join below (ClusteredDistribution on
    # a key subset), so the whole decorrelated pipeline runs on a single
    # exchange of the joined fact rows.
    lo = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .repartition("l_orderkey")
    )
    # reduce to (order, supplier) grain first: the per-order stats become
    # plain count/sum (no countDistinct expand), and the final
    # per-supplier count needs no distinct either, since (order,
    # supplier) is now unique.
    los = lo.groupBy("l_orderkey", "l_suppkey").agg(F.max("late").alias("late"))
    # per-order stats as whole-partition window aggregates over the same
    # orderkey clustering — ONE pass over the joined facts (the
    # aggregate-then-self-join form computed the join subtree twice;
    # measured ~2× slower at sf0.1).
    w = Window.partitionBy("l_orderkey")
    s = t(spark, sf, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = (
        t(spark, sf, "nation")
        .filter(F.col("n_name") == "NATION_1")
        .select("n_nationkey")
    )
    s1 = F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey))
    return (
        los.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late_supp", F.sum("late").over(w))
        .filter(
            (F.col("late") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
        .join(s1, los.l_suppkey == s1.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(50)
    )


@register(
    "q56_sales_opportunity",
    """WITH thr AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
                           COUNT(*) AS cnt
                    FROM customer WHERE c_acctbal > 0)
       SELECT c_nationkey, COUNT(*) AS numcust,
              CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
                AS totacctbal
       FROM customer, thr
       WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > s
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
       GROUP BY c_nationkey ORDER BY c_nationkey""",
    doc="TPC-H Q22 silhouette (nationkey standing in for the phone "
        "prefix, 'no orders since 2000' for 'no orders' — this testdata "
        "gives nearly every customer at least one lifetime order): "
        "customers with above-average positive balance and no recent "
        "orders, counted per nation. The scalar AVG threshold is one "
        "broadcast (Σ, n) row compared cross-multiplied in exact "
        "decimals; the NOT EXISTS is a left-anti join shuffled on "
        "custkey with the date filter pushed to the orders scan.",
)
def q56(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    thr = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.sum(_money("c_acctbal")).alias("s"), F.count("*").alias("cnt"))
    )
    o = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .crossJoin(F.broadcast(thr))
        .filter(_money("c_acctbal") * F.col("cnt") > F.col("s"))
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(_money("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q58_customer_distribution",
    """WITH c_orders AS (
         SELECT c_custkey, COUNT(o_orderkey) AS c_count
         FROM customer LEFT JOIN orders
           ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
         GROUP BY c_custkey)
       SELECT c_count, COUNT(*) AS custdist
       FROM c_orders GROUP BY c_count
       ORDER BY custdist DESC, c_count DESC""",
    doc="TPC-H Q13 silhouette (the comment-pattern exclusion becomes a "
        "priority exclusion — no o_comment column in this testdata): "
        "order count per customer INCLUDING zero-order customers via the "
        "filtered left outer join, then the distribution of those "
        "counts. Two hash-aggs; the only large shuffle is "
        "customer⋈orders on custkey, and the second agg's input is "
        "|customers| rows of two ints. COUNT(o_orderkey) (not *) keeps "
        "the null-row = 0 semantics identical in both engines.",
)
def q58(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select("c_custkey")
    o = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q59_product_type_profit",
    """SELECT nation, o_year,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
                   AS DOUBLE) AS sum_profit
       FROM lineitem
       JOIN part ON p_partkey = l_partkey
       JOIN supplier ON s_suppkey = l_suppkey
       JOIN orders ON o_orderkey = l_orderkey
       JOIN nation ON s_nationkey = n_nationkey
       CROSS JOIN LATERAL (SELECT n_name AS nation,
                                  EXTRACT(YEAR FROM o_orderdate) AS o_year) v
       WHERE p_name LIKE '%red%'
       GROUP BY nation, o_year
       ORDER BY nation, o_year DESC""",
    doc="TPC-H Q9 silhouette (no partsupp in this testdata, so profit is "
        "discounted revenue without the supplycost term): revenue from "
        "'%red%'-named parts per supplier nation and order year. "
        "part (filtered), supplier, nation all broadcast; lineitem "
        "shuffles once to meet orders on orderkey (supplier join left to "
        "AQE — it scales with SF). The LIKE filter "
        "prunes lineitem through the broadcast hash table before that "
        "exchange.",
)
def q59(spark: SparkSession, sf: str) -> DataFrame:
    p = (
        t(spark, sf, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    li = t(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    s = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    profit = _money("l_extendedprice") * (F.lit(1) - _money("l_discount"))
    return (
        # part/nation forced broadcast (filtered dim / 25 rows); supplier
        # left to AQE — it scales with SF, so the planner should downgrade
        # it to a shuffle join when stats say so
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("profit"), 2).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@register(
    "q60_order_priority_check",
    """SELECT o_orderpriority, COUNT(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1996-04-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate > o_orderdate + INTERVAL '30' DAY)
       GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    doc="TPC-H Q4 silhouette (commitdate/receiptdate absent, so 'late' = "
        "shipped >30 days after order date, matching q40's convention): "
        "orders placed in 1996Q1 with at least one late line, counted "
        "per priority. The EXISTS is a left-semi join on orderkey with "
        "the date predicate pushed to the orders scan — lineitem "
        "deduplicates inside the semi join, no DISTINCT needed, and the "
        "quarter filter shrinks the build side before the shuffle.",
)
def q60(spark: SparkSession, sf: str) -> DataFrame:
    o = (
        t(spark, sf, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q61_rolling_range_window",
    """SELECT o_custkey, o_orderkey,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY epoch(o_orderdate)
                   RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
                   AS DOUBLE) AS spend_90d
       FROM orders ORDER BY o_custkey, o_orderkey LIMIT 200""",
    doc="RANGE-frame window: per-customer rolling 90-day spend — the "
        "frame is bounded by the ORDER-key VALUE (epoch seconds, "
        "7776000 = 90 days), not a row count, so ties and gaps behave "
        "correctly. Per-customer partitioning keeps every window local "
        "to its hash partition at any scale; exact-decimal sums, cast "
        "double at the edge. Both engines evaluate the identical "
        "numeric-range frame over epoch seconds.",
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-7776000, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(_money("o_totalprice")).over(w).cast("double").alias("spend_90d"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(200)
    )


@register(
    "q62_first_nth_value",
    """SELECT o_custkey,
              MIN(first_ord) AS first_order,
              MIN(second_ord) AS second_order,
              CAST(MIN(first_price) AS DOUBLE) AS first_price
       FROM (SELECT o_custkey,
                    FIRST_VALUE(o_orderkey) OVER w AS first_ord,
                    NTH_VALUE(o_orderkey, 2) OVER w AS second_ord,
                    FIRST_VALUE(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                      AS first_price
             FROM orders
             WINDOW w AS (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING)) x
       GROUP BY o_custkey ORDER BY o_custkey LIMIT 200""",
    doc="FIRST_VALUE / NTH_VALUE navigation windows: each customer's "
        "first and second order (full-partition frame so NTH_VALUE(2) "
        "is defined on every row, NULL for single-order customers). "
        "The outer MIN collapses the per-row duplicates "
        "deterministically. One custkey shuffle; window + agg share the "
        "same partitioning so Catalyst plans a single Exchange.",
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    x = o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_ord"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ord"),
        F.first(_money("o_totalprice")).over(w).alias("first_price"),
    )
    return (
        x.groupBy("o_custkey")
        .agg(
            F.min("first_ord").alias("first_order"),
            F.min("second_ord").alias("second_order"),
            F.min("first_price").cast("double").alias("first_price"),
        )
        .orderBy("o_custkey")
        .limit(200)
    )


@register(
    "q63_lateral_topk",
    """SELECT n.n_name, c.c_custkey, c.bal
       FROM nation n,
       LATERAL (SELECT c_custkey, ROUND(c_acctbal, 2) AS bal
                FROM customer WHERE c_nationkey = n.n_nationkey
                ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
       ORDER BY n.n_name, bal DESC, c.c_custkey""",
    doc="LATERAL correlated subquery (identical SQL text runs on both "
        "engines): each nation's top-2 customers by balance. Catalyst "
        "decorrelates the per-row LIMIT subquery into a partitioned "
        "rank — the DataFrame twin of q10's WindowGroupLimit — so no "
        "nested-loop per-nation execution survives into the physical "
        "plan. Exercises the SQL surface end-to-end (temp views + "
        "spark.sql), not just the DataFrame builders.",
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    t(spark, sf, "nation").createOrReplaceTempView("nation")
    t(spark, sf, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """SELECT n.n_name, c.c_custkey, c.bal
           FROM nation n,
           LATERAL (SELECT c_custkey, ROUND(c_acctbal, 2) AS bal
                    FROM customer WHERE c_nationkey = n.n_nationkey
                    ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
           ORDER BY n.n_name, bal DESC, c.c_custkey"""
    )


@register(
    "q64_regexp_groups",
    """SELECT CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INT)
                AS brand_num,
              COUNT(*) AS n_parts,
              CAST(MIN(p_size) AS INT) AS min_size,
              CAST(MAX(p_size) AS INT) AS max_size
       FROM part GROUP BY 1 ORDER BY brand_num""",
    doc="Regex capture-group extraction (identical pattern semantics in "
        "Java regex and RE2 for this class): parse the numeric brand id "
        "out of 'Brand#NN' and aggregate per brand. Pure codegen "
        "projection + one small hash-agg.",
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part")
    return (
        p.groupBy(
            F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1)
            .cast("int")
            .alias("brand_num")
        )
        .agg(
            F.count("*").alias("n_parts"),
            F.min("p_size").cast("int").alias("min_size"),
            F.max("p_size").cast("int").alias("max_size"),
        )
        .orderBy("brand_num")
    )


@register(
    "q65_filtered_aggregates",
    """SELECT l_linestatus,
              COUNT(*) AS n,
              COUNT(*) FILTER (WHERE l_discount > 0.05) AS hi_disc,
              COUNT(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R')
                AS return_supps,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                   FILTER (WHERE l_tax > 0.04) AS DOUBLE) AS taxed_qty
       FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    doc="ANSI FILTER-clause aggregates (the declarative form of q18's "
        "CASE-WHEN conditional aggregation), including a filtered "
        "COUNT(DISTINCT): identical SQL text runs on both engines via "
        "the temp-view surface. One partial-agg shuffle plus the "
        "distinct expand.",
)
def q65(spark: SparkSession, sf: str) -> DataFrame:
    t(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """SELECT l_linestatus,
                  COUNT(*) AS n,
                  COUNT(*) FILTER (WHERE l_discount > 0.05) AS hi_disc,
                  COUNT(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R')
                    AS return_supps,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                       FILTER (WHERE l_tax > 0.04) AS DOUBLE) AS taxed_qty
           FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""
    )


@register(
    "q66_window_dedup",
    """WITH b AS (
         SELECT user_id, event_type, event_id, ts,
                time_bucket(INTERVAL '10 minutes', ts) AS w
         FROM events),
       r AS (
         SELECT user_id, event_type, event_id, w,
                ROW_NUMBER() OVER (PARTITION BY user_id, event_type, w
                                   ORDER BY ts, event_id) AS rn
         FROM b)
       SELECT CAST(COUNT(*) AS BIGINT) AS total_events,
              CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept,
              CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dropped_dups
       FROM r""",
    doc="Windowed event dedup — the DuckDB-checkable batch twin of the "
        "streaming effect_once guard (dropDuplicatesWithinWatermark): "
        "keep the first event per (user, type) inside each 10-minute "
        "tumbling bucket, count the kept/dropped split. One "
        "(user,type,bucket) shuffle; the window never spans buckets so "
        "state is bounded exactly like the watermark horizon bounds the "
        "streaming form.",
)
def q66(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    w = F.window("ts", "10 minutes")["start"].alias("w")
    b = e.select("user_id", "event_type", "event_id", "ts", w)
    rn = F.row_number().over(
        Window.partitionBy("user_id", "event_type", "w").orderBy("ts", "event_id")
    )
    r = b.withColumn("rn", rn)
    return r.agg(
        F.count("*").alias("total_events"),
        F.sum((F.col("rn") == 1).cast("long")).alias("kept"),
        F.sum((F.col("rn") > 1).cast("long")).alias("dropped_dups"),
    )


@register(
    "q67_robust_dispersion",
    """WITH med AS (SELECT l_returnflag,
                          median(l_quantity) AS med_qty
                   FROM lineitem GROUP BY l_returnflag)
       SELECT l.l_returnflag,
              ROUND(CAST(MIN(med_qty) AS DOUBLE), 2) AS median_qty,
              ROUND(CAST(median(ABS(l.l_quantity - med_qty)) AS DOUBLE), 2)
                AS mad_qty
       FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag
       GROUP BY l.l_returnflag ORDER BY l.l_returnflag""",
    doc="Robust dispersion: median absolute deviation per return flag — "
        "the outlier-resistant spread statistic quality pipelines use "
        "where stddev is poisoned by heavy tails. Two-level exact "
        "medians: the per-group median is one agg whose tiny result "
        "broadcast-joins back for the deviation pass. Spark's "
        "percentile(0.5) and DuckDB's median agree exactly (both "
        "interpolate the order statistic).",
)
def q67(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").select("l_returnflag", "l_quantity")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("med_qty")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("med_qty").cast("double"), 2).alias("median_qty"),
            F.round(
                F.expr("percentile(abs(l_quantity - med_qty), 0.5)").cast("double"), 2
            ).alias("mad_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q68_price_histogram",
    """SELECT CASE WHEN o_totalprice < 0 THEN 0
                   WHEN o_totalprice >= 600000 THEN 13
                   ELSE CAST(FLOOR(o_totalprice / 50000) AS INT) + 1 END AS bucket,
              COUNT(*) AS n,
              CAST(ROUND(MIN(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                AS lo,
              CAST(ROUND(MAX(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                AS hi
       FROM orders GROUP BY 1 ORDER BY bucket""",
    doc="Equal-width histogram via width_bucket on the Spark side (12 "
        "interior buckets over [0, 600k), overflow bucket 13; DuckDB "
        "lacks the function so the oracle spells out the identical "
        "floor arithmetic): order-value distribution with per-bucket "
        "extrema. One scan + one tiny hash-agg; the histogram of a "
        "100 TB fact is the same single map-side-combinable pass.",
)
def q68(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(12)).alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.min(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("lo"),
            F.round(F.max(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "q69_activity_islands",
    """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                    FROM events),
       g AS (SELECT user_id, d,
                    d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                             AS INT) AS grp
             FROM days),
       runs AS (SELECT user_id, grp, COUNT(*) AS run_days,
                       MIN(d) AS run_start
                FROM g GROUP BY user_id, grp)
       SELECT CAST(MAX(run_days) AS BIGINT) AS longest_streak,
              CAST(COUNT(*) AS BIGINT) AS n_runs,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
              ROUND(CAST(SUM(run_days) AS DOUBLE) / COUNT(*), 4) AS avg_run_days
       FROM runs""",
    doc="Islands-and-gaps: per-user runs of consecutive active days via "
        "the date-minus-row_number grouping trick, then streak stats. "
        "Two (user)-partitioned steps — the window and the run agg share "
        "the user_id exchange; no global sort anywhere. The shape behind "
        "retention streaks, uptime runs, and contiguous-coverage audits.",
)
def q69(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    days = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    g = days.withColumn("grp", F.date_sub(F.col("d"), rn))
    runs = g.groupBy("user_id", "grp").agg(
        F.count("*").alias("run_days"), F.min("d").alias("run_start")
    )
    return runs.agg(
        F.max("run_days").alias("longest_streak"),
        F.count("*").alias("n_runs"),
        F.count_distinct("user_id").alias("n_users"),
        F.round(
            F.sum("run_days").cast("double") / F.count("*"), 4
        ).alias("avg_run_days"),
    )


@register(
    "q70_measures_unpivot",
    """SELECT l_returnflag, measure,
              CAST(ROUND(SUM(CAST(v AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
       FROM (
         SELECT l_returnflag, 'quantity' AS measure, l_quantity AS v FROM lineitem
         UNION ALL
         SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
         UNION ALL
         SELECT l_returnflag, 'discount', l_discount FROM lineitem
         UNION ALL
         SELECT l_returnflag, 'tax', l_tax FROM lineitem) u
       GROUP BY l_returnflag, measure ORDER BY l_returnflag, measure""",
    doc="Wide-to-long UNPIVOT: the four lineitem measures melt to "
        "(measure, value) rows via stack() — ONE scan emitting 4 rows "
        "per input row, where the oracle's UNION-ALL spelling (the "
        "portable twin) scans four times. Then one (flag, measure) "
        "hash-agg. The melt shape feeds metric stores and long-format "
        "ML feature tables.",
)
def q70(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    melted = li.select(
        "l_returnflag",
        F.expr(
            "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice, "
            "'discount', l_discount, 'tax', l_tax) AS (measure, v)"
        ),
    )
    return (
        melted.groupBy("l_returnflag", "measure")
        .agg(
            F.round(F.sum(F.col("v").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("total")
        )
        .orderBy("l_returnflag", "measure")
    )


@register(
    "q71_full_outer_reconcile",
    """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
                 FROM customer GROUP BY c_nationkey),
       s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
             FROM supplier GROUP BY s_nationkey)
       SELECT COALESCE(c.nk, s.nk) AS nk,
              CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_cust,
              CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_supp,
              CASE WHEN c.nk IS NULL THEN 'supplier_only'
                   WHEN s.nk IS NULL THEN 'customer_only'
                   ELSE 'both' END AS presence
       FROM c FULL OUTER JOIN s ON c.nk = s.nk
       ORDER BY nk""",
    doc="FULL OUTER reconciliation — the side-by-side audit shape "
        "(which nations have customers but no suppliers, or vice "
        "versa): two tiny pre-aggregates full-outer-joined with "
        "COALESCE null repair and a presence verdict. Both inputs are "
        "O(nations) after their partial aggs, so the full-outer join is "
        "a broadcast-scale reconciliation even when the base tables are "
        "100 TB facts.",
)
def q71(spark: SparkSession, sf: str) -> DataFrame:
    c = (
        t(spark, sf, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        t(spark, sf, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count("*").alias("n_supp"))
    )
    j = c.join(s, c.nk == s.snk, "full_outer")
    presence = (
        F.when(F.col("nk").isNull(), "supplier_only")
        .when(F.col("snk").isNull(), "customer_only")
        .otherwise("both")
    )
    return (
        j.select(
            F.coalesce("nk", "snk").alias("nk"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
            presence.alias("presence"),
        )
        .orderBy("nk")
    )


@register(
    "q72_rank_vs_dense_rank",
    """WITH s AS (SELECT p_brand, p_size, COUNT(*) AS n
                 FROM part GROUP BY p_brand, p_size)
       SELECT p_brand, p_size, n,
              RANK() OVER w AS rnk,
              DENSE_RANK() OVER w AS drnk
       FROM s
       WINDOW w AS (PARTITION BY p_brand ORDER BY n DESC)
       ORDER BY p_brand, rnk, p_size LIMIT 200""",
    doc="RANK vs DENSE_RANK tie semantics on a deliberately tied "
        "ordering (size-counts per brand collide constantly): RANK "
        "leaves gaps after ties, DENSE_RANK does not — the pair q10's "
        "row_number and q49's percent_rank don't exercise. Per-brand "
        "partitioning keeps the window local to its hash partition; the "
        "outer ORDER BY adds p_size so the LIMIT is total despite the "
        "ties.",
)
def q72(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part")
    s = p.groupBy("p_brand", "p_size").agg(F.count("*").alias("n"))
    w = Window.partitionBy("p_brand").orderBy(F.col("n").desc())
    return (
        s.select(
            "p_brand",
            "p_size",
            "n",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .orderBy("p_brand", "rnk", "p_size")
        .limit(200)
    )
