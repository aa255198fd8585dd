"""Extended relational coverage: JSON extraction, exact percentiles,
window-function sampler, pivot-style conditional aggregation, correlated
EXISTS with residual predicates, multi-level CTE, cross-fixture joins.

These widen the §2.5 gap-table surface beyond the core q01–q22 set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from goose_spark.plans.guards import local_relation, persist_shared
from goose_spark.queries.base import fixture, fixture_rel, register, t

_DEC = "decimal(18,2)"


@register(
    "q23_json_extraction",
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
              event_type, COUNT(*) AS n
       FROM events
       WHERE json_extract_string(props, '$.k') IS NOT NULL
       GROUP BY 1, 2 ORDER BY k_mod, event_type""",
    doc="Semi-structured JSON column extraction (events.props) — "
        "get_json_object stays JVM-side; at scale prefer promoting hot "
        "JSON keys to columns at ingest.",
)
def q23(spark: SparkSession, sf: str) -> DataFrame:
    e = t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.filter(k.isNotNull())
        .groupBy((k % 10).alias("k_mod"), "event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("k_mod", "event_type")
    )


@register(
    "q24_exact_percentiles",
    """SELECT l_returnflag,
              ROUND(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE), 4) AS p50,
              ROUND(CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE), 4) AS p90,
              ROUND(CAST(percentile_cont(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE), 4) AS price_p99
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    doc="Exact interpolated percentiles (sort-based agg; the approx "
        "variant percentile_approx is the 100 TB path, excluded from "
        "hash-match per SURVEY §2.6 rules).",
)
def q24(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("price_p99"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q25_window_sampler",
    """SELECT o_custkey, o_orderkey,
              DENSE_RANK() OVER w AS drnk,
              NTILE(4) OVER w AS quartile,
              ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS biggest,
              ROUND(o_totalprice
                    - CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                           OVER (PARTITION BY o_custkey) AS DOUBLE)
                      / COUNT(*) OVER (PARTITION BY o_custkey), 2) AS vs_avg
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
       ORDER BY o_custkey, drnk, o_orderkey LIMIT 200""",
    doc="Window-function breadth: dense_rank / ntile / first_value / "
        "partition-avg delta in one pass over one window partitioning.",
)
def q25(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    wp = Window.partitionBy("o_custkey")
    return (
        t(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.first("o_totalprice").over(w), 2).alias("biggest"),
            # exact decimal sum / count → both engines divide identical
            # doubles (a plain double AVG diverges in summation order)
            F.round(
                F.col("o_totalprice")
                - F.sum(F.col("o_totalprice").cast(_DEC)).over(wp).cast("double")
                / F.count("*").over(wp),
                2,
            ).alias("vs_avg"),
        )
        .orderBy("o_custkey", "drnk", "o_orderkey")
        .limit(200)
    )


@register(
    "q26_pivot_conditional",
    """SELECT c_mktsegment,
              CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished,
              CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_,
              CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS pending,
              CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'F'
                             THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END), 2)
                   AS DOUBLE) AS finished_value
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    doc="Pivot via conditional aggregation (one shuffle; the explicit "
        "form of df.groupBy().pivot()).",
)
def q26(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders").select("o_custkey", "o_orderstatus", "o_totalprice")
    c = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")

    def cnt(status):
        return F.sum(F.when(F.col("o_orderstatus") == status, 1).otherwise(0)).cast("long")

    val = F.sum(
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice").cast(_DEC)).otherwise(
            F.lit(0).cast(_DEC)
        )
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            cnt("F").alias("finished"),
            cnt("O").alias("open_"),
            cnt("P").alias("pending"),
            F.round(val, 2).cast("double").alias("finished_value"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q27_correlated_exists_residual",
    """SELECT c.c_custkey, ROUND(c.c_acctbal, 2) AS bal
       FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_orderpriority = '1-URGENT'
                       AND o.o_totalprice > 100000)
       ORDER BY c.c_custkey LIMIT 100""",
    doc="Correlated EXISTS with residual predicates — decorrelates to a "
        "left-semi join with the filters pushed into the subquery scan.",
)
def q27(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    o = (
        t(spark, sf, "orders")
        .filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 100000))
        .select("o_custkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", F.round("c_acctbal", 2).alias("bal"))
        .orderBy("c_custkey")
        .limit(100)
    )


@register(
    "q28_cte_top_spender_per_nation",
    """WITH spend AS (
         SELECT c.c_nationkey, c.c_custkey,
                CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
         GROUP BY c.c_nationkey, c.c_custkey)
       SELECT n.n_name, s.c_custkey, s.total
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                          ORDER BY total DESC, c_custkey) AS rn
             FROM spend) s
       JOIN nation n ON n.n_nationkey = s.c_nationkey
       WHERE s.rn = 1 ORDER BY n.n_name""",
    doc="Multi-level CTE: aggregate → per-group argmax (row_number) → "
        "broadcast dim join. The window runs over the aggregate (25×|C| "
        "rows), never raw orders.",
)
def q28(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = t(spark, sf, "orders").select("o_custkey", "o_totalprice")
    n = F.broadcast(t(spark, sf, "nation").select("n_nationkey", "n_name"))
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("total"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.col("total").desc(), "c_custkey")
    return (
        spend.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .select("n_name", "c_custkey", "total")
        .orderBy("n_name")
    )


# percentile_approx rank-error guarantee is 1/accuracy; we verify the
# sketch value sits inside the EXACT percentile ENVELOPE at
# q ± _Q29_ENV, computed in the same aggregation via an array-quantile
# (one shared value buffer, three extractions — no extra pass). The
# envelope is 100x the sketch's guaranteed rank error (1e-4), wide
# enough that small-N interpolation slop can't flip it: at sf0.001 a
# group holds ~2k rows (rank granularity 5e-4 << 0.01), the failure
# mode that sank a TIGHT value-window check in round 10 and forced the
# r11 rank-space second pass. The envelope keeps that check's meaning
# (a broken sketch lands outside and fails) at one data pass instead
# of two — the r12 restructure that, with the distinct-count pass run
# concurrently, took the query from 13.4 s (r11 driver bench) to ~2 s.
_Q29_ACC = 10000
_Q29_ENV = 0.01
# approx_count_distinct default rsd is 0.05 (one standard error); 3σ
# bound — deterministic for fixed data (HLL++ has no RNG). The TIGHT
# rank-space property (sketch rank error ≤ 2/_Q29_ACC, vs this gate's
# 100x-looser value envelope) is pinned test-only at sf0.01 in
# tests/test_sketches.py::test_q29_percentile_approx_rank_space.
_Q29_HLL_BOUND = 0.15


@register(
    "q29_approx_aggregates",
    f"""SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
               ROUND(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE), 4) AS exact_p50,
               ROUND(CAST(percentile_cont(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE), 4) AS exact_price_p99,
               TRUE AS orders_within_bound,
               TRUE AS p50_within_bound,
               TRUE AS p99_within_bound
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    doc="Approximate aggregates — the 100 TB substitutes for q04's "
        "COUNT DISTINCT and q24's exact percentiles: "
        "approx_count_distinct (HLL++, no expand) and percentile_approx "
        "(fixed-size KLL-style sketch, no sort). Hash-matched via exact "
        "anchors plus BOOLEAN error-bound checks: the Spark side proves "
        "|HLL − exact| ≤ 3·rsd·exact and that each approx percentile "
        "lies inside the exact percentile envelope at q ± 0.01 — 100x "
        "the sketch's guaranteed rank error, computed as an array-"
        "quantile in the SAME aggregation (one value buffer, no second "
        "data pass); the oracle asserts the same booleans as TRUE. The "
        "distinct-count anchor runs as its own column-pruned pass, "
        "concurrent with the sketch pass (mixing countDistinct with "
        "percentile_approx in one agg forces the Expand plan into a "
        "SortAggregate measured 57 s at sf0.1 vs 1.8 s split). Raw "
        "sketch estimates stay rows-only in tests/test_sketches.py "
        "(engines' sketches differ; SURVEY §2.6).",
)
def q29(spark: SparkSession, sf: str) -> DataFrame:
    from concurrent.futures import ThreadPoolExecutor

    li = t(spark, sf, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_quantity", "l_extendedprice"
    )
    # countDistinct goes in its OWN pass: mixing a distinct aggregate
    # with percentile_approx in one agg forces the Expand plan into a
    # SortAggregate over the doubled row stream, and the per-row
    # QuantileSummaries merge there is pathological — measured 57 s at
    # sf0.1 for (countDistinct + one percentile_approx) vs 1.8 s for ALL
    # the non-distinct aggregates together. Two column-pruned scans beat
    # one Expand scan by ~15x; both results are 3 rows.
    env_q = F.array(
        F.lit(0.5 - _Q29_ENV), F.lit(0.5), F.lit(0.5 + _Q29_ENV)
    )
    env_p = F.array(
        F.lit(0.99 - _Q29_ENV), F.lit(0.99), F.lit(min(1.0, 0.99 + _Q29_ENV))
    )
    # three independent 3-row aggregates over 2-column pruned scans
    # (rf+orderkey / rf+quantity / rf+price), collected CONCURRENTLY:
    # the scheduler interleaves the jobs across the executor threads,
    # so wall-clock is the slowest single pass (~1.3 s warm), not the
    # sum — and countDistinct never shares a pass with percentile_approx
    # (the Expand/SortAggregate cliff, 57 s). Results join driver-side.
    # NOT localCheckpoint(eager=False): that re-executed the lineage at
    # checkpoint build (27.8 s at sf0.1 vs ~1 s for the aggregates).
    # the HLL estimate rides the qty pass, NOT the countDistinct pass:
    # mixed into the same agg as a distinct aggregate, Spark's
    # distinct-rewrite hoists the HLL buffer into the per-(rf, orderkey)
    # partial aggregate — every one of the ~450k distinct pairs carries
    # a 53-long HLL sketch through the first exchange (plan-verified,
    # plans/r15/q29_cd_pass_before.txt). As a plain non-distinct agg in
    # the qty pass it buffers per returnflag (3 groups) only; the pair
    # shuffle shrinks to (rf, orderkey). Same column, same rsd — the
    # HLL++ estimate is bit-identical (register-max merge is
    # order-insensitive), r15.
    passes = {
        "cd": li.groupBy("l_returnflag").agg(
            F.countDistinct("l_orderkey").cast("long").alias("exact_orders")),
        "qty": li.groupBy("l_returnflag").agg(
            F.percentile("l_quantity", env_q).alias("_qp"),
            F.percentile_approx("l_quantity", 0.5, _Q29_ACC).alias("_ap50"),
            F.approx_count_distinct("l_orderkey").alias("_hll")),
        "prc": li.groupBy("l_returnflag").agg(
            F.percentile("l_extendedprice", env_p).alias("_pp"),
            F.percentile_approx("l_extendedprice", 0.99, _Q29_ACC).alias("_ap99")),
    }
    with ThreadPoolExecutor(len(passes)) as ex:
        futs = {k: ex.submit(local_relation, df) for k, df in passes.items()}
        locs = {k: f.result() for k, f in futs.items()}
    # the joined sides are 3-row local relations — broadcast, or the
    # planner sort-merges them through needless shuffle pairs
    agg = locs["cd"].join(F.broadcast(locs["qty"]), "l_returnflag").join(
        F.broadcast(locs["prc"]), "l_returnflag")

    def _env_ok(ap: str, env: str):
        return (F.col(ap) >= F.col(env)[0]) & (F.col(ap) <= F.col(env)[2])

    hll_ok = (
        F.abs(F.col("_hll") - F.col("exact_orders"))
        <= F.col("exact_orders") * F.lit(_Q29_HLL_BOUND)
    )
    return (
        agg.select(
            "l_returnflag",
            "exact_orders",
            F.round(F.col("_qp")[1], 4).alias("exact_p50"),
            F.round(F.col("_pp")[1], 4).alias("exact_price_p99"),
            hll_ok.alias("orders_within_bound"),
            _env_ok("_ap50", "_qp").alias("p50_within_bound"),
            _env_ok("_ap99", "_pp").alias("p99_within_bound"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "qj9_batch_integrity_join",
    f"""SELECT b.id AS batch_id, b.status AS declared, b.total,
               CAST(COUNT(j.id) AS BIGINT) AS members,
               CAST(SUM(CASE WHEN j.status = 'success' THEN 1 ELSE 0 END) AS BIGINT) AS done
        FROM {fixture_rel('batches')} b
        LEFT JOIN {fixture_rel('jobs')} j ON j.batch_id = b.id
        GROUP BY b.id, b.status, b.total
        ORDER BY batch_id""",
    doc="Cross-fixture integrity join: batches.total must equal the "
        "member count in the ledger (B5 shape over two tables; mirrors "
        "the hash + 4-set assembly at src/goose/brokers/redis/batch.clj:"
        "45-60).",
)
def qj9(spark: SparkSession, sf: str) -> DataFrame:
    b = fixture(spark, "batches").select(
        F.col("id").alias("batch_id"), F.col("status").alias("declared"), "total"
    )
    j = fixture(spark, "jobs").select("id", "batch_id", "status")
    done = F.sum(F.when(F.col("status") == "success", 1).otherwise(0)).cast("long")
    return (
        b.join(j, j.batch_id == b.batch_id, "left")
        .groupBy(b.batch_id, "declared", "total")
        .agg(F.count(j.id).cast("long").alias("members"), done.alias("done"))
        .orderBy("batch_id")
    )


# ---------------------------------------------------------------------------
# q90/q91 — the registry numbering gap, backfilled (VERDICT r12 #7)
# ---------------------------------------------------------------------------

@register(
    "q90_hierarchy_rollup_walk",
    """WITH l0 AS (
         SELECT c.c_nationkey, c.c_name AS node,
                CAST(COUNT(*) AS BIGINT) AS members,
                SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY c.c_nationkey, c.c_name),
       l1 AS (
         SELECT n.n_regionkey, n.n_name AS node,
                CAST(COUNT(*) AS BIGINT) AS members, SUM(tot) AS tot
         FROM l0 JOIN nation n ON n.n_nationkey = l0.c_nationkey
         GROUP BY n.n_regionkey, n.n_name),
       l2 AS (
         SELECT r.r_name AS node,
                CAST(COUNT(*) AS BIGINT) AS members, SUM(tot) AS tot
         FROM l1 JOIN region r ON r.r_regionkey = l1.n_regionkey
         GROUP BY r.r_name)
       SELECT lvl, node, members, ROUND(CAST(tot AS DOUBLE), 2) AS total
       FROM (SELECT 0 AS lvl, node, members, tot FROM l0
             UNION ALL SELECT 1, node, members, tot FROM l1
             UNION ALL SELECT 2, node, members, tot FROM l2)
       ORDER BY lvl, node""",
    doc="Recursive-CTE-shaped hierarchy walk (the reference's console "
        "drill-down shape — queue → queue-group → broker dashboard, "
        "data.clj:18-28 — over the TPC-H ownership chain orders → "
        "customer → nation → region): each level aggregates the "
        "PREVIOUS level's aggregate, not the raw fact table, so level k "
        "moves O(level k-1 groups) rows — the walk a WITH RECURSIVE "
        "rollup performs, expressed as chained aggregations. Level 0 "
        "(per-customer: order count + exact-decimal spend) feeds level 1 "
        "(per-nation: customer count + spend) feeds level 2 (per-region: "
        "nation count + spend); all three emit into one tagged union. "
        "Scale: level 0 is the only fact-sized aggregation (one "
        "o_custkey hash shuffle + a customer join); it is persist_shared "
        "so levels 0/1 never recompute it; level 1 collapses to 25 rows "
        "-> local_relation (level 2 and the union read a driver-local "
        "handful, zero extra shuffles); nation/region joins broadcast. "
        "Totals stay DECIMAL(18,2)-exact until the final cast, so the "
        "union hash-matches DuckDB regardless of aggregation order.",
    tags=("relational", "hierarchy"),
)
def q90(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer").select("c_custkey", "c_name", "c_nationkey")
    o = t(spark, sf, "orders").select("o_custkey", "o_totalprice")
    n = F.broadcast(t(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"))
    r = F.broadcast(t(spark, sf, "region").select("r_regionkey", "r_name"))
    l0 = persist_shared(
        o.groupBy("o_custkey")
        .agg(F.count("*").cast("long").alias("members"),
             F.sum(F.col("o_totalprice").cast(_DEC)).alias("tot"))
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select("c_nationkey", F.col("c_name").alias("node"), "members", "tot")
    )
    l1 = local_relation(
        l0.groupBy("c_nationkey")
        .agg(F.count("*").cast("long").alias("members"),
             F.sum("tot").alias("tot"))
        .join(n, F.col("c_nationkey") == n.n_nationkey)
        .select("n_regionkey", F.col("n_name").alias("node"), "members", "tot")
    )
    l2 = (
        l1.groupBy("n_regionkey")
        .agg(F.count("*").cast("long").alias("members"),
             F.sum("tot").alias("tot"))
        .join(r, F.col("n_regionkey") == r.r_regionkey)
        .select(F.col("r_name").alias("node"), "members", "tot")
    )
    out = (
        l0.select(F.lit(0).alias("lvl"), "node", "members", "tot")
        .unionByName(l1.select(F.lit(1).alias("lvl"), "node", "members", "tot"))
        .unionByName(l2.select(F.lit(2).alias("lvl"), "node", "members", "tot"))
    )
    return (
        out.select("lvl", "node", "members",
                   F.round(F.col("tot").cast("double"), 2).alias("total"))
        .orderBy("lvl", "node")
    )


_JOB_EVENTS = fixture_rel("job_events")


@register(
    "q91_merge_upsert_state",
    f"""WITH a AS (
          SELECT job_id, kind, seq, queue FROM (
            SELECT job_id, kind, seq, queue,
                   ROW_NUMBER() OVER (PARTITION BY job_id ORDER BY seq DESC) AS rn
            FROM {_JOB_EVENTS}
            WHERE substr(md5(CAST(seq AS VARCHAR)), 1, 1) < '8') WHERE rn = 1),
        b AS (
          SELECT job_id, kind, seq, queue FROM (
            SELECT job_id, kind, seq, queue,
                   ROW_NUMBER() OVER (PARTITION BY job_id ORDER BY seq DESC) AS rn
            FROM {_JOB_EVENTS}
            WHERE substr(md5(CAST(seq AS VARCHAR)), 1, 1) >= '8') WHERE rn = 1)
        SELECT COALESCE(b.job_id, a.job_id) AS job_id,
               CASE WHEN a.job_id IS NULL THEN b.kind
                    WHEN b.job_id IS NULL THEN a.kind
                    WHEN b.seq > a.seq THEN b.kind ELSE a.kind END AS kind,
               CAST(CASE WHEN a.job_id IS NULL THEN b.seq
                         WHEN b.job_id IS NULL THEN a.seq
                         WHEN b.seq > a.seq THEN b.seq ELSE a.seq END AS BIGINT) AS seq,
               CASE WHEN a.job_id IS NULL THEN b.queue
                    WHEN b.job_id IS NULL THEN a.queue
                    WHEN b.seq > a.seq THEN b.queue ELSE a.queue END AS queue,
               CASE WHEN a.job_id IS NULL THEN 'insert'
                    WHEN b.job_id IS NULL THEN 'keep'
                    WHEN b.seq > a.seq THEN 'update'
                    ELSE 'skip' END AS merge_action
        FROM a FULL OUTER JOIN b ON a.job_id = b.job_id
        ORDER BY job_id""",
    doc="MERGE/upsert semantics over the job-transition log (the r12-#7 "
        "backfill): two writer shards of the ledger (appends "
        "hash-partitioned across writers: md5(seq) first nibble) are "
        "each reduced to latest-row-per-job state, "
        "then reconciled with Delta-style conditional MERGE rules — "
        "WHEN MATCHED AND source.seq > target.seq THEN UPDATE (newer "
        "shard-B row wins: 'update'), WHEN MATCHED otherwise no-op "
        "('skip'), WHEN NOT MATCHED THEN INSERT ('insert'), target-only "
        "rows carried through ('keep'); the fixture populates all four "
        "actions. This is the engine's ledger-compaction primitive made "
        "declarative: the state view's latest-wins rule "
        "(streaming/ledger.py state()) IS a continuous MERGE of new "
        "transitions into the snapshot. Scale shape: two latest-per-key "
        "reductions (WindowGroupLimit-ranked, one job_id hash shuffle "
        "each) and one co-partitioned full-outer join on the same key — "
        "the physical plan Delta Lake runs for MERGE at 100 TB (no "
        "broadcast: both sides are state-sized; AQE may still broadcast "
        "a genuinely small delta).",
    tags=("jobs", "merge"),
)
def q91(spark: SparkSession, sf: str) -> DataFrame:
    ev = fixture(spark, "job_events").select("job_id", "kind", "seq", "queue")
    w = Window.partitionBy("job_id").orderBy(F.col("seq").desc())

    def latest(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    shard = F.substring(F.md5(F.col("seq").cast("string")), 1, 1)
    a = latest(ev.filter(shard < "8")).alias("a")
    b = latest(ev.filter(shard >= "8")).alias("b")
    a_only = F.col("b.job_id").isNull()
    b_only = F.col("a.job_id").isNull()
    b_newer = F.col("b.seq") > F.col("a.seq")

    def pick(col: str):
        return (
            F.when(b_only, F.col(f"b.{col}"))
            .when(a_only, F.col(f"a.{col}"))
            .when(b_newer, F.col(f"b.{col}"))
            .otherwise(F.col(f"a.{col}"))
        )

    return (
        a.join(b, F.col("a.job_id") == F.col("b.job_id"), "full_outer")
        .select(
            F.coalesce("b.job_id", "a.job_id").alias("job_id"),
            pick("kind").alias("kind"),
            pick("seq").cast("long").alias("seq"),
            pick("queue").alias("queue"),
            F.when(b_only, "insert")
            .when(a_only, "keep")
            .when(b_newer, "update")
            .otherwise("skip")
            .alias("merge_action"),
        )
        .orderBy("job_id")
    )
