"""Near-dup cluster materialization — connected components over the
MinHash-LSH candidate graph, yielding the kept/dropped decision an LLM
data pipeline actually applies.

Scale algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — each round
rewires every node toward the minimum id in its neighborhood, and the
alternation provably converges in O(log² n) rounds REGARDLESS of graph
diameter. (The previous min-label propagation needed O(diameter)
passes: a chain of drifting near-dups A~B~C~… — diameter ∝ cluster
size — would exhaust the pass budget and silently mislabel. LS/SS
closes a million-node path in ~20 rounds; non-convergence now raises
instead of returning wrong clusters.)

Each round is two groupBy-min + broadcast-free joins over the EDGE
list only — at 100 TB the LSH pair list is orders of magnitude
smaller than the corpus; per-round localCheckpoint truncates lineage.
No per-node collect_list anywhere: high-degree hubs stay row-shaped
(the emit is a join against the per-node min, and large-star itself
shrinks hub degrees — the paper's skew argument).

Oracle: min-label transitive closure via DuckDB's WITH RECURSIVE —
identical clusters (cluster id = min member id), engine-independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from goose_spark.operators.dedup import _DD2_ORACLE
from goose_spark.queries.base import register, t

#: Round budget for large-star/small-star. Convergence is O(log² n)
#: rounds, so 40 covers graphs far beyond any physical corpus (2^20
#: diameter ≈ 10^6-node chain closes in ~20). Exhausting it raises —
#: wrong cluster labels are worse than a failed job.
MAX_ROUNDS = 40

#: Below this edge count the component computation runs as ONE executor
#: task (union-find over the whole edge list via mapInPandas) instead of
#: the iterative join loop — the LSH candidate graph is orders of
#: magnitude smaller than the corpus, so even at 100 TB of documents the
#: pair list usually fits a single task; the iterative path remains the
#: fallback when it doesn't. This is standard practice (GraphFrames'
#: connectedComponents has the same small-graph shortcut).
FAST_PATH_MAX_EDGES = 2_000_000


def _union_find_components(batches):
    """mapInPandas kernel: min-root union-find over all edge batches of
    a single partition. Roots are always the smallest doc_id in the
    component, so cluster_id == min(member ids) — identical semantics to
    the min-label fixpoint and the recursive-CTE oracle."""
    import pandas as pd

    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for pdf in batches:
        for a, b in zip(pdf["a_id"].to_numpy(), pdf["b_id"].to_numpy()):
            a, b = int(a), int(b)
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
    nodes = sorted(parent)
    yield pd.DataFrame(
        {"doc_id": nodes, "cluster_id": [find(n) for n in nodes]},
        dtype="int64",
    )

def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: every node u connects each STRICTLY LARGER
    neighbor to min(Γ(u) ∪ {u}). Emitted via groupBy-min + join — no
    per-node neighbor list is ever materialized."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select("u", F.least("_mn", "u").alias("m"))
    )
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: orient edges toward the smaller endpoint,
    then every node connects its smaller neighbors (and itself) to the
    minimum among them."""
    ed = (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = ed.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        ed.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edges = mins.select(F.col("u"), F.col("m").alias("v"))
    return rewired.union(self_edges).distinct()


def connected_components(pairs: DataFrame, max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """Distributed connected components over an (a_id, b_id) edge list —
    alternating large-star/small-star to fixpoint. Returns
    (doc_id, cluster_id) for every node appearing in ``pairs``, with
    cluster_id = min member id (the keeper rule every caller shares).

    O(log² n) rounds on any graph shape; each round shuffles only the
    edge list. Raises RuntimeError if ``max_rounds`` is exhausted
    (cannot happen below ~2^sqrt(max_rounds)-node diameters — the guard
    exists so a bug fails loudly instead of mislabeling)."""
    nodes = (
        pairs.select(F.col("a_id").alias("doc_id"))
        .union(pairs.select(F.col("b_id").alias("doc_id")))
        .distinct()
    )
    e = (
        pairs.select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    converged = False
    prev_count = e.count()
    for _round in range(max_rounds):
        # localCheckpoint per round: the plan would otherwise deepen by
        # ~6 joins/round and analyzer time dominates long before data
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # fixpoint test, cheap probe first: unequal edge COUNTS (the
        # common mid-run case, a scan of two eager checkpoints) disprove
        # convergence without paying the exceptAll shuffle; the
        # exceptAll then certifies set equality (e2 ⊆ e ∧ |e2| = |e|)
        cnt = e2.count()
        if cnt == prev_count and e2.exceptAll(e).limit(1).count() == 0:
            e = e2
            converged = True
            break
        e = e2
        prev_count = cnt
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # fixpoint edge set is a star forest: (member, root) with root = min
    labels = e.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    out = (
        nodes.join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
    )
    return out


# oracle: reuse dd2's verified pair list as the edge set, then a
# recursive min-label closure over the undirected graph
_DD6_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT a_id, b_id FROM ({_DD2_ORACLE.replace(';', '')})
),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION ALL SELECT b_id, a_id FROM pairs
),
reach(node, label) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, r.label
  FROM edges e JOIN reach r ON e.dst = r.node
)
SELECT CAST(node AS BIGINT) AS doc_id,
       CAST(MIN(label) AS BIGINT) AS cluster_id,
       CAST(MIN(label) = node AS BOOLEAN) AS is_keeper
FROM reach GROUP BY node ORDER BY doc_id"""


def components_of(pairs: DataFrame) -> DataFrame:
    """Dispatch shared by dd6 and the incremental maintainer: (a_id,
    b_id) edges → (doc_id, cluster_id) labels, cluster_id = min member
    id. Single-task union-find below FAST_PATH_MAX_EDGES, alternating
    large-star/small-star above it."""
    if pairs.count() <= FAST_PATH_MAX_EDGES:
        return pairs.coalesce(1).mapInPandas(
            _union_find_components, schema="doc_id long, cluster_id long"
        )
    return connected_components(pairs)


@register(
    "dd6_dedup_clusters",
    _DD6_ORACLE,
    doc="Connected components over the MinHash-LSH near-dup graph: "
        "single-task union-find below FAST_PATH_MAX_EDGES, alternating "
        "large-star/small-star (O(log² n) rounds, diameter-independent) "
        "above it. Output: (doc_id, cluster_id, is_keeper) — keeper = "
        "smallest doc_id in the cluster, the row a dedup pipeline "
        "retains.",
    tags=("llm", "dedup"),
)
def dd6(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.dedup import lsh_pairs

    labels = components_of(lsh_pairs(spark, sf).select("a_id", "b_id"))
    return labels.select(
        "doc_id",
        "cluster_id",
        (F.col("cluster_id") == F.col("doc_id")).alias("is_keeper"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q84 — PageRank over the near-dup graph
# ---------------------------------------------------------------------------

PR_ITERS = 10
PR_DAMPING = 0.85


def pagerank(pairs: DataFrame, iters: int = PR_ITERS,
             damping: float = PR_DAMPING) -> DataFrame:
    """Power-iteration PageRank over an undirected (a_id, b_id) edge
    list (each edge walked both ways). Fixed ``iters`` rounds, each one
    edge-keyed join + one dst-keyed partial-agg shuffle over the EDGE
    list only — the canonical iterative-DataFrame shape, same lineage
    discipline as connected_components (localCheckpoint every 3 rounds).
    The symmetric closure has no dangling nodes, so no dangling-mass
    redistribution term is needed.

    Float contract: per-round sums are double; executor summation order
    can differ between runs/partitionings in the last ulp, so outputs
    are compared at tolerance (tests) and rounded for display — the
    standard contract for distributed floating-point iteration.

    Plan shape (optimization r14): the out-degree rides a count() window
    over the SAME src-keyed exchange that lays the edge cache out (one
    shuffle replaces the old groupBy + join-back pair), and the
    per-iteration join is a co-partitioned SHUFFLE_HASH join — both
    sides already hash-partitioned on the join key, so no per-iteration
    exchange AND no per-iteration broadcast of the O(nodes) rank table
    (the old plan let AQE broadcast ranks every round: fine at sf0.1,
    a driver/executor-memory cliff at a 10⁹-node corpus). Measured at
    sf0.1: output bit-identical (473 rows), Spark jobs per call ~33 →
    ~24 (fewer broadcast-build jobs); wall parity-to-modestly-better
    locally (host-noise-bounded at 17 MB inputs) — the win this change
    is FOR is the removed per-iteration broadcast at real scale."""
    e = pairs.filter(F.col("a_id") != F.col("b_id")).distinct()
    # both orientations from ONE pass over e (explode beats union: the
    # pair-table cache is scanned once, not twice)
    edges = e.select(
        F.explode(
            F.array(
                F.struct(F.col("a_id").alias("src"), F.col("b_id").alias("dst")),
                F.struct(F.col("b_id").alias("src"), F.col("a_id").alias("dst")),
            )
        ).alias("p")
    ).select("p.src", "p.dst")
    n_part = int(pairs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        edges.repartition(n_part, "src")
        .withColumn("deg", F.count("*").over(Window.partitionBy("src")))
        .persist()
    )
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    try:
        n = nodes.count()
        if n == 0:
            return nodes.select(
                F.col("node").alias("doc_id"), F.lit(0.0).alias("pr")
            )
        ranks = nodes.withColumn("r", F.lit(1.0 / n))
        base = (1.0 - damping) / n
        for i in range(iters):
            contribs = (
                # shuffle_hash: both sides are hash-partitioned on the
                # join key (edges cached by src, ranks by last round's
                # dst), so this is an exchange-free, sort-free,
                # broadcast-free per-partition hash join at ANY scale
                edges.join(ranks.hint("shuffle_hash"), edges.src == ranks.node)
                .select("dst", (F.col("r") / F.col("deg")).alias("c"))
            )
            ranks = (
                contribs.repartition(n_part, "dst")
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
                .select(
                    F.col("dst").alias("node"),
                    (F.lit(base) + damping * F.col("s")).alias("r"),
                )
            )
            if (i + 1) % 3 == 0:
                ranks = ranks.localCheckpoint(eager=True)
        # sever the result's lineage from the cached inputs so both can
        # be unpersisted (the full query sweep shares one JVM — leaked
        # cache blocks would crowd out the hot shingle/pair caches)
        ranks = ranks.localCheckpoint(eager=True)
    finally:
        # unconditional: the empty-graph early return and any mid-loop
        # failure must release the caches too (the returned frames
        # recompute via lineage if ever re-read)
        nodes.unpersist()
        edges.unpersist()
    out = ranks.select(
        F.col("node").alias("doc_id"), F.round("r", 6).alias("pr")
    ).orderBy(F.col("pr").desc(), "doc_id")
    return out


# ---------------------------------------------------------------------------
# q87 — degree-ordered triangle counting over the near-dup graph
# ---------------------------------------------------------------------------


def triangle_stats(pairs: DataFrame) -> DataFrame:
    """Exact triangle count + global clustering coefficient over an
    undirected (a_id, b_id) edge list via degree-ordered orientation
    (Schank & Wagner 2005 / the MapReduce form of Suri & Vassilvitskii
    2011): orient every edge from the (degree, id)-smaller endpoint to
    the larger, enumerate wedges only at each edge's SOURCE, and close
    them with one join back onto the oriented edge list.

    Why this is THE 100 TB shape: an oriented out-degree is O(√m) even
    at a celebrity node (a node of degree d only sources edges toward
    higher-degree nodes), so the wedge explosion a naive v-centered
    enumeration suffers on skewed graphs is structurally capped — the
    wedge count is Σ C(out-deg, 2) ≤ O(m^1.5) total, independent of the
    max degree. Each triangle has exactly one (deg, id)-minimal vertex
    and is counted exactly once at it. Everything is hash equi-joins +
    one aggregate; no iteration.

    Returns one row: (n_nodes, n_edges, n_wedges, n_triangles, gcc)
    where n_wedges = Σ C(deg, 2) over the UNDIRECTED graph and
    gcc = 3·triangles / wedges (the transitivity ratio).
    """
    from goose_spark.plans.guards import persist_shared

    # e fans out to FOUR subplans (both node scans, the degree joins,
    # the edge-count agg) and o to THREE (both wedge sides, the closing
    # semi-join): without materialization the canonicalize+distinct and
    # the degree joins re-executed per branch — the before plan ran 37
    # Spark jobs for a query whose data passes number ~4. One
    # persist_shared at each fan-out point (released between queries by
    # the sweep harness) collapses it (optimization r14, guide §1.2).
    e = persist_shared(
        pairs.filter(F.col("a_id") != F.col("b_id"))
        .select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
        )
        .distinct()
    )
    nodes = e.select(F.col("a_id").alias("v")).unionAll(
        e.select(F.col("b_id").alias("v"))
    )
    deg = nodes.groupBy("v").agg(F.count("*").alias("d"))
    de = (
        e.join(deg.select(F.col("v").alias("a_id"), F.col("d").alias("da")), "a_id")
        .join(deg.select(F.col("v").alias("b_id"), F.col("d").alias("db")), "b_id")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a_id") < F.col("b_id"))
    )
    o = persist_shared(de.select(
        F.when(a_first, F.col("a_id")).otherwise(F.col("b_id")).alias("src"),
        F.when(a_first, F.col("b_id")).otherwise(F.col("a_id")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dd"),
    ))
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src"))
        & (
            (F.col("e1.dd") < F.col("e2.dd"))
            | ((F.col("e1.dd") == F.col("e2.dd")) & (F.col("e1.dst") < F.col("e2.dst")))
        ),
    ).select(F.col("e1.dst").alias("v1"), F.col("e2.dst").alias("v2"))
    closing = o.select(F.col("src").alias("v1"), F.col("dst").alias("v2"))
    tri = wedges.join(closing, ["v1", "v2"], "left_semi")
    counts = (
        tri.agg(F.count("*").alias("n_triangles"))
        .crossJoin(F.broadcast(e.agg(F.count("*").alias("n_edges"))))
        .crossJoin(
            F.broadcast(
                deg.agg(
                    F.count("*").alias("n_nodes"),
                    F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"),
                )
            )
        )
    )
    return counts.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            F.when(
                F.col("n_wedges") > 0,
                3.0 * F.col("n_triangles") / F.col("n_wedges"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("gcc"),
    )


def _q87_oracle() -> str:
    from goose_spark.operators.dedup import pairs_sql_ctes

    return f"""
WITH {pairs_sql_ctes()},
e AS (SELECT a_id, b_id FROM pairs WHERE a_id <> b_id),
n AS (SELECT a_id AS v FROM e UNION ALL SELECT b_id FROM e),
deg AS (SELECT v, COUNT(*) AS d FROM n GROUP BY v),
de AS (SELECT e.a_id, e.b_id, da.d AS da, db.d AS db
       FROM e JOIN deg da ON da.v = e.a_id JOIN deg db ON db.v = e.b_id),
o AS (SELECT CASE WHEN da < db OR (da = db AND a_id < b_id) THEN a_id ELSE b_id END AS src,
             CASE WHEN da < db OR (da = db AND a_id < b_id) THEN b_id ELSE a_id END AS dst,
             CASE WHEN da < db OR (da = db AND a_id < b_id) THEN db ELSE da END AS dd
      FROM de),
w AS (SELECT e1.dst AS v1, e2.dst AS v2 FROM o e1 JOIN o e2
      ON e1.src = e2.src
      AND (e1.dd < e2.dd OR (e1.dd = e2.dd AND e1.dst < e2.dst))),
tri AS (SELECT COUNT(*) AS n_triangles FROM w
        WHERE EXISTS (SELECT 1 FROM o WHERE o.src = w.v1 AND o.dst = w.v2)),
agg AS (SELECT COUNT(*) AS n_nodes, SUM(d * (d - 1) // 2) AS n_wedges FROM deg)
SELECT agg.n_nodes, (SELECT COUNT(*) FROM e) AS n_edges,
       CAST(agg.n_wedges AS BIGINT) AS n_wedges, tri.n_triangles,
       ROUND(CASE WHEN agg.n_wedges > 0
                  THEN 3.0 * tri.n_triangles / agg.n_wedges
                  ELSE 0.0 END, 6) AS gcc
FROM agg CROSS JOIN tri"""


@register(
    "q87_triangle_count",
    _q87_oracle(),
    doc="Exact triangle count + transitivity over the verified near-dup "
        "pair graph, degree-ordered orientation (Schank/Wagner; Suri & "
        "Vassilvitskii MR form): orient each edge toward the (deg,id)-"
        "larger endpoint, enumerate wedges at sources (out-degree is "
        "O(√m) even at celebrity nodes — the skew cap), close with one "
        "semi-join. Dup clusters are near-cliques, so transitivity is "
        "the density audit of the dedup graph. All hash joins, no "
        "iteration, counted-once per triangle at its minimal vertex. "
        "(Plan-audit note: the explain tree re-derives the whole "
        "lsh_pairs lineage per branch, so PLANS.md counts look large; "
        "execution reads the session-persisted pair table once — the "
        "same cache dd6/dd7/q84 share.)",
    tags=("llm", "graph"),
)
def q87(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.dedup import lsh_pairs

    return triangle_stats(lsh_pairs(spark, sf).select("a_id", "b_id"))


@register(
    "q84_pagerank",
    None,  # iterative float fixpoint — rows-only; numpy cross-check in tests
    doc="PageRank (10 power iterations, d=0.85) over the verified "
        "near-dup pair graph: centrality picks the canonical document "
        "per duplicate neighborhood (the web-scale corpus-curation "
        "authority signal). Each round shuffles only the edge list; "
        "lineage truncated every 3 rounds.",
    tags=("llm", "graph"),
)
def q84(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.dedup import lsh_pairs

    return pagerank(lsh_pairs(spark, sf).select("a_id", "b_id"))


# ---------------------------------------------------------------------------
# qg1 — bounded-depth BFS reachability (min-hop labels)
# ---------------------------------------------------------------------------

#: Session cache for the co-purchase pair table shared by qg1 AND qg2
#: (optimization r14, guide §2.4: both queries were independently
#: paying the lineitem per-order self-join + distinct — measured
#: 3.1 s warm at sf0.1 — for the IDENTICAL (a, b) pair list). Same
#: pattern and lifecycle as dedup's lsh_verified_pairs: keyed on
#: sf_dir, build attributed to first use via BUILD_LOG / the bench
#: cache_builds sidecar, evicted with the session.
_COPURCHASE_CACHE: dict = {}


def copurchase_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct undirected co-purchase pairs (a < b): parts sharing an
    order. One hash-shuffle on l_orderkey bounded by items/order, one
    distinct — the exact `p` CTE of the qg1/qg2 oracles."""
    from goose_spark.operators.cache import get_or_persist

    def build() -> DataFrame:
        li = t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
        x, y = li.alias("x"), li.alias("y")
        return (
            x.join(
                y,
                (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
                & (F.col("x.l_partkey") < F.col("y.l_partkey")),
            )
            .select(
                F.col("x.l_partkey").alias("a"),
                F.col("y.l_partkey").alias("b"),
            )
            .distinct()
        )

    return get_or_persist(
        _COPURCHASE_CACHE, spark, sf, build, label="copurchase_pairs"
    )


#: BFS depth bound — at 100 TB reachability queries are always
#: depth-bounded (unbounded closure over a near-clique is answer-size
#: suicide); 3 hops covers the "neighborhood of a seed set" use
_QG1_MAX_HOPS = 3

_QG1_ORACLE = f"""WITH RECURSIVE
 p AS (SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
       FROM lineitem l1 JOIN lineitem l2
         ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
 e AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
 bfs(node, hops) AS (
   SELECT CAST(p_partkey AS BIGINT), 0 FROM part WHERE p_partkey % 1000 = 0
   UNION
   SELECT e.b, bfs.hops + 1
   FROM bfs JOIN e ON e.a = bfs.node
   WHERE bfs.hops < {_QG1_MAX_HOPS})
SELECT node, CAST(MIN(hops) AS BIGINT) AS hops
FROM bfs GROUP BY node ORDER BY node"""


@register(
    "qg1_reachability_bfs",
    _QG1_ORACLE,
    doc=f"Bounded-depth BFS with min-hop labels over the co-purchase "
        f"graph (parts sharing an order), seeds = p_partkey %% 1000 = 0 "
        f"— the 'blast radius of a recalled part' / 'neighborhood of a "
        f"flagged document' traversal, and the registry's only "
        f"frontier-iteration operator (q84/q87/dd6 iterate to a "
        f"fixpoint; this walks layer-by-layer). Oracle is ANSI "
        f"WITH RECURSIVE (DuckDB runs it natively; "
        f"tests/test_recursive_cte.py pins Spark 4.1's own UnionLoop "
        f"against the same shape for q90). Spark plan: the edge list "
        f"is built once (per-order self-join bounded by items/order, "
        f"one distinct) and persisted; each of the {_QG1_MAX_HOPS} "
        f"rounds is frontier JOIN edges (hash on the node key) + "
        f"anti-join visited + distinct — O(frontier x avg-degree) "
        f"rows per round, lineage truncated per round via eager "
        f"localCheckpoint so round k's plan does not replay rounds "
        f"1..k-1. At 100 TB the frontier join partitions on node id; "
        f"no stage is graph-sized except the edge build, which is the "
        f"same exchange the recursive CTE's UnionLoop would run.",
    tags=("relational", "graph"),
)
def qg1(spark: SparkSession, sf: str) -> DataFrame:
    p = copurchase_pairs(spark, sf)
    # both orientations in ONE pass over the cached pair table
    # (explode beats union: the cache is scanned once per consumer,
    # not twice — same shape as pagerank's edge build)
    edges = p.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("a"), F.col("b").alias("b")),
                F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    seeds = (
        t(spark, sf, "part")
        .filter(F.col("p_partkey") % 1000 == 0)
        .select(F.col("p_partkey").cast("long").alias("node"))
    )
    visited = seeds.withColumn("hops", F.lit(0).cast("long")) \
        .localCheckpoint(eager=True)
    frontier = visited.select("node")
    for hop in range(1, _QG1_MAX_HOPS + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("hops", F.lit(hop).cast("long"))
            # nxt is each round's ONLY new lineage — checkpointing it
            # keeps round k's plan from replaying rounds 1..k-1
            .localCheckpoint(eager=True)
        )
        # visited stays a LAZY union of already-checkpointed layers
        # (depth-_QG1_MAX_HOPS lineage of ExistingRDD scans): the old
        # per-round eager visited checkpoint re-materialized the whole
        # visited set every hop — one full job per round for data the
        # layer checkpoints already hold (guide §1.2: don't recompute
        # what you already have)
        visited = visited.unionAll(nxt)
        frontier = nxt.select("node")
    return visited.orderBy("node")


# ---------------------------------------------------------------------------
# qg2 — link prediction: common-neighbor Jaccard over non-edges
# ---------------------------------------------------------------------------

#: predicted links kept per source node — the serving contract of a
#: link-prediction op is always top-k, never the full score matrix
_QG2_TOP_K = 3

_QG2_ORACLE = f"""WITH p AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
 e AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
 deg AS (SELECT a AS node, COUNT(*) AS d FROM e GROUP BY a),
 w AS (SELECT e1.b AS a, e2.b AS b, COUNT(*) AS cn
       FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
       GROUP BY e1.b, e2.b),
 nw AS (SELECT w.a, w.b, w.cn FROM w
        LEFT JOIN p ON w.a = p.a AND w.b = p.b
        WHERE p.a IS NULL),
 j AS (SELECT nw.a, nw.b, CAST(nw.cn AS BIGINT) AS cn,
              ROUND(CAST(nw.cn AS DOUBLE)
                    / (da.d + db.d - nw.cn), 6) AS jac
       FROM nw JOIN deg da ON da.node = nw.a
               JOIN deg db ON db.node = nw.b),
 r AS (SELECT *, ROW_NUMBER() OVER
         (PARTITION BY a ORDER BY jac DESC, b) AS rk
       FROM j)
SELECT a, b, cn, jac, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {_QG2_TOP_K} AND a % 100 = 0
ORDER BY a, rk"""


@register(
    "qg2_link_prediction",
    _QG2_ORACLE,
    doc=f"Link prediction by common-neighbor Jaccard: for node pairs "
        f"NOT currently connected, score |N(a) n N(b)| / |N(a) u N(b)| "
        f"and keep the top-{_QG2_TOP_K} predicted links per source "
        f"node (reported for the a %% 100 = 0 probe slice) — the "
        f"'parts frequently co-purchased with yours but never with "
        f"each other' / 'documents whose neighbor sets overlap but "
        f"which no near-dup edge joins' recommender shape, and the "
        f"registry's first non-edge-scoring graph op (q87 counts "
        f"closed wedges; this scores the OPEN ones). Plan: wedge "
        f"enumeration at each center (e1 JOIN e2 on the center key, "
        f"one shuffle) with the probe slice pushed onto e1 BEFORE the "
        f"join (a kept pair's a is always e1.b, so the cut is lossless "
        f"and shrinks the wedge side ~100x), "
        f"hash-agg to per-pair common-neighbor counts, "
        f"LEFT ANTI against the edge list to keep non-edges only, "
        f"degree joins partitioned on each endpoint (the degree table "
        f"is node-sized — never broadcast), then WindowGroupLimit "
        f"keeps {_QG2_TOP_K} rows per node pre-shuffle. Scale: wedge "
        f"volume is sum_c deg(c)^2 — the hub-cap dial (cap centers at "
        f"max-degree D by sampling neighbors, q87's orientation "
        f"argument) bounds it at 100 TB; exact here because the "
        f"oracle must match.",
    tags=("relational", "graph"),
)
def qg2(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    # shared session-cached pair table (built once for qg1 AND qg2)
    p = copurchase_pairs(spark, sf)
    e = p.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("a"), F.col("b").alias("b")),
                F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    deg = e.groupBy(F.col("a").alias("node")).agg(F.count("*").alias("d"))
    # Probe-slice pushdown (guide §2.3 filter before the exchange): the
    # query only REPORTS pairs whose smaller endpoint a is in the
    # a % 100 = 0 slice, the per-a window rank never mixes slices, and
    # a predicted pair's a is always e1.b of its wedges — so wedges
    # whose e1.b is outside the slice can never reach the output.
    # Filtering e1 BEFORE the wedge join cuts its left side (and the
    # pair hash-agg) ~100x without changing any kept row's cn: the
    # common-neighbor count for a kept (a, b) ranges over e2 centers,
    # which stay unfiltered.
    e1 = e.filter(F.col("b") % 100 == 0).alias("e1")
    e2 = e.alias("e2")
    w = (
        e1.join(
            e2,
            (F.col("e1.a") == F.col("e2.a")) & (F.col("e1.b") < F.col("e2.b")),
        )
        .groupBy(F.col("e1.b").alias("a"), F.col("e2.b").alias("b"))
        .agg(F.count("*").alias("cn"))
    )
    nw = w.join(p, ["a", "b"], "left_anti")
    j = (
        nw.join(deg.withColumnRenamed("node", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("d", "db"), "b")
        .select(
            "a", "b", F.col("cn").cast("long").alias("cn"),
            F.round(
                F.col("cn").cast("double") / (F.col("da") + F.col("db") - F.col("cn")),
                6,
            ).alias("jac"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("a").orderBy(F.desc("jac"), F.asc("b"))
    )
    return (
        j.withColumn("rk", rk.cast("long"))
        .filter((F.col("rk") <= _QG2_TOP_K) & (F.col("a") % 100 == 0))
        .orderBy("a", "rk")
    )
