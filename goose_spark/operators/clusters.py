"""Near-dup cluster materialization — connected components over the
MinHash-LSH candidate graph, yielding the kept/dropped decision an LLM
data pipeline actually applies.

Algorithm: iterative min-label propagation to fixpoint — each doc's
cluster label starts as its own id; every pass each node adopts the
minimum label in its neighborhood. Converges in O(graph diameter)
passes; near-dup clusters are small and dense, so 3–5 passes close
virtually all of them and the loop exits on the first unchanged pass.

This is the canonical Spark iterative-algorithm shape (Pregel-lite):
a driver loop over DataFrame joins, each pass one shuffle keyed by
doc_id. At 100 TB the edge list (LSH pairs) is orders of magnitude
smaller than the corpus, so passes run over edges only; checkpointing
every ~5 passes truncates the lineage.

Oracle: the same fixpoint via DuckDB's WITH RECURSIVE (min-label
transitive closure) — identical clusters, engine-independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goose_spark.operators.dedup import _DD2_ORACLE
from goose_spark.queries.base import register, t

MAX_PASSES = 20  # safety bound; fixpoint exit is the normal path

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


@register(
    "dd6_dedup_clusters",
    _DD6_ORACLE,
    doc="Connected components over the MinHash-LSH near-dup graph via "
        "iterative min-label propagation (driver loop, one doc_id-keyed "
        "shuffle per pass, fixpoint exit). Output: (doc_id, cluster_id, "
        "is_keeper) — keeper = smallest doc_id in the cluster, the row a "
        "dedup pipeline retains.",
    tags=("llm", "dedup"),
)
def dd6(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.dedup import lsh_pairs

    pairs = lsh_pairs(spark, sf).select("a_id", "b_id")
    if pairs.count() <= FAST_PATH_MAX_EDGES:
        labels = pairs.coalesce(1).mapInPandas(
            _union_find_components, schema="doc_id long, cluster_id long"
        )
        out = labels.select(
            "doc_id",
            "cluster_id",
            (F.col("cluster_id") == F.col("doc_id")).alias("is_keeper"),
        ).orderBy("doc_id")
        return out
    edges = pairs.unionAll(
        pairs.select(F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"))
    ).withColumnRenamed("a_id", "src").withColumnRenamed("b_id", "dst")
    edges = edges.persist()

    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).persist()

    for _pass in range(MAX_PASSES):
        # each node adopts min(own label, min neighbor label)
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = labels.join(
            neighbor_min, labels.node == neighbor_min.src, "left"
        ).select(
            "node",
            F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
        )
        if (_pass + 1) % 5 == 0:
            # truncate lineage: persist alone keeps the logical plan
            # growing one join deeper per pass, and analyzer time blows
            # up before the data does on long chains. Superseded
            # checkpoint blocks cannot be freed explicitly (unpersist is
            # a no-op on them); dropping the Python reference when
            # `labels` is rebound below lets the JVM ContextCleaner
            # reclaim them — GC-driven, at most a handful of label
            # tables outstanding between GC cycles.
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break

    out = labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("label") == F.col("node")).alias("is_keeper"),
    ).orderBy("doc_id")
    edges.unpersist()
    return out
