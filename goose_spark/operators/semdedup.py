"""SemDeDup — semantic (embedding-space) deduplication, cluster-blocked
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): k-means the embeddings, compute
pairwise cosine ONLY within each cluster, and drop all but one of every
semantic-duplicate group.

Why this is the 100 TB shape: exact all-pairs cosine is O(n²); dd5's
label/LSH blocking catches lexical near-dups, but semantically
duplicated content (same meaning, different words) only collides in
embedding space. SemDeDup's answer is the same blocking idea with the
coarse quantizer as the blocker — within-cluster pair cost is
O(Σ c_i²) ≈ n²/k for balanced clusters, and the cluster id is a
shuffle/partition key. The paper accepts missing cross-cluster pairs
(boundary duplicates) as the approximation; recall against the
unblocked exact answer is pinned in tests.

Decomposition here (reusing the ANN machinery — ONE shared trained
quantizer per session, `similarity.trained_ivf`):

1. assign every vector to its k-means cell (zero-shuffle Arrow matmul);
2. ``applyInPandas`` per cell: L2-normalize, one gram matrix, greedy
   keep-first sweep in ascending ``vec_id`` order (deterministic under
   any partitioning — the keep decision depends only on cell content);
3. output one row per DROPPED vector with its kept representative and
   their cosine — the excision list a curation pipeline feeds back.

Degenerate cells (a mass-duplicate corpus collapsing into one cell) are
handled like the LSH hot buckets (dedup.py max_bucket): cells larger
than ``max_cell`` are sub-blocked by a deterministic hash of vec_id —
bounded kernel memory, still quadratic only within sub-blocks; the
pairs lost to sub-blocking are between vectors that ALREADY have ≥1
duplicate partner in-block with overwhelming probability on such a
corpus (test pins behavior).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goose_spark.queries.base import register

#: cosine threshold: above = semantic duplicate. The paper tunes τ per
#: corpus (~0.95 for web-scale CLIP embeddings); the synthetic testdata
#: embeddings are near-orthogonal random vectors whose planted near-dups
#: sit at cos ≥ 0.4 (dd5 uses the same bar), so τ follows the corpus.
SEM_TAU = 0.4
MAX_CELL = 20_000  # sub-block cap: bounds the per-task gram matrix


def semdedup(v: DataFrame, spark: SparkSession, centroids,
             tau: float = SEM_TAU, max_cell: int = MAX_CELL) -> DataFrame:
    """(dropped_id, kept_id, cos, cluster): per-cell greedy dedup.
    ``v`` must carry (vec_id, emb); ``centroids`` is the trained coarse
    quantizer (list of k dim-vectors)."""
    import numpy as np

    from goose_spark.operators.annindex import _assign_with_emb

    # carries emb through the assignment kernel — no shuffle join back
    # to the corpus (the same reason the index build uses it)
    assigned = _assign_with_emb(v, centroids).select("vec_id", "cluster", "emb")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.asarray(list(pdf["emb"].iloc[order]), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        gram = mat @ mat.T
        kept_mask = np.ones(len(ids), dtype=bool)
        drop_rows = []
        for j in range(1, len(ids)):
            # earliest kept i<j with cos >= tau claims j (keep-first
            # sweep: deterministic given the cell's id set)
            sims = gram[j, :j]
            cand = np.where(kept_mask[:j] & (sims >= tau))[0]
            if len(cand):
                i = int(cand[0])
                kept_mask[j] = False
                drop_rows.append(
                    (int(ids[j]), int(ids[i]), float(round(gram[j, i], 6)),
                     int(pdf["cluster"].iloc[0]))
                )
        return pd.DataFrame(
            drop_rows, columns=["dropped_id", "kept_id", "cos", "cluster"]
        )

    # sub-block oversized cells by a deterministic id hash; normal cells
    # get sub=0 so the group key stays (cluster, 0) == the whole cell
    count_rows = assigned.groupBy("cluster").count().collect()  # one job
    big = {r["cluster"] for r in count_rows if r["count"] > max_cell}
    if big:
        n_splits = {
            r["cluster"]: -(-r["count"] // max_cell)
            for r in count_rows if r["cluster"] in big
        }
        split_expr = F.lit(1)
        for c, s in n_splits.items():
            split_expr = F.when(F.col("cluster") == c, F.lit(s)).otherwise(split_expr)
        assigned = assigned.withColumn(
            "sub", F.pmod(F.xxhash64("vec_id"), split_expr).cast("int")
        )
    else:
        assigned = assigned.withColumn("sub", F.lit(0))
    return (
        assigned.groupBy("cluster", "sub")
        .applyInPandas(kernel, schema="dropped_id long, kept_id long, cos double, cluster int")
        .orderBy("dropped_id")
    )


@register(
    "ss8_semdedup",
    None,  # approximate (cluster-blocked; misses boundary pairs) —
    # rows-only; recall vs the unblocked exact answer pinned in
    # tests/test_semdedup.py
    doc="SemDeDup (Abbas et al. 2023): semantic dedup blocked by the "
        "k-means cells of the SHARED session coarse quantizer (one "
        "train across ss3/ss5/ss7/ss8). Per-cell gram matrix + greedy "
        "keep-first sweep emits (dropped, kept, cos) excision rows; "
        "within-cluster cost ≈ n²/k, the cluster id is the shuffle "
        "key, and cells above max_cell sub-block by id hash (the LSH "
        "hot-bucket treatment) so no task ever holds an unbounded gram "
        "matrix. The embedding-space complement to dd2-dd5's lexical "
        "near-dup family.",
    tags=("llm", "dedup", "similarity"),
)
def ss8(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.similarity import _embeddings, trained_ivf

    v = _embeddings(spark, sf)
    return semdedup(v, spark, trained_ivf(spark, sf))
