"""MMR diversified retrieval (ss9) — Maximal Marginal Relevance
re-ranking (Carbonell & Goldstein, SIGIR'98) over a candidate pool:

    mmr(d) = λ · cos(q, d) − (1 − λ) · max_{s ∈ selected} cos(d, s)

Pure top-k retrieval over a deduplicated-but-still-redundant corpus
returns near-identical passages; RAG/eval harnesses re-rank with MMR
so the k results cover the neighborhood instead of repeating it. This
is the retrieval-side twin of SemDeDup (ss8): ss8 removes redundancy
from the CORPUS, MMR removes it from each RESULT SET.

Scale shape: the expensive stage is candidate generation, which
reuses the existing retrieval plans (exact ss1 shape here; the
partition-pruned IVF index serves the same rows at 100 TB). The MMR
kernel itself is per-query greedy selection over C candidates — an
O(C²·dim) dense problem on ≤ C rows, run as one Arrow batch per query
via applyInPandas, queries distributed across executors. Nothing
grows with corpus size: C is a constant (default 3× top-k).

Determinism: relevance and pairwise cosines are computed with the
same float64 numpy ops inside the kernel; ties broken by neighbor_id.
Rows-only for the driver (greedy selection is not SQL-expressible);
pinned by an independent pure-Python reimplementation in
tests/test_mmr.py plus λ=1 ≡ relevance-ranking and cluster-coverage
properties.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from goose_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    _dot,
    _embeddings,
)
from goose_spark.plans.guards import EMBEDDING_ROW_CAP, bounded_broadcast
from goose_spark.queries.base import register

#: Candidate pool size per query (3× the returned k).
CAND_K = 3 * TOP_K
#: Relevance/diversity trade-off (1.0 = pure relevance).
MMR_LAMBDA = 0.7

_OUT_SCHEMA = (
    "query_id long, neighbor_id long, rank int, relevance double, "
    "mmr_score double"
)


def _mmr_kernel(lam: float, top_k: int):
    """Per-query greedy MMR over one Arrow batch of candidates."""

    def go(pdf: pd.DataFrame) -> pd.DataFrame:
        q = np.asarray(pdf["qe"].iloc[0], dtype=np.float64)
        ids = pdf["neighbor_id"].to_numpy()
        mat = np.asarray(list(pdf["emb"]), dtype=np.float64)  # (C, dim)
        qn = q / max(np.linalg.norm(q), 1e-12)
        norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-12)
        unit = mat / norms[:, None]
        rel = unit @ qn                       # cos(q, d)
        sim = unit @ unit.T                   # cos(d, d')
        # deterministic candidate order: by id (ties in scores then
        # resolve to the smaller neighbor_id via argmin over (-score, id))
        order = np.argsort(ids, kind="stable")
        ids, rel, sim, unit = ids[order], rel[order], sim[order][:, order], unit[order]
        n = len(ids)
        selected: list[int] = []
        rows = []
        remaining = list(range(n))
        for rank in range(1, min(top_k, n) + 1):
            if not selected:
                scores = lam * rel
            else:
                red = sim[:, selected].max(axis=1)
                scores = lam * rel - (1.0 - lam) * red
            best = min(remaining, key=lambda i: (-scores[i], ids[i]))
            selected.append(best)
            remaining.remove(best)
            rows.append(
                (
                    int(pdf["query_id"].iloc[0]),
                    int(ids[best]),
                    rank,
                    round(float(rel[best]), 6),
                    round(float(scores[best]), 6),
                )
            )
        return pd.DataFrame(
            rows,
            columns=["query_id", "neighbor_id", "rank", "relevance", "mmr_score"],
        )

    return go


def _apply_mmr(cand: DataFrame, lam: float, top_k: int) -> DataFrame:
    """The ONE kernel application both candidate stages share: ``cand``
    is (query_id, qe, neighbor_id, emb), one Arrow batch per query."""
    return (
        cand.groupBy("query_id")
        .applyInPandas(_mmr_kernel(lam, top_k), schema=_OUT_SCHEMA)
        .orderBy("query_id", "rank")
    )


def mmr_rerank(emb: DataFrame, queries: DataFrame, top_k: int = TOP_K,
               cand_k: int = CAND_K, lam: float = MMR_LAMBDA,
               n_queries: int | None = None) -> DataFrame:
    """``emb``: (vec_id, emb array<double>); ``queries``: (query_id, qe).
    Exact-cosine candidate stage (rank ≤ cand_k, WindowGroupLimit keeps
    the per-partition top below the shuffle), then the per-query MMR
    kernel. ``mmr_rerank_indexed`` is the same kernel behind the
    partition-pruned IVF candidate stage — the corpus-scale form."""
    cos = _dot(F.col("qe"), F.col("emb")) / F.sqrt(
        _dot(F.col("qe"), F.col("qe")) * _dot(F.col("emb"), F.col("emb"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    cand = (
        bounded_broadcast(queries, max_rows=EMBEDDING_ROW_CAP, n_rows=n_queries,
                          label='mmr queries')
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qe", F.col("vec_id").alias("neighbor_id"),
                "emb", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= cand_k)
        .drop("rank", "cos")
    )
    return _apply_mmr(cand, lam, top_k)


def mmr_rerank_indexed(spark: SparkSession, index_dir: str, queries: DataFrame,
                       top_k: int = TOP_K, cand_k: int = CAND_K,
                       lam: float = MMR_LAMBDA, nprobe: int | None = None) -> DataFrame:
    """MMR over candidates served from a persisted IVF index
    (``annindex.build_ivf_index``) instead of a corpus-wide cosine
    scan — the 100 TB form: the candidate stage reads only the probed
    cells (static ``PartitionFilters`` IN list on the assignments
    scan), and the unchanged per-query kernel re-ranks those ≤ cand_k
    rows. Recall-parity with the exact stage is pinned by
    ``tests/test_mmr.py::test_indexed_candidates_recall_parity``."""
    from goose_spark.operators.annindex import ivf_candidates
    from goose_spark.operators.similarity import IVF_NPROBE

    cand = ivf_candidates(
        spark, index_dir, queries,
        nprobe=IVF_NPROBE if nprobe is None else nprobe, cand_k=cand_k,
    )
    return _apply_mmr(cand, lam, top_k)


@register(
    "ss9_mmr_rerank",
    None,  # greedy selection — rows-only; pinned by test_mmr cross-impl
    doc="MMR diversified top-k (λ=0.7, pool 3k): exact-cosine candidate "
        "stage + per-query greedy re-rank kernel (O(C²·dim) on constant "
        "C via applyInPandas). Result sets cover the neighborhood "
        "instead of repeating it — the retrieval twin of SemDeDup.",
    tags=("llm", "similarity"),
)
def ss9(spark: SparkSession, sf: str) -> DataFrame:
    v = _embeddings(spark, sf)
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    return mmr_rerank(v, q, n_queries=N_QUERIES)


@register(
    "ss12_mmr_indexed",
    None,  # approximate (probed-cell candidates) — rows-only; recall
    # parity vs the exact stage pinned in tests/test_mmr.py
    doc="MMR diversified top-k served from the PERSISTED IVF index "
        "(mmr_rerank_indexed): the candidate stage is the same "
        "partition-pruned probed-cell read ss5/ss11 use — a query "
        "batch opens nprobe/k of the corpus, never a corpus-wide "
        "cosine scan — and the unchanged per-query greedy kernel "
        "re-ranks those ≤ cand_k rows. ss9 is the exact-stage "
        "cross-check; THIS is the 100 TB serve shape "
        "(recall-parity ≥ 0.9 vs ss9 pinned in test_mmr).",
    tags=("llm", "similarity"),
)
def ss12(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.similarity import ivf_index_for

    idx = ivf_index_for(spark, sf)
    v = _embeddings(spark, sf)
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    return mmr_rerank_indexed(spark, idx, q)
