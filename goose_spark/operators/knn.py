"""All-vectors k-NN graph (ss10) — every vector's top-k cosine
neighbors, the materialized artifact graph-based ANN (HNSW/NSG
builds), SemDeDup-style curation, and label-propagation over
embeddings all start from.

Brute force is O(n²·dim) — structurally impossible at corpus scale.
This operator blocks by the SHARED session IVF coarse quantizer
(similarity.trained_ivf — the same k-means ss3/ss5/ss7/ss8 reuse):

  index role:  each vector lands in its own cell (1 row), cells above
               ``max_cell`` sub-block by member-id hash;
  query role:  each vector probes its ``nprobe`` nearest cells; a hot
               cell's ARRIVING probes sub-block by probe-id hash too,
               so neither kernel axis is ever unbounded;
  kernel:      one Arrow task per (cell, block, qblock) computes the
               probe × member cosine matrix (a single numpy matmul,
               ≤ max_cell on both axes) and emits local top-k;
  merge:       a vec_id window reduces the per-shard local rows to
               the global top-k.

Cost: Σ_cells (arriving probes × block size) pairs ≈ n · nprobe ·
avg_cell — linear in n for fixed cell geometry, never all-pairs; the
shuffle key is the cell id, exactly the IVF serve shape. Recall is
bounded by cell assignment (nprobe/k of the space), pinned by the
floor test in tests/test_knn.py against brute force.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from goose_spark.operators.similarity import (
    _assign,
    _embeddings,
    trained_ivf,
)
from goose_spark.queries.base import register

KNN_K = 10
#: Probed cells per vector. Measured recall-vs-nprobe on the testdata
#: corpus (k=10, 16 cells, sf0.01, vs brute force):
#:   nprobe  5 → 0.648   6 → 0.713   8 → 0.812   10 → 0.892
#:          12 → 0.944  16 → 1.000 (exact)
#: 10 clears the 0.8 recall floor with margin; measured warm cost at
#: sf0.1 is +8% vs nprobe=5 (1.59 → 1.71 s — kernel pairs scale ∝
#: nprobe, but at this input the fixed stage cost dominates; at corpus
#: scale the knob is a linear recall/cost dial).
KNN_NPROBE = 10
#: Index-side cell population above which the cell sub-blocks by id
#: hash — bounds every kernel task's gram matrix.
KNN_MAX_CELL = 4096

_PAIR_SCHEMA = "vec_id long, neighbor_id long, cos double"


def _knn_kernel(k: int):
    """Per-(cell, block) Arrow task: cosine matmul of arriving probe
    vectors against block members, local top-k per probe."""

    def go(pdf: pd.DataFrame) -> pd.DataFrame:
        members = pdf[pdf["role"] == 0]
        probes = pdf[pdf["role"] == 1]
        if members.empty or probes.empty:
            return pd.DataFrame(columns=["vec_id", "neighbor_id", "cos"])
        m_ids = members["vec_id"].to_numpy()
        m = np.asarray(list(members["emb"]), dtype=np.float64)
        p_ids = probes["vec_id"].to_numpy()
        p = np.asarray(list(probes["emb"]), dtype=np.float64)
        m_unit = m / np.maximum(np.linalg.norm(m, axis=1), 1e-12)[:, None]
        p_unit = p / np.maximum(np.linalg.norm(p, axis=1), 1e-12)[:, None]
        cos = p_unit @ m_unit.T  # (P, M)
        rows = []
        # deterministic member order for tie-stable argsort
        order = np.argsort(m_ids, kind="stable")
        m_ids, cos = m_ids[order], cos[:, order]
        top = min(k, cos.shape[1])
        for i, pid in enumerate(p_ids):
            # sort by (-cos, member_id): lexsort on (id, -cos) reversed
            idx = np.lexsort((m_ids, -cos[i]))[: top + 1]
            for j in idx:
                if m_ids[j] != pid:
                    rows.append((int(pid), int(m_ids[j]), float(cos[i, j])))
        return pd.DataFrame(rows, columns=["vec_id", "neighbor_id", "cos"])

    return go


def knn_graph(spark: SparkSession, v: DataFrame, centroids,
              k: int = KNN_K, nprobe: int = KNN_NPROBE,
              max_cell: int = KNN_MAX_CELL) -> DataFrame:
    """``v``: (vec_id, emb array<double>) → (vec_id, neighbor_id, rank,
    cos) — each vector's approximate top-k neighbors.

    BOTH kernel axes are bounded: members sub-block by ``max_cell``
    (hash on member id) and the arriving PROBES of a hot cell
    sub-block the same way (hash on probe id, ``qb`` shards sized from
    the per-cell probe count) — a popular cell attracting O(n) probes
    costs more tasks, never a bigger task. A (probe, member) pair
    meets exactly once: the member replicates across qblocks, the
    probe across member-blocks, and each is hashed to exactly one
    shard on its own axis.

    The slim (vec_id, cluster) assignment is persisted for the
    function's lifetime (16 bytes/row — the similarity.py session-cache
    discipline) so the centroid matmul runs once, not once per
    consumer."""
    cmat = np.asarray(centroids, dtype=np.float64)

    assignment = _assign(v, centroids).persist()
    # shards per cell on each axis: O(cells) rows, broadcast
    nblocks = (
        assignment.groupBy("cluster")
        .agg(F.ceil(F.count("*") / max_cell).cast("int").alias("nb"))
        .persist()
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.asarray(list(pdf["emb"]), dtype=np.float64)
            scores = mat @ cmat.T - 0.5 * (cmat * cmat).sum(axis=1)[None, :]
            top = np.argsort(-scores, axis=1)[:, :nprobe]
            rows = [
                (int(vid), int(c))
                for vid, cl in zip(pdf["vec_id"], top)
                for c in cl
            ]
            yield pd.DataFrame(rows, columns=["vec_id", "cluster"])

    probe_cells = v.mapInPandas(probe, schema="vec_id long, cluster int").persist()
    qblocks = (
        probe_cells.groupBy("cluster")
        .agg(F.ceil(F.count("*") / max_cell).cast("int").alias("qb"))
        .persist()
    )

    idx = (
        assignment.join(v, "vec_id")
        .join(F.broadcast(nblocks), "cluster")
        .join(F.broadcast(qblocks), "cluster")  # inner: probe-less cells do no work
        .withColumn("block", F.pmod(F.xxhash64("vec_id"), F.col("nb")).cast("int"))
        # a member must be visible to EVERY probe shard of its cell
        .withColumn("qblock", F.explode(F.sequence(F.lit(0), F.col("qb") - 1)))
        .select("cluster", "block", F.col("qblock").cast("int").alias("qblock"),
                "vec_id", "emb", F.lit(0).alias("role"))
    )

    probes = (
        probe_cells
        .join(v, "vec_id")
        .join(F.broadcast(nblocks), "cluster")
        .join(F.broadcast(qblocks), "cluster")
        .withColumn("qblock", F.pmod(F.xxhash64("vec_id"), F.col("qb")).cast("int"))
        # a probe must visit EVERY member block of its probed cell
        .withColumn("block", F.explode(F.sequence(F.lit(0), F.col("nb") - 1)))
        .select("cluster", F.col("block").cast("int").alias("block"), "qblock",
                "vec_id", "emb", F.lit(1).alias("role"))
    )

    local = (
        idx.unionByName(probes)
        .groupBy("cluster", "block", "qblock")
        .applyInPandas(lambda pdf: _knn_kernel(k)(pdf), schema=_PAIR_SCHEMA)
    )
    # no dedup stage: a member is hashed to one block (replicated over
    # qblocks), a probe to one qblock (replicated over blocks) — every
    # (probe, member) pair meets at exactly one (cell, block, qblock)
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
        .orderBy("vec_id", "rank")
    )


@register(
    "ss10_knn_graph",
    None,  # cell-blocked approximate — recall floor in tests/test_knn.py
    doc="All-vectors k-NN graph (k=10, 10-probe over the shared IVF "
        "cells, max_cell sub-blocking): one Arrow matmul per "
        "(cell, block), local top-k, vec_id-window merge — n·nprobe·"
        "avg_cell pairs, never all-pairs. Measured recall 0.892 vs "
        "brute force (curve in knn.py: 0.648@5 → 1.0@16; +8% warm cost "
        "vs 5-probe at sf0.1). The artifact HNSW builds and graph "
        "curation start from.",
    tags=("llm", "similarity"),
)
def ss10(spark: SparkSession, sf: str) -> DataFrame:
    v = _embeddings(spark, sf)
    return knn_graph(spark, v, trained_ivf(spark, sf))
