"""Product quantization (PQ) — the ANN MEMORY-scale path (FAISS's
IndexPQ): compress each embedding to M one-byte codes so the candidate
scan touches M bytes per vector instead of dim×8.

At 100 TB of embeddings the bottleneck isn't compute, it's keeping the
scanned representation small: 64-dim float64 vectors are 512 B; with
M=8 subspaces × 256 codes each, a vector is 8 B (64× smaller), and
asymmetric-distance (ADC) lookups reconstruct distances from a
per-query M×256 table without ever touching the original floats.

Scalable decomposition, same shape discipline as IVF/BPE:
- codebooks train on a BOUNDED sample collected to the driver (FAISS
  practice; codebooks are k×dim floats total, sample is ≤4096 vectors
  — documented driver traffic, like k-means' k×dim per iteration);
- encoding is a zero-shuffle Arrow map over the corpus (the 100 TB
  pass), emitting BinaryType codes;
- queries scan codes with numpy table lookups, emitting per-partition
  top-k only (partitions × queries × k rows to the final merge — the
  classic partial top-k funnel, never the full distance matrix).

Cosine correctness: vectors are L2-normalized before encoding, so
ADC's L2² ranking is monotone with cosine (cos = 1 − L2²/2 on the unit
sphere). Recall vs the exact top-k is pinned in tests/test_pq.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from goose_spark.operators.similarity import _DIM, _embeddings, N_QUERIES, TOP_K
from goose_spark.queries.base import register

PQ_M = 8  # subspaces (codes per vector = bytes per vector)
PQ_K = 256  # centroids per subspace (1-byte codes)
PQ_SAMPLE = 4096  # codebook training sample (bounded driver traffic)
PQ_ITERS = 10
#: Exact-cosine re-rank depth (topk × PQ_REFINE ADC candidates) — the
#: FAISS refine stage ivfpq_query already had, added to ss6 in round 11:
#: measured recall@10 0.53→0.95 (sf0.001) / 0.62→0.97 (sf0.01) for 40
#: full-precision rows per query (RECALL_CURVES.md ss6 table).
PQ_REFINE = 4
_SUB = _DIM // PQ_M


def train_codebooks(v: DataFrame) -> "np.ndarray":  # noqa: F821
    """Per-subspace k-means on a bounded normalized sample. Returns
    (M, K, dim/M) codebooks. Deterministic: fixed sample order (by
    vec_id), init from the first K distinct subvectors, fixed Lloyd
    iteration count."""
    import numpy as np

    sample = (
        v.orderBy("vec_id").limit(PQ_SAMPLE).select("emb").collect()
    )
    mat = np.asarray([r["emb"] for r in sample], dtype=np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    books = np.zeros((PQ_M, PQ_K, _SUB), dtype=np.float64)
    for m in range(PQ_M):
        sub = mat[:, m * _SUB : (m + 1) * _SUB]
        cent = sub[np.unique(sub.round(9), axis=0, return_index=True)[1][:PQ_K]]
        if len(cent) < PQ_K:  # tiny corpora: pad by wrapping
            cent = np.resize(cent, (PQ_K, _SUB))
        for _ in range(PQ_ITERS):
            # argmin ||x-c||² == argmax (x·c - ||c||²/2): one matmul,
            # not an (n,K,sub) broadcast tensor
            a = (sub @ cent.T - 0.5 * (cent * cent).sum(axis=1)[None, :]).argmax(axis=1)
            sums = np.zeros_like(cent)
            np.add.at(sums, a, sub)
            counts = np.bincount(a, minlength=PQ_K)
            nz = counts > 0
            cent[nz] = sums[nz] / counts[nz, None]
        books[m] = cent
    return books


#: session-scoped trained codebooks — ss6 (inline PQ) and ss7 (IVF+PQ
#: build) train the same deterministic per-subspace k-means on the same
#: bounded sample; once per (session, sf) suffices. Cold-train tests
#: call train_codebooks directly.
_PQ_BOOKS_CACHE: dict = {}


def trained_codebooks(spark: SparkSession, sf: str):
    from goose_spark.operators.cache import get_or_compute

    return get_or_compute(
        _PQ_BOOKS_CACHE, spark, sf,
        lambda: train_codebooks(_embeddings(spark, sf)),
        label="pq_codebooks",
    )


def pq_encode(mat, bk):
    """Encode a raw (n, dim) float batch to (n, M) uint8 PQ codes:
    L2-normalize, then per-subspace nearest-centroid
    (argmin ||x−c||² == argmax (x·c − ||c||²/2)). The ONE encode
    routine — corpus encoding and the fused IVF+PQ build kernel both
    call it, so a change (e.g. a zero-norm guard) cannot diverge."""
    import numpy as np

    # zero-norm guard: an all-zero embedding would otherwise yield NaN
    # codes that silently corrupt every ADC distance it appears in
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    codes = np.empty((len(unit), PQ_M), dtype=np.uint8)
    for m in range(PQ_M):
        sub = unit[:, m * _SUB : (m + 1) * _SUB]
        scores = sub @ bk[m].T - 0.5 * (bk[m] * bk[m]).sum(axis=1)[None, :]
        codes[:, m] = scores.argmax(axis=1)
    return codes


def encode_corpus(v: DataFrame, books) -> DataFrame:
    """The 100 TB pass: zero-shuffle Arrow map normalizing each vector
    and emitting its M-byte PQ code as BinaryType."""
    import numpy as np

    bk = np.asarray(books)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.asarray(list(pdf["emb"]), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "code": [c.tobytes() for c in pq_encode(mat, bk)],
                }
            )

    return v.mapInPandas(kernel, schema="vec_id long, code binary")


def adc_topk(codes: DataFrame, queries, books, topk: int = TOP_K,
             probes: dict | None = None) -> DataFrame:
    """Asymmetric-distance top-k: per query, an M×K table of partial
    L2² against the NORMALIZED query; each partition scans its codes
    with numpy fancy-indexed lookups and emits only its local top-k per
    query — the global WindowGroupLimit merges partitions × q × k rows.

    ``probes`` (optional): ``{query_id: set(cluster_ids)}`` restricting
    each query's candidates to its OWN probed cells; requires a
    ``cluster`` column on ``codes``. Without it, an IVF caller passing
    the union of all queries' cells would score every query against the
    whole union — per-query compute must stay O(query's nprobe cells)."""
    import numpy as np

    bk = np.asarray(books)
    qm = np.asarray([q[1] for q in queries], dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    qids = [int(q[0]) for q in queries]
    # tables[q][m][k] = ||q_sub - c||² partial
    tables = np.stack(
        [
            np.stack(
                [
                    ((qv[m * _SUB : (m + 1) * _SUB][None, :] - bk[m]) ** 2).sum(axis=1)
                    for m in range(PQ_M)
                ]
            )
            for qv in qm
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_all, codes_all, cl_all = [], [], []
        for pdf in batches:
            ids_all.append(pdf["vec_id"].to_numpy())
            codes_all.append(
                np.frombuffer(b"".join(pdf["code"]), dtype=np.uint8).reshape(-1, PQ_M)
            )
            if probes is not None:
                cl_all.append(pdf["cluster"].to_numpy())
        if not ids_all:
            return
        ids = np.concatenate(ids_all)
        cd = np.concatenate(codes_all)
        cl = np.concatenate(cl_all) if probes is not None else None
        out = {"query_id": [], "neighbor_id": [], "adc_dist": []}
        for qi, qid in enumerate(qids):
            if probes is not None:
                mask = np.isin(cl, list(probes.get(qid, ()))) & (ids != qid)
            else:
                mask = ids != qid
            i = ids[mask]
            if len(i) == 0:
                continue
            sub_cd = cd[mask]
            dist = np.zeros(len(sub_cd))
            for m in range(PQ_M):
                dist += tables[qi, m][sub_cd[:, m]]
            # local cut tie-break matches the global window's
            # (adc_dist, neighbor_id) order — reproducible under ANY
            # partitioning (equal-code ties are common: the code alone
            # determines adc_dist)
            top = np.lexsort((i, dist))[:topk]
            out["query_id"] += [qid] * len(top)
            out["neighbor_id"] += [int(x) for x in i[top]]
            out["adc_dist"] += [float(x) for x in dist[top]]
        yield pd.DataFrame(out)

    local = codes.mapInPandas(
        kernel, schema="query_id long, neighbor_id long, adc_dist double"
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "rank", F.round("adc_dist", 6).alias("adc_dist"))
        .orderBy("query_id", "rank")
    )


@register(
    "ss6_ann_pq",
    None,  # approximate (quantized distances) — rows-only; recall +
    # compression pinned in tests/test_pq.py
    doc="Product-quantized ANN (FAISS IndexPQ+refine shape): 64-dim "
        "float64 vectors compress to 8 one-byte codes (64× smaller "
        "scan), asymmetric-distance lookups rank candidates from "
        "per-query M×256 tables, each partition emits only its local "
        "top-k (partitions × q × k rows to the final merge — never a "
        "full distance matrix), then an exact-cosine re-rank of the "
        "topk×4 ADC survivors restores full-precision ordering "
        "(measured recall@10 0.95-0.97 vs 0.53-0.62 raw ADC, "
        "RECALL_CURVES.md). Codebooks train on a bounded 4096-vector "
        "sample (FAISS practice; documented driver traffic). The "
        "memory-scale complement to ss3/ss5's IVF partition pruning.",
)
def ss6(spark: SparkSession, sf: str) -> DataFrame:
    v = _embeddings(spark, sf)
    books = trained_codebooks(spark, sf)
    codes = encode_corpus(v, books)
    queries = [
        (r["vec_id"], r["emb"])
        for r in v.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    cand = adc_topk(codes, queries, books, topk=TOP_K * PQ_REFINE)
    # refine: exact cosine over ONLY the topk×PQ_REFINE ADC candidates
    # (q × 40 rows — broadcast), the same stage ivfpq_query runs; ADC
    # stays the 8-byte scan, full precision touches a bounded set
    qdf = spark.createDataFrame(
        [(int(i), [float(x) for x in emb]) for i, emb in queries],
        "query_id long, qe array<double>",
    )
    ne = v.select(F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("ne"))
    from goose_spark.operators.similarity import _dot

    cos = _dot("qe", "ne") / F.sqrt(
        _dot(F.col("qe"), F.col("qe")) * _dot(F.col("ne"), F.col("ne"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        F.broadcast(cand.select("query_id", "neighbor_id"))
        .join(ne, "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("score"))
        .orderBy("query_id", "rank")
    )
