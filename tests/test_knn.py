"""k-NN graph (ss10): recall floor vs brute force, self-exclusion,
sub-blocking correctness, and degenerate one-cell behavior."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from goose_spark.operators.knn import KNN_K, knn_graph
from goose_spark.queries import load_all
from goose_spark.queries.base import t

REG = load_all()
SF = "/root/testdata/sf0.01"


def _brute_topk(vecs: dict, k: int) -> dict:
    ids = sorted(vecs)
    mat = np.asarray([vecs[i] for i in ids], dtype=np.float64)
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1), 1e-12)[:, None]
    cos = unit @ unit.T
    out = {}
    for i, vid in enumerate(ids):
        order = np.lexsort((ids, -cos[i]))
        out[vid] = [ids[j] for j in order if ids[j] != vid][:k]
    return out


@pytest.fixture(scope="module")
def graph_rows(spark):
    return REG["ss10_knn_graph"].builder(spark, SF).collect()


def test_recall_floor_vs_brute_force(spark, graph_rows):
    emb = t(spark, SF, "embeddings").collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb}
    truth = _brute_topk(vecs, KNN_K)
    got: dict = {}
    for r in graph_rows:
        got.setdefault(r["vec_id"], []).append(r["neighbor_id"])
    assert set(got) == set(vecs)  # every vector has neighbors
    hits = total = 0
    for vid, true_nbrs in truth.items():
        hits += len(set(true_nbrs) & set(got.get(vid, [])))
        total += len(true_nbrs)
    recall = hits / total
    # floor raised 0.6 → 0.8 in round 9 with the measured nprobe curve
    # (knn.KNN_NPROBE): nprobe=10 recalls 0.892 on this corpus
    assert recall >= 0.8, f"recall {recall:.3f}"


def test_no_self_edges_and_k_bound(graph_rows):
    assert all(r["vec_id"] != r["neighbor_id"] for r in graph_rows)
    from collections import Counter

    per = Counter(r["vec_id"] for r in graph_rows)
    assert max(per.values()) <= KNN_K


def test_sub_blocking_preserves_pairs(spark):
    """Forcing max_cell=8 (many blocks per cell) must still produce a
    valid graph: exact same top-1 neighbor as an unblocked run for the
    vast majority of vectors (block boundaries cannot LOSE a member —
    probes visit every block of a probed cell)."""
    rng = np.random.RandomState(5)
    rows = [(i, rng.randn(16).tolist()) for i in range(120)]
    v = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    cents = [rng.randn(16).tolist() for _ in range(4)]
    blocked = knn_graph(spark, v, cents, k=3, nprobe=4, max_cell=8).collect()
    plain = knn_graph(spark, v, cents, k=3, nprobe=4, max_cell=4096).collect()
    # nprobe == n_cells → both are exact: identical output
    assert sorted(map(tuple, blocked)) == sorted(map(tuple, plain))


def test_one_cell_degenerate_is_exact(spark):
    rng = np.random.RandomState(9)
    rows = [(i, rng.randn(8).tolist()) for i in range(40)]
    v = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    out = knn_graph(spark, v, [rng.randn(8).tolist()], k=5, nprobe=1).collect()
    vecs = {i: e for i, e in rows}
    truth = _brute_topk(vecs, 5)
    got: dict = {}
    for r in sorted(out, key=lambda r: (r["vec_id"], r["rank"])):
        got.setdefault(r["vec_id"], []).append(r["neighbor_id"])
    assert got == truth
