"""PageRank (q84): numpy power-iteration cross-check, rank-mass
conservation, and star-graph sanity."""

from __future__ import annotations

import numpy as np

from goose_spark.operators.clusters import PR_DAMPING, PR_ITERS, pagerank
from goose_spark.queries import load_all

REG = load_all()


def _numpy_pagerank(edges, iters, d):
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj = [[] for _ in range(n)]
    deg = np.zeros(n)
    for a, b in edges:
        if a == b:
            continue
        adj[idx[a]].append(idx[b])
        adj[idx[b]].append(idx[a])
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nr = np.full(n, (1.0 - d) / n)
        for u in range(n):
            share = d * r[u] / deg[u]
            for v in adj[u]:
                nr[v] += share
        r = nr
    return {nodes[i]: r[i] for i in range(n)}


def test_matches_numpy_power_iteration(spark):
    import random

    rng = random.Random(11)
    edges = list({(rng.randrange(60), rng.randrange(60)) for _ in range(150)})
    edges = [(a, b) for a, b in edges if a != b]
    # dedupe undirected duplicates the operator's distinct() also removes
    edges = list({(min(a, b), max(a, b)) for a, b in edges})
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {r["doc_id"]: r["pr"] for r in pagerank(df).collect()}
    want = _numpy_pagerank(edges, PR_ITERS, PR_DAMPING)
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-6, (k, got[k], want[k])
    # rank mass is conserved (no dangling nodes in the symmetric closure)
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_star_center_dominates(spark):
    edges = [(0, i) for i in range(1, 11)]
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    rows = pagerank(df).collect()
    assert rows[0]["doc_id"] == 0
    assert rows[0]["pr"] > 3 * rows[1]["pr"]


def test_registry_entry_runs(spark):
    out = REG["q84_pagerank"].builder(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    assert all(r["pr"] > 0 for r in out)
