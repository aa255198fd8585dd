"""Degree-ordered triangle counting (operators/clusters.triangle_stats).

Pinned against hand-countable graphs and an itertools brute force on a
random-ish deterministic graph — every triangle must be counted exactly
once at its (deg, id)-minimal vertex.
"""

from __future__ import annotations

import itertools

from goose_spark.operators.clusters import triangle_stats


def _stats(spark, edges):
    df = spark.createDataFrame(edges, ["a_id", "b_id"])
    return triangle_stats(df).collect()[0]


def _brute_triangles(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    return sum(
        1
        for u, v, w in itertools.combinations(nodes, 3)
        if v in adj[u] and w in adj[u] and w in adj[v]
    )


def test_k4_all_stats(spark):
    k4 = [(a, b) for a, b in itertools.combinations(range(1, 5), 2)]
    r = _stats(spark, k4)
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 12, 4)
    assert r.gcc == 1.0


def test_path_has_no_triangles(spark):
    r = _stats(spark, [(1, 2), (2, 3), (3, 4)])
    assert r.n_triangles == 0
    assert r.n_wedges == 2
    assert r.gcc == 0.0


def test_triangle_plus_pendant(spark):
    # one triangle, a pendant off node 3: wedges = 1+1+3 = 5
    r = _stats(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 4, 5, 1)
    assert r.gcc == round(3 * 1 / 5, 6)


def test_matches_brute_force_and_handles_dirty_input(spark):
    # deterministic pseudo-random graph; duplicate edges, reversed
    # duplicates and self-loops must not change the count
    edges = []
    for i in range(40):
        a = (i * 7) % 13
        b = (i * i + 3) % 13
        if a != b:
            edges.append((min(a, b) + 1, max(a, b) + 1))
    clean = sorted(set(edges))
    dirty = edges + [(b, a) for a, b in edges[:5]] + [(1, 1), (5, 5)]
    r = _stats(spark, dirty)
    assert r.n_triangles == _brute_triangles(clean)
    # edge count equals the distinct undirected pair count
    undirected = {(min(a, b), max(a, b)) for a, b in dirty if a != b}
    assert r.n_edges == len(undirected)
