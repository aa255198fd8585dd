"""Round-11 sixth-wave operators: per-source cap (sp14), per-group
Pareto frontier (q97), attribute-filtered vector search (ss15) —
independent-implementation and invariant checks beyond the DuckDB
oracle gate."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from goose_spark.queries import load_all
from goose_spark.queries.base import t
from tests.conftest import SF_CORRECT

REG = load_all()


def test_source_cap_invariants(spark):
    from goose_spark.operators.pipeline import SOURCE_CAP

    rows = REG["sp14_source_cap"].builder(spark, SF_CORRECT).collect()
    assert rows
    totals = {
        r["source"]: r for r in
        t(spark, SF_CORRECT, "documents").groupBy("source")
        .agg(F.count("*").alias("n")).collect()
    }
    assert {r["source"] for r in rows} == set(totals)
    for r in rows:
        assert r["kept"] + r["dropped"] == r["total"] == totals[r["source"]]["n"]
        assert r["kept"] <= SOURCE_CAP
        assert r["kept"] == min(SOURCE_CAP, r["total"])  # cap binds exactly
        assert r["kept_chars"] > 0


def test_source_cap_keeps_the_largest_docs(spark):
    """kept_chars must equal the sum of the top-cap n_chars per source
    (the deterministic keep-the-substantive-docs rule) — checked
    against a driver-side recompute."""
    from goose_spark.operators.pipeline import SOURCE_CAP

    rows = {r["source"]: r["kept_chars"]
            for r in REG["sp14_source_cap"].builder(spark, SF_CORRECT).collect()}
    docs = t(spark, SF_CORRECT, "documents").select("source", "n_chars", "doc_id").collect()
    by_src: dict = {}
    for d in docs:
        by_src.setdefault(d["source"], []).append((-d["n_chars"], d["doc_id"]))
    for src, lst in by_src.items():
        lst.sort()
        want = sum(-c for c, _ in lst[:SOURCE_CAP])
        assert rows[src] == want, src


def test_pareto_frontier_matches_naive_dominance(spark):
    """The O(n log n) sweep must return exactly the rows the O(n²)
    dominance definition keeps — checked with an independent numpy
    recompute per brand."""
    got = [
        (r["p_brand"], r["p_partkey"], r["price"], r["p_size"])
        for r in REG["q97_pareto_frontier"].builder(spark, SF_CORRECT).collect()
    ]
    parts = t(spark, SF_CORRECT, "part").select(
        "p_brand", "p_partkey", "p_retailprice", "p_size"
    ).collect()
    want = []
    by_brand: dict = {}
    for p in parts:
        by_brand.setdefault(p["p_brand"], []).append(p)
    for brand, rows in by_brand.items():
        pr = np.asarray([r["p_retailprice"] for r in rows])
        sz = np.asarray([r["p_size"] for r in rows])
        for i, r in enumerate(rows):
            dominated = np.any(
                (pr <= pr[i]) & (sz >= sz[i]) & ((pr < pr[i]) | (sz > sz[i]))
            )
            if not dominated:
                want.append((brand, r["p_partkey"],
                             round(float(pr[i]), 2), int(sz[i])))
    assert sorted(got) == sorted(want)
    assert len(got) > 0


def test_pareto_plan_has_no_self_join_or_cartesian(spark):
    """The point of q97: the plan is windows + one equi-join back, not
    the oracle's quadratic NOT EXISTS."""
    from goose_spark.plans.inspect import physical_plan

    plan = physical_plan(REG["q97_pareto_frontier"].builder(spark, SF_CORRECT))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_filtered_topk_is_prefilter_not_postfilter(spark):
    """Every returned neighbor satisfies the predicate AND each query
    still gets a full k (pre-filter semantics); an ss1 post-filter
    would return fewer rows for queries whose unfiltered top-k is
    mostly non-en."""
    from goose_spark.operators.similarity import FILTER_LANG, TOP_K

    en = {
        r["doc_id"]
        for r in t(spark, SF_CORRECT, "documents")
        .filter(F.col("lang") == FILTER_LANG).select("doc_id").collect()
    }
    rows = REG["ss15_filtered_topk"].builder(spark, SF_CORRECT).collect()
    per_q: dict = {}
    for r in rows:
        assert r["neighbor_id"] in en
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for qid, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, TOP_K + 1)), qid

    # post-filtering ss1's unfiltered top-k genuinely loses rows for at
    # least one query (i.e. the operator is not equivalent to ss1+filter)
    ss1 = REG["ss1_cosine_topk_bruteforce"].builder(spark, SF_CORRECT).collect()
    post: dict = {}
    for r in ss1:
        if r["neighbor_id"] in en:
            post.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert any(len(v) < TOP_K for v in post.values())


def test_ss16_filtered_serve_parity_and_semantics(spark):
    """ss16 (index-side filtered serve) vs the exact ss15: recall
    parity >= 0.9 per the ss12/ss14 convention, every neighbor
    satisfies the predicate (pre-filter semantics survive the probed-
    cell read), schema identical, and each query returns a full
    rank 1..k run (contiguous ranks — the window runs AFTER the
    filter, so approximation loses candidates, never rank slots)."""
    from goose_spark.operators.similarity import FILTER_LANG, TOP_K

    en = {
        r["doc_id"]
        for r in t(spark, SF_CORRECT, "documents")
        .filter(F.col("lang") == FILTER_LANG).select("doc_id").collect()
    }
    exact = REG["ss15_filtered_topk"].builder(spark, SF_CORRECT).collect()
    served = REG["ss16_filtered_ann_serve"].builder(spark, SF_CORRECT).collect()
    assert {f.name for f in REG["ss16_filtered_ann_serve"]
            .builder(spark, SF_CORRECT).schema} == {
        "query_id", "neighbor_id", "rank", "score"}

    per_q: dict = {}
    for r in served:
        assert r["neighbor_id"] in en
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for qid, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), qid

    want: dict = {}
    for r in exact:
        want.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got: dict = {}
    for r in served:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(want[q] & got.get(q, set())) for q in want)
    total = sum(len(v) for v in want.values())
    assert hits / total >= 0.9, f"filtered-serve recall parity {hits}/{total}"


def test_ss17_filtered_range_parity(spark):
    """ss17 (filtered range search off the index) vs the exact filtered
    range scan computed directly: every returned pair satisfies the
    predicate AND the threshold with an EXACT cosine, and recall vs the
    exact answer set is >= 0.9 at the selectivity-scaled nprobe."""
    import numpy as np

    from goose_spark.operators.similarity import (
        FILTER_LANG,
        N_QUERIES,
        RANGE_TAU,
        _embeddings,
    )

    en = {
        r["doc_id"]
        for r in t(spark, SF_CORRECT, "documents")
        .filter(F.col("lang") == FILTER_LANG).select("doc_id").collect()
    }
    rows = _embeddings(spark, SF_CORRECT).collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["emb"] for r in rows], dtype=np.float64)
    nrm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    want = set()
    for qi in range(N_QUERIES):
        qrow = np.flatnonzero(ids == qi)[0]
        cs = nrm @ nrm[qrow]
        for j in np.flatnonzero(cs >= RANGE_TAU):
            nid = int(ids[j])
            if nid != qi and nid in en:
                want.add((qi, nid))

    got = {}
    for r in REG["ss17_filtered_range_search"].builder(spark, SF_CORRECT).collect():
        assert r["neighbor_id"] in en
        key = (r["query_id"], r["neighbor_id"])
        assert key in want or r["score"] >= RANGE_TAU  # exact cosine, in radius
        got[key] = r["score"]
    # every returned pair is a true in-radius admissible pair
    assert set(got) <= want
    # and the probed-cell read recovers >= 0.9 of the exact answer set
    assert want and len(got) / len(want) >= 0.9, (len(got), len(want))
