"""Empty-corpus robustness: every representative operator must return an
empty (or well-defined) result on zero-row inputs with the production
schemas — the first thing a new deployment or an over-aggressive filter
stage feeds the pipeline."""

from __future__ import annotations

import os

import pytest

from goose_spark.queries import load_all
from tests.conftest import SF_CORRECT

REGISTRY = load_all()

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: operators whose empty-input result is well-defined and empty
EMPTY_OK = [
    "dd1_exact_dedup",
    "dd2_minhash_lsh",
    "dd3_simhash",
    "dd6_dedup_clusters",
    "sp1_hash_split",
    "sp2_stratified_sample",
    "sp3_token_chunking",
    "sp4_packed_shards",
    "sp5_quality_weighted_sample",
    "sp6_decontaminate",
    "sp8_epoch_shuffle",
    "tx1_token_counts",
    "tx8_pii_scrub",
    "tx9_lm_surprisal",
    "q03_hash_agg_tpch_q1",
    "q49_ntile_percent_rank",
    "q50_moment_stats",
    "q58_customer_distribution",
    "q60_order_priority_check",
    "tx14_containment",
    "tx20_vocab_growth",  # r12 advice: max(doc_id) NULL guard, not TypeError
    "tx15_bigram_lm",
    "tx16_distribution_drift",
    "q82_ohlc_downsample",
    "q83_rate_anomaly",
    "sp10_weighted_sample",
    "q84_pagerank",
    "ss9_mmr_rerank",
    "q86_fuzzy_name_pairs",
    "q88_brand_affinity",
    "q89_event_transitions",
    "q92_session_window",
    "q93_state_intervals",
    "sp11_packing_efficiency",
    "sp12_contamination_matrix",
]


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty-sf"))
    for t in TABLES:
        df = spark.read.parquet(os.path.join(SF_CORRECT, f"{t}.parquet")).limit(0)
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    return out


@pytest.mark.parametrize("name", EMPTY_OK)
def test_operator_handles_empty_corpus(name, spark, empty_sf):
    df = REGISTRY[name].builder(spark, empty_sf)
    assert df.count() == 0


def test_triangle_stats_empty_graph_is_well_defined(spark, empty_sf):
    # q87 is a global-stats query: one row of zeros, gcc defined as 0.0
    row = REGISTRY["q87_triangle_count"].builder(spark, empty_sf).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (0, 0, 0)
    assert r["gcc"] == 0.0


def test_mixture_sample_empty_corpus(spark, empty_sf):
    # sp7 computes per-language rates from collected counts; on an empty
    # corpus the rate table is empty and so is the result
    df = REGISTRY["sp7_mixture_sample"].builder(spark, empty_sf)
    assert df.count() == 0


def test_arrow_kernels_survive_null_text_and_payload(spark):
    from pyspark.sql import functions as F

    from goose_spark.operators.textlib import with_ngrams, with_shingles

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, None), (3, "x y z w v u")],
        "doc_id long, text string",
    )
    sh = {r["doc_id"]: r["sh"] for r in with_shingles(df).collect()}
    assert sh[2] == [] and len(sh[1]) == 3
    ng = {r["doc_id"]: r["grams"] for r in with_ngrams(df, 4).collect()}
    assert ng[2] == [] and len(ng[1]) == 2

    # multimodal kernels: null payload = zero-byte / skipped, not a
    # crash — drive them through the registry on a temp corpus dir
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("s")
        ).withColumn("n_chars", F.length("text")).write.parquet(
            os.path.join(tmp, "documents.parquet")
        )
        m1 = REGISTRY["mm1_multimodal_features"].builder(spark, tmp).collect()
        assert {r["doc_id"]: r["n_bytes"] for r in m1}[2] == 0
        m2 = {r["doc_id"]: r for r in REGISTRY["mm2_resize_plumbing"].builder(spark, tmp).collect()}
        assert m2[2]["orig_bytes"] is None  # null propagates, no crash
        m3 = REGISTRY["mm3_frame_sample"].builder(spark, tmp).collect()
        assert {r["doc_id"] for r in m3} == {1, 3}


def test_approx_aggregates_within_error_bounds(spark):
    """q29 is now hash-matched (round-11 directive #1): the registered
    query emits exact anchors plus BOOLEAN error-bound checks, so the
    booleans must be True at every SF we test. The raw sketch estimates
    (which differ across engines and stay out of the hashed result) are
    pinned here rows-only: HLL++ within its 3-sigma (15%) envelope of
    the exact distinct count, and the quantile sketch inside the exact
    [p45, p55] / [p98, p100] value brackets."""
    from pyspark.sql import functions as F

    from goose_spark.queries.base import t

    # registered query: every error-bound boolean must hold
    for r in REGISTRY["q29_approx_aggregates"].builder(spark, SF_CORRECT).collect():
        assert r["orders_within_bound"], r
        assert r["p50_within_bound"], r
        assert r["p99_within_bound"], r

    # raw sketch estimates (rows-only, engine-specific)
    li = t(spark, SF_CORRECT, "lineitem")
    approx = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
            F.percentile_approx("l_quantity", 0.5, 10000).alias("approx_p50"),
            F.percentile_approx("l_extendedprice", 0.99, 10000).alias("approx_price_p99"),
        )
        .collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_orderkey").alias("orders"),
            F.expr("percentile(l_quantity, array(0.45, 0.55))").alias("q_brk"),
            F.expr("percentile(l_extendedprice, array(0.98, 1.0))").alias("p_brk"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        assert abs(a["approx_orders"] - e["orders"]) <= 0.15 * e["orders"]
        assert e["q_brk"][0] <= a["approx_p50"] <= e["q_brk"][1]
        assert e["p_brk"][0] <= a["approx_price_p99"] <= e["p_brk"][1]


def test_text_kernels_handle_unicode(spark):
    """CJK, emoji, RTL, combining marks, and astral-plane text flow
    through the tokenizer/shingle/fingerprint/scrub kernels without
    crashes or mojibake (real dumps are full of all of these)."""
    from pyspark.sql import functions as F

    from goose_spark.operators.curation import scrub_text
    from goose_spark.operators.textlib import (
        normalized_fingerprint,
        token_count_ws,
        with_ngrams,
        with_shingles,
    )

    rows = [
        (1, "这是 一段 中文 文本 用于 测试 分词 行为"),
        (2, "🚀 emoji 🌍 mixed 🔥 with words and ✨ sparkle"),
        (3, "نص عربي من اليمين إلى اليسار مع كلمات"),
        (4, "étoile café combining marks aplenty here now"),
        (5, "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 astral 𝒫𝓁𝒶𝓃𝑒 chars with tail tokens"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        token_count_ws(F.col("text")).alias("n"),
        normalized_fingerprint(F.col("text")).alias("fp"),
        scrub_text(F.col("text")).alias("scrubbed"),
    ).collect()
    assert all(r["n"] >= 7 for r in out)
    assert len({r["fp"] for r in out}) == len(rows)  # distinct docs, distinct fps
    # scrub is a no-op on PII-free unicode (no corruption)
    originals = dict(rows)
    assert all(r["scrubbed"] == originals[r["doc_id"]] for r in out)
    sh = with_shingles(df).collect()
    ng = with_ngrams(df, 3).collect()
    assert all(len(r["sh"]) > 0 for r in sh)
    assert all(len(r["grams"]) > 0 for r in ng)
    # round-trip: shingle text preserved byte-for-byte
    zh = next(r for r in sh if r["doc_id"] == 1)
    assert zh["sh"][0] == "这是 一段 中文"
