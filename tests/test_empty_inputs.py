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


def test_mixture_sample_empty_corpus(spark, empty_sf):
    # sp7 computes per-language rates from collected counts; on an empty
    # corpus the rate table is empty and so is the result
    df = REGISTRY["sp7_mixture_sample"].builder(spark, empty_sf)
    assert df.count() == 0
