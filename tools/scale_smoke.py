"""Scale smoke: run representative operators at sf0.1 and at Nx that
corpus (text perturbed per copy so near-dup structure doesn't explode
quadratically), and report the wall-clock ratio. Linear-ish ratios —
well under Nx at this size, since fixed overhead dominates the 1x run —
are the evidence that the pipeline stages are data-parallel, not
driver-bound.

Usage: python3 tools/scale_smoke.py [N_COPIES] [OP_NAME ...]
(op names restrict the run to a subset — e.g. to extend SCALE.md's
table with newly added operators without re-timing the whole sweep;
the pseudo-name `dd6_forced` times dd6's large-star/small-star
fallback with the union-find fast path disabled)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
OPS = [
    "dd1_exact_dedup",
    "dd2_minhash_lsh",
    "dd6_dedup_clusters",
    "sp1_hash_split",
    "sp3_token_chunking",
    "sp4_packed_shards",
    "q48_token_topk",
    "q49_ntile_percent_rank",
    "q50_moment_stats",
    "tx1_token_counts",
    "ss2_ann_lsh",
    "ss3_ann_ivf",
    "tx6_repetition_filter",
    "tx7_rare_token_ratio",
    "sp5_quality_weighted_sample",
    "sp6_decontaminate",
    "sp7_mixture_sample",
    "sp8_epoch_shuffle",
    "tx8_pii_scrub",
    "tx9_lm_surprisal",
    "ss4_label_centroids",
    "q55_waiting_suppliers",
    "q57_sliding_window",
    "q74_banded_time_join",
    "q76_peak_concurrency",
    "q78_sketch_rollup",
    "q80_bpe_encode",
    "tx13_heavy_hitters",
    "ss8_semdedup",
    "tx14_containment",
    "tx15_bigram_lm",
    "tx16_distribution_drift",
    "q82_ohlc_downsample",
    "q83_rate_anomaly",
    "sp10_weighted_sample",
    "ss9_mmr_rerank",
    "q86_fuzzy_name_pairs",
    "q87_triangle_count",
    "q88_brand_affinity",
    "q89_event_transitions",
    "sp11_packing_efficiency",
    "sp12_contamination_matrix",
    "q92_session_window",
    "ss11_range_search",
]


def build_scaled(spark, n_copies: int) -> str:
    """N copies of documents/embeddings with distinct ids; text gets a
    per-copy suffix token so shingle sets differ slightly per copy."""
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix="goose-scale-")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    copies = [
        docs.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" copytoken{i}")).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + len(f" copytoken{i}")).alias("n_chars"),
        )
        for i in range(n_copies)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionAll(c)
    big.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ecopies = [
        emb.select((F.col("vec_id") + i * 10_000_000).alias("vec_id"), "embedding", "label")
        for i in range(n_copies)
    ]
    ebig = ecopies[0]
    for c in ecopies[1:]:
        ebig = ebig.unionAll(c)
    ebig.repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    # relational tables for the two-pass rank / moment queries: shift the
    # keys per copy, keep value distributions identical
    # c_name re-derived from the shifted key: the scaled customers are
    # DISTINCT entities (as they would be at 100 TB), not 16 identical
    # name copies — q86's fuzzy-pair answer would otherwise grow
    # quadratically in the copy count by construction of the smoke
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    ccopies = [
        cust.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * 10_000_000))
        .withColumn("c_name", F.format_string("Customer#%09d", F.col("c_custkey")))
        for i in range(n_copies)
    ]
    cbig = ccopies[0]
    for c in ccopies[1:]:
        cbig = cbig.unionAll(c)
    cbig.repartition(32).write.mode("overwrite").parquet(f"{out}/customer.parquet")

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    lcopies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000))
        for i in range(n_copies)
    ]
    lbig = lcopies[0]
    for c in lcopies[1:]:
        lbig = lbig.unionAll(c)
    lbig.repartition(32).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    # orders scaled with the SAME orderkey shift as lineitem so the
    # fact-fact join (q55) stays joinable; events scaled on shifted
    # event/user ids (q57 windows, sessionization); supplier/nation are
    # dims — pass through unscaled, as they would be at 100 TB.
    o = spark.read.parquet(f"{SF}/orders.parquet")
    ocopies = [
        o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 100_000_000))
        for i in range(n_copies)
    ]
    obig = ocopies[0]
    for c in ocopies[1:]:
        obig = obig.unionAll(c)
    obig.repartition(32).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    # events via the dtype-normalizing loader (the raw file may be
    # TIMESTAMP(NANOS)); the scaled copy is written back as plain µs.
    from goose_spark.queries.base import t as load_table

    ev = load_table(spark, SF, "events")
    # per-copy TIMESTAMP shift (disjoint 40-day ranges): keeps temporal
    # density constant, so banded joins / windows / sketch rollups scale
    # by MORE time covered (the real growth axis), not by super-linear
    # in-band densification
    evcopies = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_000))
        .withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
        .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 40} DAYS"))
        for i in range(n_copies)
    ]
    evbig = evcopies[0]
    for c in evcopies[1:]:
        evbig = evbig.unionAll(c)
    evbig.repartition(32).write.mode("overwrite").parquet(f"{out}/events.parquet")

    for dim in ("supplier", "nation", "part", "region"):
        spark.read.parquet(f"{SF}/{dim}.parquet").write.mode("overwrite").parquet(
            f"{out}/{dim}.parquet"
        )
    return out


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    only = sys.argv[2:]
    from goose_spark.queries import load_all
    from goose_spark.session import get_spark

    registry = load_all()
    unknown = [n for n in only if n not in registry and n != "dd6_forced"]
    if unknown:  # fail in ms, not after the 16x dataset build
        raise SystemExit(f"unknown operator(s): {unknown}")
    spark = get_spark("gosling-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = build_scaled(spark, n_copies)
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()

    print(f"| operator | 1x sec | {n_copies}x sec | ratio |")
    print("|---|---|---|---|")

    def run(name, spec):
        t0 = time.perf_counter()
        spec.builder(spark, SF).count()
        base = time.perf_counter() - t0
        t0 = time.perf_counter()
        spec.builder(spark, scaled).count()
        big = time.perf_counter() - t0
        print(f"| {name} | {base:.2f} | {big:.2f} | {big / base:.1f}x |", flush=True)

    for name in (only or OPS):
        if name != "dd6_forced":
            run(name, registry[name])
    if only and "dd6_forced" not in only:
        return
    # dd6's large-star/small-star path (the >2M-edge plan), forced
    from goose_spark.operators import clusters

    saved = clusters.FAST_PATH_MAX_EDGES
    clusters.FAST_PATH_MAX_EDGES = -1
    try:
        run("dd6_dedup_clusters (large-star/small-star)", registry["dd6_dedup_clusters"])
    finally:
        clusters.FAST_PATH_MAX_EDGES = saved


if __name__ == "__main__":
    main()
