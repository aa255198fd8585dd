"""End-to-end LLM training-data pipeline, composed from the engine's
operator primitives:

    raw documents
      → exact dedup          (normalized-fingerprint groupBy, dd1 kernel)
      → near-dup dedup       (MinHash+LSH pairs → connected components,
                              dd2/dd6 kernels — keep each cluster's keeper)
      → quality filter       (tx3 buckets + tx6 repetition verdict)
      → PII scrub            (tx8 regexp_replace chain over the kept text)
      → decontamination      (sp6 4-gram overlap vs a held-out benchmark
                              bucket — contaminated docs dropped)
      → quality-weighted mix (sp5 md5-coin acceptance per bucket)
      → language mixture     (sp7 temperature-flattened per-lang rates)
      → train/val/test split (sp1 md5-prefix buckets)
      → sequence packing     (sp4 two-pass token chunking, 2048-token
                              budget) over the surviving train split
      → vocabulary report    (tx13 Misra-Gries + exact recount: the
                              frequent-token statistics a BPE train
                              starts from, no full-token shuffle)
      → payload dup audit    (mm4 perceptual-signature grouping over
                              the train split's binary payloads)
      → repeat-epochs plan   (sp18 data-constrained allocation: epochs
                              per language domain under the budget)

Every stage is DataFrame algebra or an Arrow kernel — the same code
paths the oracle-checked registry queries run — and each stage hands the
next one a parquet directory, the way a production pipeline would
checkpoint between stages.

Run:  python examples/data_pipeline.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> dict:
    from goose_spark.operators.clusters import dd6
    from goose_spark.operators.dedup import lsh_pairs
    from goose_spark.operators.pipeline import (
        _QUAL_LT,
        _TRAIN_LT,
        _VAL_LT,
        _bucket2,
        token_chunks_two_pass,
    )
    from goose_spark.operators.textlib import normalized_fingerprint
    from goose_spark.queries.base import t
    from goose_spark.session import get_spark

    own_session = spark is None
    if own_session:
        spark = get_spark("goose-data-pipeline")
        spark.sparkContext.setLogLevel("ERROR")

    stats: dict = {}
    docs = t(spark, sf_dir, "documents")
    stats["raw"] = docs.count()

    # 1. exact dedup: keep the smallest doc_id per normalized fingerprint
    keep_exact = (
        docs.select("doc_id", normalized_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    docs = docs.join(keep_exact, "doc_id")
    stats["after_exact_dedup"] = docs.count()

    # 2. near-dup dedup: LSH pairs → components; drop non-keepers
    pairs = lsh_pairs(spark, sf_dir)
    components = dd6(spark, sf_dir)
    losers = components.filter(~F.col("is_keeper")).select("doc_id")
    docs = docs.join(losers, "doc_id", "left_anti")
    stats["near_dup_pairs"] = pairs.count()
    stats["after_near_dedup"] = docs.count()

    # 2b. containment dedup (tx14 kernel): a doc ≥80% contained in a
    #     surviving LARGER doc is a near-superset casualty Jaccard
    #     missed — drop the contained copy, keep the superset
    from goose_spark.operators.containment import containment_pairs
    from goose_spark.operators.textlib import with_shingles

    cont = containment_pairs(with_shingles(docs.select("doc_id", "text")))
    # keeper rule: one-way containment drops the contained doc; MUTUAL
    # containment (near-identical non-exact pair) keeps the smaller id
    # — otherwise both sides of a mutual pair would be dropped
    rev = cont.select(
        F.col("inner_id").alias("outer_id"), F.col("outer_id").alias("inner_id")
    )
    oneway = cont.join(rev, ["inner_id", "outer_id"], "left_anti")
    mutual = cont.join(rev, ["inner_id", "outer_id"], "left_semi")
    contained = (
        oneway.select("inner_id")
        .union(mutual.filter(F.col("inner_id") > F.col("outer_id")).select("inner_id"))
        .select(F.col("inner_id").alias("doc_id"))
        .distinct()
    )
    docs = docs.join(contained, "doc_id", "left_anti")
    stats["after_containment_dedup"] = docs.count()

    # 3. quality filter: repetition verdict (tx6 thresholds) on top of
    #    the tx3 quality bucket; drop highly repetitive docs
    w = F.split(F.lower("text"), r"\s+")
    docs = docs.withColumn("_w", w)
    dup_frac = F.lit(1) - F.size(F.array_distinct("_w")).cast("double") / F.size("_w")
    length = F.length("text")
    alpha = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]"), F.lit(0))
    ).cast("double")
    bucket = (
        F.when((length >= 200) & (alpha / length >= 0.7), "high")
        .when(length >= 100, "medium")
        .otherwise("low")
    )
    docs = (
        docs.filter(dup_frac <= 0.6)
        .withColumn("quality_bucket", bucket)
        .drop("_w")
    )
    stats["after_quality_filter"] = docs.count()

    # 3b. PII scrub (tx8 kernel): mask emails/phones in the surviving
    #     text — map-only, pure codegen, no Python
    from goose_spark.operators.curation import scrub_text

    docs = docs.withColumn("text", scrub_text(F.col("text")))

    # 3c. decontamination (sp6 kernel): drop training docs sharing any
    #     4-gram with the held-out benchmark bucket
    from goose_spark.operators.curation import _BENCH_LT, _DECON_N
    from goose_spark.operators.textlib import with_ngrams

    grams = (
        with_ngrams(docs.select("doc_id", "text"), _DECON_N)
        .withColumn("b", _bucket2(F.col("doc_id")))
        .select("doc_id", "b", F.explode("grams").alias("g"))
    )
    bench_grams = grams.filter(F.col("b") < _BENCH_LT).select("g").distinct()
    contaminated = (
        grams.filter(F.col("b") >= _BENCH_LT)
        .join(F.broadcast(bench_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    docs = docs.join(contaminated, "doc_id", "left_anti")
    stats["after_decontamination"] = docs.count()

    # 4. quality-weighted sampling: md5 coin, acceptance rate per bucket
    b = _bucket2(F.col("doc_id"))
    accept = (
        F.when(F.col("quality_bucket") == "high", True)
        .when((F.col("quality_bucket") == "medium") & (b < _QUAL_LT["medium"]), True)
        .when((F.col("quality_bucket") == "low") & (b < _QUAL_LT["low"]), True)
        .otherwise(False)
    )
    docs = docs.filter(accept)
    stats["after_sampling"] = docs.count()

    # 4b. temperature-flattened language mixture (sp7 kernel): acceptance
    #     rate sqrt(p_min/p_lang), md5-coin membership
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("t"), F.min("n_docs").alias("n_min"))
    rate = F.sqrt(F.col("n_min").cast("double") / F.col("n_docs"))
    thr = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        rate.alias("rate"),
        F.lpad(F.lower(F.hex(F.floor(rate * 256).cast("int"))), 2, "0").alias(
            "rate_hex"
        ),
    )
    docs = (
        docs.join(F.broadcast(thr), "lang")
        .filter((F.col("rate") >= 1.0) | (_bucket2(F.col("doc_id")) < F.col("rate_hex")))
        .drop("rate", "rate_hex")
    )
    stats["after_mixture"] = docs.count()

    # 5. deterministic split
    sb = _bucket2(F.col("doc_id"))
    split = F.when(sb < _TRAIN_LT, "train").when(sb < _VAL_LT, "val").otherwise("test")
    docs = docs.withColumn("split", split)
    stats["splits"] = {
        r["split"]: r["n"]
        for r in docs.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    # 6. pack the train split into 2048-token chunks (two-pass kernel
    #    over a checkpointed corpus directory, as at scale)
    stage_dir = tempfile.mkdtemp(prefix="goose-pipeline-")
    try:
        (
            docs.filter(F.col("split") == "train")
            .select("doc_id", "text", "lang", "source", "n_chars")
            .write.mode("overwrite")
            .parquet(os.path.join(stage_dir, "documents.parquet"))
        )
        chunks = token_chunks_two_pass(spark, stage_dir)
        stats["train_chunks"] = chunks.select("chunk").distinct().count()
        stats["train_tokens"] = chunks.agg(F.sum("n_tokens")).collect()[0][0]

        # 7. vocabulary report over the surviving train split (tx13
        #    kernel): exact frequent tokens via per-partition
        #    Misra-Gries candidates + recount — the corpus statistics a
        #    tokenizer-training run (q79 BPE) starts from, computed
        #    WITHOUT shuffling the full Zipf-skewed token stream
        from goose_spark.operators.heavyhitters import heavy_hitters

        train = spark.read.parquet(os.path.join(stage_dir, "documents.parquet"))
        hh = heavy_hitters(train, spark, phi=0.005).collect()
        stats["vocab_heavy_hitters"] = len(hh)
        stats["vocab_top"] = [(r["token"], r["cnt"]) for r in hh[:5]]

        # 8. mix monitoring (tx16 kernel): PSI of each source's length
        #    profile vs the rest of the surviving train split — the
        #    alarm a production pipeline fires when one feed drifts
        from goose_spark.queries import load_all

        # run the registry form over the staged train split by pointing
        # it at the stage dir (same table name contract)
        drift = load_all()["tx16_distribution_drift"].builder(spark, stage_dir)
        worst = drift.orderBy(F.col("psi").desc()).limit(3).collect()
        stats["drift_worst_sources"] = [(r["source"], r["psi"]) for r in worst]

        # 9. contamination matrix (sp12 kernel) over the staged train
        #    split: which sources leak which benchmark slices — the
        #    audit reviewed before the run is approved
        cm = load_all()["sp12_contamination_matrix"].builder(spark, stage_dir)
        stats["contamination_cells"] = cm.count()

        # 10. packing-efficiency curve (sp11 kernel): pick max_seq_len
        #     from measured padding waste, not folklore
        pe = load_all()["sp11_packing_efficiency"].builder(spark, stage_dir)
        stats["packing_curve"] = [
            (r["seq_len"], r["utilization"]) for r in pe.collect()
        ]

        # 11. payload-level duplicate audit (mm4 kernel) over the
        #     staged train split: the perceptual-signature grouping a
        #     multimodal corpus runs on its binary column — here it
        #     catches prefix-identical texts the normalized-fingerprint
        #     stage kept (different tails, same opening boilerplate)
        ph = load_all()["mm4_phash_dedup"].builder(spark, stage_dir)
        stats["payload_dup_groups"] = ph.count()

        # 12. repeat-epochs plan (sp18 kernel): with the corpus now
        #     deduped/filtered, decide how many epochs each scarce
        #     language domain repeats under the token budget — the
        #     knob a data-constrained training run is actually tuned by
        ep = load_all()["sp18_epoch_allocation"].builder(spark, stage_dir)
        stats["epoch_plan"] = [
            (r["lang"], r["epochs"], bool(r["capped"])) for r in ep.collect()
        ]
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)
    return stats


if __name__ == "__main__":
    out = main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
    for k, v in out.items():
        print(f"{k}: {v}")
