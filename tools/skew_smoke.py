"""Skew smoke: the same 8x corpus twice — language-uniform vs 90%-en
skewed — and the wall-clock ratio per operator. Shows which operators
key their shuffles/blocks on skewable attributes and whether the
secondary keys (length buckets, doc ids, tokens) keep task sizes
bounded when one attribute value dominates.

Usage: python3 tools/skew_smoke.py [N_COPIES]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"

#: operators whose plan touches lang (block key, group key, or rate key)
#: plus lang-free controls
OPS = [
    "dd1_exact_dedup",       # control: fingerprint-keyed, lang-free
    "dd2_minhash_lsh",       # control: band-bucket keyed
    "dd4_ngram_jaccard",     # blocks on (lang × length-bucket) — the test
    "tx2_langid_confusion",  # groups by (lang, predicted)
    "tx5_tfidf_top_terms",   # groups by (lang, token)
    "sp7_mixture_sample",    # per-lang rates; skew changes the math, not the plan
]


def build(spark, n_copies: int, skew: bool) -> str:
    from pyspark.sql import functions as F

    out = tempfile.mkdtemp(prefix=f"goose-skew-{'s' if skew else 'u'}-")
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
    if skew:
        # 90% of docs forced to one language; remaining 10% keep theirs.
        # Deterministic by doc_id so both corpora hold identical rows
        # except the lang column.
        big = big.withColumn(
            "lang",
            F.when(F.col("doc_id") % 10 < 9, F.lit("en")).otherwise(F.col("lang")),
        )
    big.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from goose_spark.queries import load_all
    from goose_spark.session import get_spark

    spark = get_spark("gosling-skew-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    uniform = build(spark, n_copies, skew=False)
    skewed = build(spark, n_copies, skew=True)
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()

    print(f"| operator | uniform {n_copies}x sec | 90%-en {n_copies}x sec | skew ratio |")
    print("|---|---|---|---|")
    for name in OPS:
        spec = registry[name]
        t0 = time.perf_counter()
        spec.builder(spark, uniform).count()
        u = time.perf_counter() - t0
        t0 = time.perf_counter()
        spec.builder(spark, skewed).count()
        s = time.perf_counter() - t0
        print(f"| {name} | {u:.2f} | {s:.2f} | {s / u:.1f}x |", flush=True)

    import shutil

    shutil.rmtree(uniform, ignore_errors=True)
    shutil.rmtree(skewed, ignore_errors=True)


if __name__ == "__main__":
    main()
