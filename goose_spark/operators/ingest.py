"""Incremental corpus ingestion — dedup-against-history + quality gate.

The one-shot dedup queries (dd1/dd2) answer "find the duplicates in this
corpus"; a production training-data pipeline instead ingests batches
continuously and must answer "is this NEW document a duplicate of
anything we already accepted?". This module is that incremental shape:

    new docs ──► quality gate (textlib metrics, JVM-side)
             ──► exact check : anti-join the fingerprint index
             ──► near check  : minhash bands vs the band index,
                               exact-Jaccard verify on candidates only
             ──► append accepted docs + update both indexes
                 (staged executor-side publish, Delta-commit shape)

Scale design (100 TB):
* The fingerprint index is (fp, doc_id) — one row per accepted doc; the
  exact check is a broadcast- or shuffle-anti-join on fp, never a scan
  of document bodies.
* The band index is (band, bkey, doc_id) — bands× rows per doc; the
  near check joins new docs' bands against it, so cost is
  O(new × colliding buckets), never new × corpus.
* Jaccard verification recomputes shingles only for the candidate pairs
  (bounded by band collisions), joining text from the corpus store.
* All appends are executor-side staged writes published with
  metadata-only renames; nothing row-shaped crosses the driver.
* Streaming form: ``ingest_stream`` wraps the same batch body in
  foreachBatch — the nightly/continuous ingest topology.

No reference analog (nilenso/goose is a job library); this extends the
LLM-pipeline operator family (SURVEY §2.5 north star).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from goose_spark.operators.dedup import _band_keys, _minhash_sig
from goose_spark.operators.textlib import normalized_fingerprint, with_shingles

#: Quality gate (tx3 buckets): accept medium+ docs.
MIN_CHARS = 100
#: Near-dup verify threshold (same as dd2).
JACCARD_T = 0.5


def _publish(df: DataFrame, root: str, dest: str) -> int:
    """Staged executor-side append into ``<root>/<dest>/`` (the same
    Delta-commit shape as Ledger.append_df). Returns rows appended."""
    import pyarrow.parquet as pq

    out_dir = os.path.join(root, dest)
    os.makedirs(out_dir, exist_ok=True)
    staging = os.path.join(root, f".staging-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    rows = 0
    try:
        for i, f in enumerate(sorted(os.listdir(staging))):
            if not f.endswith(".parquet"):
                continue
            src = os.path.join(staging, f)
            n = pq.ParquetFile(src).metadata.num_rows
            if n == 0:
                continue
            rows += n
            os.replace(src, os.path.join(out_dir, f"{uuid.uuid4().hex}.parquet"))
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return rows


class CorpusIngest:
    """Accumulating corpus store under ``root``:

    corpus/        accepted documents (full rows)
    fingerprints/  (fp, doc_id) exact-dup index
    bands/         (band, bkey, doc_id) LSH index
    """

    def __init__(self, root: str):
        self.root = root
        for d in ("corpus", "fingerprints", "bands"):
            os.makedirs(os.path.join(root, d), exist_ok=True)

    def _read(self, spark: SparkSession, name: str) -> DataFrame | None:
        import glob

        if not glob.glob(os.path.join(self.root, name, "*.parquet")):
            return None
        return spark.read.parquet(os.path.join(self.root, name))

    def corpus(self, spark: SparkSession) -> DataFrame | None:
        return self._read(spark, "corpus")

    # ------------------------------------------------------------------

    def ingest_batch(self, spark: SparkSession, new_docs: DataFrame) -> dict:
        """Run one ingest round; returns acceptance stats. ``new_docs``
        needs (doc_id, text) at minimum; all columns are kept."""
        new_docs = new_docs.persist()
        try:
            total = new_docs.count()

            # 1. quality gate — pure column algebra, runs in the scan
            alpha = F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
            ok = (F.length("text") >= MIN_CHARS) & (
                alpha.cast("double") / F.length("text") >= 0.5
            )
            passed = new_docs.filter(ok)

            # 2. within-batch + against-history exact dedup on fp
            fp = passed.withColumn("fp", normalized_fingerprint(F.col("text")))
            w_first = F.row_number().over(Window.partitionBy("fp").orderBy("doc_id"))
            fp = fp.withColumn("_rn", w_first).filter(F.col("_rn") == 1).drop("_rn")
            idx = self._read(spark, "fingerprints")
            if idx is not None:
                fp = fp.join(idx.select("fp").distinct(), "fp", "left_anti")
            fp = fp.persist()
            exact_survivors = fp.count()

            # 3. near-dup: new docs' bands vs the band index; candidates
            #    verified by exact Jaccard against corpus text
            near_dup_ids = None
            bands_idx = self._read(spark, "bands")
            if bands_idx is not None:
                new_bands = _band_keys(_minhash_sig(fp.select("doc_id", "text")))
                cand = (
                    new_bands.join(bands_idx, ["band", "bkey"])
                    .select(
                        new_bands.doc_id.alias("new_id"),
                        bands_idx.doc_id.alias("old_id"),
                    )
                    .distinct()
                )
                corpus_sh = with_shingles(
                    self.corpus(spark)
                    .select("doc_id", "text")
                    .join(cand.select(F.col("old_id").alias("doc_id")).distinct(), "doc_id")
                ).select(F.col("doc_id").alias("old_id"), F.col("sh").alias("so"))
                new_sh = with_shingles(
                    fp.select("doc_id", "text")
                    .join(cand.select(F.col("new_id").alias("doc_id")).distinct(), "doc_id")
                ).select(F.col("doc_id").alias("new_id"), F.col("sh").alias("sn"))
                inter = F.size(F.array_intersect("sn", "so"))
                union = F.size("sn") + F.size("so") - inter
                near_dup_ids = (
                    cand.join(new_sh, "new_id")
                    .join(corpus_sh, "old_id")
                    .filter(inter.cast("double") / union >= JACCARD_T)
                    .select(F.col("new_id").alias("doc_id"))
                    .distinct()
                )
            accepted = fp if near_dup_ids is None else fp.join(
                near_dup_ids, "doc_id", "left_anti"
            )
            accepted = accepted.persist()
            n_accepted = accepted.count()

            # 4. publish: corpus rows + both indexes, executor-side
            _publish(accepted.drop("fp"), self.root, "corpus")
            _publish(accepted.select("fp", "doc_id"), self.root, "fingerprints")
            _publish(
                _band_keys(_minhash_sig(accepted.select("doc_id", "text"))),
                self.root,
                "bands",
            )
            return {
                "batch": total,
                "quality_rejected": total - passed.count(),
                "exact_dups": passed.count() - exact_survivors,
                "near_dups": exact_survivors - n_accepted,
                "accepted": n_accepted,
            }
        finally:
            new_docs.unpersist()

    def ingest_stream(self, spark: SparkSession, docs_stream: DataFrame,
                      checkpoint: str | None = None):
        """Continuous form: the same batch body per micro-batch
        (foreachBatch — the nightly-ingest topology as a stream)."""
        return (
            docs_stream.writeStream.foreachBatch(
                lambda df, _eid: self.ingest_batch(spark, df)
            )
            .option(
                "checkpointLocation",
                checkpoint or os.path.join(self.root, "checkpoint"),
            )
            .trigger(availableNow=True)
            .start()
        )
