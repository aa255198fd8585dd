"""Incremental corpus ingestion: dedup-against-history across batches —
quality gate, exact cross-batch dups, near-dup (LSH) cross-batch dups,
and the streaming form matching the batch form."""

from __future__ import annotations

import pytest

from goose_spark.operators.ingest import CorpusIngest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


GOOD = (
    "The quick brown fox jumps over the lazy dog while the band plays on "
    "and every sentence here is long enough to clear the quality gate easily."
)
GOOD2 = (
    "Completely different content about distributed query engines running "
    "columnar scans with predicate pushdown over immutable parquet files."
)
NEAR = GOOD + " One extra trailing clause changes only a few shingles."


@pytest.fixture()
def store(tmp_path):
    return CorpusIngest(str(tmp_path / "corpus"))


def test_quality_and_exact_within_batch(spark, store):
    stats = store.ingest_batch(spark, _docs(spark, [
        (1, GOOD),
        (2, "too short"),          # quality gate
        (3, "1234567890 " * 20),   # long but low alpha-ratio
        (4, GOOD),                 # exact dup of 1 within the batch
    ]))
    assert stats == {"batch": 4, "quality_rejected": 2, "exact_dups": 1,
                     "near_dups": 0, "accepted": 1}
    assert store.corpus(spark).count() == 1


def test_cross_batch_exact_and_near_dups(spark, store):
    store.ingest_batch(spark, _docs(spark, [(1, GOOD)]))
    stats = store.ingest_batch(spark, _docs(spark, [
        (10, GOOD),    # exact dup of accepted history
        (11, NEAR),    # near dup of accepted history (LSH + Jaccard)
        (12, GOOD2),   # genuinely new
    ]))
    assert stats["exact_dups"] == 1
    assert stats["near_dups"] == 1
    assert stats["accepted"] == 1
    ids = {r["doc_id"] for r in store.corpus(spark).collect()}
    assert ids == {1, 12}


def test_streaming_ingest_matches_batch(spark, store, tmp_path):
    src = str(tmp_path / "in")
    batch = _docs(spark, [(1, GOOD), (2, GOOD), (3, GOOD2)])
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = store.ingest_stream(spark, stream)
    q.awaitTermination()
    ids = {r["doc_id"] for r in store.corpus(spark).collect()}
    assert ids == {1, 3}  # exact dup 2 dropped, both survivors accepted
