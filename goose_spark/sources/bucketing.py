"""Bucketed tables — the co-located-join scale technique (SURVEY §4 /
task brief "bucketing for co-located joins").

Writing both join sides bucketed by the join key with the same bucket
count lets Spark join them with ZERO exchanges: each task reads matching
bucket files from both sides and sort-merge-joins locally. At 100 TB
this converts the nightly fact⋈fact join from the cluster's largest
shuffle into pure local IO — the single biggest plan win available for
repeated joins on a stable key.

Bucketed writes go through ``saveAsTable`` (bucket metadata lives in the
catalog, not the parquet files); the session's warehouse dir is local
parquet here, HMS/Glue-backed in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    Sorting within buckets lets the local join skip its sort step too —
    the plan degenerates to a streaming zip of pre-sorted bucket files.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket counts Spark plans a SortMergeJoin with no
    Exchange on either side (assert via plans.inspect — see
    test_plans_and_io.test_bucketed_join_is_shuffle_free).
    """
    return spark.table(left_table).join(spark.table(right_table), on)
