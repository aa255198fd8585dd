"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same config block
is what we would ship to a 1000-executor cluster — AQE on (runtime join
strategy switching + skew-join splitting), broadcast threshold sized for
dimension tables, Arrow enabled for the Pandas-UDF paths, and shuffle
partitions kept at a multiple of parallelism (AQE coalesces down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Tables in the driver testdata star schema (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4)))


def get_spark(app_name: str = "gosling", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the engine.

    At 100 TB these settings translate directly: AQE handles skewed keys
    and post-shuffle coalescing, the 64 MB broadcast threshold keeps
    region/nation/part-class dims out of the shuffle, and
    ``maxPartitionBytes`` bounds scan-task memory.
    """
    n = cpus or default_cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        # -- optimizer / runtime ------------------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        # local mode has ONE locality domain — any nonzero locality wait
        # is a pure stall (measured: a 16-row parallelized count pays the
        # full 3 s default). On a real cluster restore a small value via
        # SPARK_GRAFT_LOCALITY_WAIT to keep HDFS-local scan scheduling.
        .config("spark.locality.wait",
                os.environ.get("SPARK_GRAFT_LOCALITY_WAIT", "0"))
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(max(32, n)))
        # AQE splits only SKEWED partitions — a join whose partitions are
        # all uniformly oversized (the 64x containment verify: array-heavy
        # candidate rows) keeps the static count and OOMs the task heap.
        # Start shuffles at 8x the core count and let AQE COALESCE down:
        # small stages still end at a handful of reducers, array-heavy
        # stages keep enough partitions to bound per-task memory
        # (measured: tx14@64x scaled corpus — OOM at 32 static partitions
        # on the 8g heap, 113 s at 256).
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(8 * max(32, n)),
        )
        # -- scans ---------------------------------------------------------
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # -- python boundary ------------------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # -- timestamps: testdata is UTC; keep session deterministic --------
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # deeper thread stacks: Catalyst TreeNode transforms and the
        # JDK's backtracking regex both recurse with input length; the
        # 30-min soak overflowed a stream-execution thread at the 1 MiB
        # default (regex frames) — 4 MiB is cheap insurance local-mode
        .config("spark.driver.extraJavaOptions", "-Xss4m")
    )
    return builder.getOrCreate()


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, "object"]:
    """Register every testdata table as a temp view and return the dict.

    Reads are plain parquet scans — Catalyst pushes filters and prunes
    columns into them (verify with ``df.explain`` → ``PushedFilters``).
    """
    from goose_spark.queries.base import t

    dfs = {}
    for name in TESTDATA_TABLES:
        df = t(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        dfs[name] = df
    return dfs
