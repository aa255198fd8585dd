"""Measured scale points for the fixture-input job-domain queries
(VERDICT r13 directive #3): q91 (ledger MERGE/upsert) and qj15
(throughput timeline + two-pass prefix-sum backlog) ship 100 TB claims
— co-partitioned full-outer MERGE join; zero Exchange SinglePartition —
that the sf-slope gate cannot test because the job_events fixture does
not scale with sf. This tool builds a scaled job_events (N copies,
default 64, each copy's 14-min burst shifted so the log spans ~a year
— the growth axis a real ledger has: more time covered, constant burst
density) and times both queries at 1x and Nx in one session.

Scaling recipe: copy i gets job_id || '#i' (disjoint job populations —
at 100 TB the job count grows, jobs don't get 64x the transitions),
seq + i*10_000_000 (keeps seq globally unique; md5-nibble shard
membership stays uniform), event_time + i*(365/N) days.

Usage: python3 tools/scale_jobs64.py [N_COPIES]   (default 64)
Prints one markdown row per query with wall-clock + answer size.
Run on an idle host (bench-isolation rule).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ("q91_merge_upsert_state", "qj15_throughput_timeline")


def build_scaled_fixtures(spark, n_copies: int) -> str:
    """N disjoint copies of data/fixtures/job_events.parquet spread over
    ~a year; the other fixture tables are copied through unscaled (the
    two target queries read only job_events)."""
    from pyspark.sql import functions as F

    from goose_spark.queries.base import FIXTURES_DIR

    out = tempfile.mkdtemp(prefix="goose-scale-jobs-")
    ev = spark.read.parquet(os.path.join(FIXTURES_DIR, "job_events.parquet"))
    step_days = 365.0 / n_copies
    copies = [
        ev.withColumn("job_id", F.concat(F.col("job_id"), F.lit(f"#{i}")))
        .withColumn("seq", F.col("seq") + F.lit(i * 10_000_000))
        .withColumn(
            "event_time",
            F.col("event_time")
            + F.expr(f"INTERVAL {int(i * step_days * 24 * 60)} MINUTES"),
        )
        for i in range(n_copies)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionAll(c)
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "job_events.parquet")
    )
    for name in ("jobs", "batches", "cron_entries"):
        spark.read.parquet(os.path.join(FIXTURES_DIR, f"{name}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{name}.parquet"))
    return out


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    only = sys.argv[2:] or QUERIES

    import goose_spark.queries.base as base
    from goose_spark.queries import load_all
    from goose_spark.queries.base import invalidate_read_cache
    from goose_spark.session import get_spark

    registry = load_all()
    spark = get_spark("gosling-scale-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()

    t0 = time.perf_counter()
    scaled = build_scaled_fixtures(spark, n_copies)
    print(f"built {n_copies}x job_events in {time.perf_counter() - t0:.0f}s",
          flush=True)

    print(f"| query | 1x sec / rows | {n_copies}x sec / rows | wall ratio |")
    print("|---|---|---|---|", flush=True)

    for name in only:
        spec = registry[name]
        t0 = time.perf_counter()
        n1 = spec.builder(spark, "unused-sf").count()
        base_s = time.perf_counter() - t0
        # redirect the fixture loader at the scaled dir; the read cache
        # keys on FIXTURES_DIR's value so eviction is belt-and-braces
        orig = base.FIXTURES_DIR
        try:
            base.FIXTURES_DIR = scaled
            invalidate_read_cache()
            t0 = time.perf_counter()
            nN = spec.builder(spark, "unused-sf").count()
            big_s = time.perf_counter() - t0
        finally:
            base.FIXTURES_DIR = orig
            invalidate_read_cache()
        print(
            f"| {name} | {base_s:.2f} / {n1} | {big_s:.2f} / {nN} "
            f"| {big_s / base_s:.1f}x |",
            flush=True,
        )


if __name__ == "__main__":
    main()
