"""Trigger-interval latency study: sustained jobs/sec and enqueue→
success latency at processingTime triggers {0.25s, 0.5s, 1s} plus the
availableNow batch mode — the measured basis for the engine's default
trigger choice (goose's console-visible latency classes, qj8/qj12,
deserve a curve rather than a single anecdote).

Method: a steady offered load (ENQ_RATE jobs/sec in 100-job files, the
client's atomic-append granularity) runs for FEED_SEC against a
continuously-running worker; after the feed stops we wait for full
drain, then read every success row's commit-time (its ns-clock ``seq``)
minus ``enqueued_at`` from the ledger log. availableNow instead
pre-loads the same total and drains it in one pass (bench.py's shape).

Isolation: each config runs in its OWN subprocess (fresh JVM + fresh
SparkSession + its own warm-up) — round-7's in-study availableNow figure
was depressed by accumulated session state after three continuous runs
(BASELINE.md footnote ¹, now retired); per-config fresh sessions measure
the config, not the session history. Run on an idle host.

Usage: python3 tools/trigger_latency.py [feed_sec] [rate]
Prints a markdown table; paste into BASELINE.md § engine.
(Internal: --one <0.25|0.5|1.0|availableNow> runs a single config in
this process and prints one JSON line.)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ONE = None
argv = sys.argv[1:]
if "--one" in argv:
    i = argv.index("--one")
    ONE = argv[i + 1]
    del argv[i : i + 2]
FEED_SEC = float(argv[0]) if len(argv) > 0 else 12.0
ENQ_RATE = int(argv[1]) if len(argv) > 1 else 1000  # jobs/sec offered
CHUNK = 100  # jobs per atomic append file


def _latency_stats(log_dir: str):
    import duckdb

    return duckdb.connect().execute(
        f"""SELECT COUNT(*),
                   ROUND(quantile_cont(l, 0.5), 3),
                   ROUND(quantile_cont(l, 0.95), 3),
                   ROUND(quantile_cont(l, 0.99), 3),
                   ROUND(MAX(l), 3)
            FROM (SELECT seq / 1e9 - epoch(enqueued_at) AS l
                  FROM read_parquet('{log_dir}/*.parquet')
                  WHERE status = 'success')"""
    ).fetchone()


def _drain_wait(ledger, expect: int, timeout: float = 120.0) -> float:
    """Wait until `expect` success rows are committed; returns when."""
    import glob

    import pyarrow.parquet as pq

    deadline = time.time() + timeout
    while time.time() < deadline:
        n = 0
        for f in glob.glob(os.path.join(ledger.log_dir, "*.parquet")):
            try:
                t = pq.read_table(f, columns=["status"])
                n += t.column("status").to_pylist().count("success")
            except OSError:
                continue
        if n >= expect:
            return time.time()
        time.sleep(0.25)
    raise TimeoutError(f"drain: {n}/{expect} successes")


def run_continuous(spark, trigger_sec: float) -> dict:
    from goose_spark.client import JobClient
    from goose_spark.streaming.worker import Worker

    root = tempfile.mkdtemp(prefix=f"goose-trig-{trigger_sec}-")
    client = JobClient(root)
    worker = Worker(spark, root, retry_delay_fn=lambda n: 0)
    handle = worker.start(trigger_sec=trigger_sec)
    total = 0
    t0 = time.perf_counter()
    wall_start = time.time()
    try:
        per_tick = max(1, int(ENQ_RATE * 0.1))
        while time.perf_counter() - t0 < FEED_SEC:
            tick = time.perf_counter()
            sent = 0
            while sent < per_tick:
                n = min(CHUNK, per_tick - sent)
                client.ledger.append_rows(
                    [client._job_row("noop", (total + i,), None) for i in range(n)]
                )
                sent += n
                total += n
            sleep = 0.1 - (time.perf_counter() - tick)
            if sleep > 0:
                time.sleep(sleep)
        done_at = _drain_wait(worker.ledger, total)
        wall = done_at - wall_start
    finally:
        handle.stop()
    n, p50, p95, p99, mx = _latency_stats(worker.ledger.log_dir)
    return {
        "trigger": f"{trigger_sec}s",
        "jobs": total,
        "jobs_per_sec": round(total / wall, 1),
        "p50": p50,
        "p95": p95,
        "p99": p99,
        "max": mx,
    }


def run_available_now(spark) -> dict:
    from goose_spark.client import JobClient
    from goose_spark.streaming.worker import Worker

    root = tempfile.mkdtemp(prefix="goose-trig-avail-")
    client = JobClient(root)
    total = int(ENQ_RATE * FEED_SEC)
    client.ledger.append_rows(
        [client._job_row("noop", (i,), None) for i in range(total)]
    )
    worker = Worker(spark, root, retry_delay_fn=lambda n: 0)
    t0 = time.perf_counter()
    worker.process_available()
    wall = time.perf_counter() - t0
    n, p50, p95, p99, mx = _latency_stats(worker.ledger.log_dir)
    return {
        "trigger": "availableNow",
        "jobs": total,
        "jobs_per_sec": round(total / wall, 1),
        "p50": p50,
        "p95": p95,
        "p99": p99,
        "max": mx,
    }


def run_one(config: str) -> None:
    """Single config in THIS process: fresh session, own warm-up, one
    JSON result line on stdout (everything else goes to stderr)."""
    from goose_spark.session import get_spark

    spark = get_spark(f"gosling-trigger-{config}")
    spark.sparkContext.setLogLevel("ERROR")
    # criterium-parity warm-up (perf/goose/core.clj:39-53 runs untimed
    # iterations of the SAME workload): one full-size availableNow drain
    # — a 200-job warm leaves ~3 s of first-big-batch spin-up (staged
    # write path, codegen) billed to the measurement
    run_available_now(spark)
    if config == "availableNow":
        row = run_available_now(spark)
    else:
        row = run_continuous(spark, float(config))
    print(json.dumps(row))
    spark.stop()


def main() -> None:
    rows = []
    for config in ("0.25", "0.5", "1.0", "availableNow"):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--one", config, str(FEED_SEC), str(ENQ_RATE)],
            capture_output=True, text=True, check=True,
        )
        line = out.stdout.strip().splitlines()[-1]
        rows.append(json.loads(line))
        print(f"done: {config}", file=sys.stderr)
    print("| trigger | jobs | jobs/sec | p50 s | p95 s | p99 s | max s |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['trigger']} | {r['jobs']} | {r['jobs_per_sec']} "
            f"| {r['p50']} | {r['p95']} | {r['p99']} | {r['max']} |"
        )


if __name__ == "__main__":
    if ONE:
        run_one(ONE)
    else:
        main()
