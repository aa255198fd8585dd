"""Benchmark harness: runs the declared query inventory at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE compact JSON line (headline
value, slowest queries, ratio medians, jobs/s — sized to survive a
~2 kB output tail capture); the full per-query map is written to
BENCH_FULL.json beside this script.

Each query is fully materialized via ``df.count()`` after a cache-free
build — wall-clock includes scan + shuffle + agg, not result transfer.

Timing methodology (VERDICT r12 directive #1): each query is timed
**best-of-2** — the same methodology as the DuckDB baseline it is
ratioed against (tools/gen_duckdb_baseline.py takes min of 2) — with
the first-run time kept in the sidecar as ``queries_cold``. Between the
two runs ``release_shared()`` drops the per-query persisted subframes,
so run 2 re-pays its own materializations (DuckDB's second run also
re-executes fully); the deliberate cross-query session caches stay
warm either way. ``os.getloadavg()`` is recorded before/after the sweep
and emitted in the compact line so a host-contaminated record
self-identifies (the r12 driver record was a uniform ~1.55x multiple of
the judge's idle re-run — invisible without a load sentinel).
``cache_builds`` in the sidecar attributes session-cache build cost
(trained k-means, the dedup pair table) to the query that first paid
it, making the per-query numbers sweep-order-interpretable.

Idle gate (VERDICT r13 directive #1): three rounds of driver records
were captured on a contended host (r13: 111.9 s at loadavg 4.28 vs
79.3/84.3 s idle). The sentinel *detects* that after the fact; the
idle gate *prevents* it: before the sweep, if the 1-min loadavg
exceeds ``SPARK_GRAFT_IDLE_LOADAVG`` (default 2.0 on this 32-core
box), sleep-and-retry in bounded 30 s steps up to
``SPARK_GRAFT_IDLE_MAX_WAIT`` (default 180 s) total, then proceed
regardless (a bench that never runs is worse than a flagged one).
The observed wait and whether the budget was exhausted are recorded
in the compact line (``idle_wait_sec`` / ``idle_wait_exhausted``).
"""

from __future__ import annotations

import json
import os
import sys
import time

# isolate flaky-job counters from any concurrent pytest/bench process
# (must precede SparkSession creation so executor workers inherit it)
os.environ.setdefault(
    "GOOSE_SPARK_FLAKY_DIR", f"/tmp/goose-spark-flaky-bench-{os.getpid()}"
)


def wait_for_idle_host() -> tuple[float, bool]:
    """Bounded wait for the 1-min loadavg to drop under the idle
    threshold before timing anything (VERDICT r13 directive #1).

    Returns (seconds_waited, budget_exhausted). Never blocks more than
    SPARK_GRAFT_IDLE_MAX_WAIT seconds total; on exhaustion the sweep
    proceeds anyway and the record self-identifies via the sentinel
    plus idle_wait_exhausted=true.
    """
    threshold = float(os.environ.get("SPARK_GRAFT_IDLE_LOADAVG", "2.0"))
    max_wait = float(os.environ.get("SPARK_GRAFT_IDLE_MAX_WAIT", "180"))
    step = 30.0
    waited = 0.0
    while os.getloadavg()[0] > threshold:
        if waited >= max_wait:
            print(
                f"bench: idle-wait budget exhausted ({waited:.0f}s); "
                f"loadavg {os.getloadavg()[0]:.2f} > {threshold} — "
                "proceeding on a contended host",
                file=sys.stderr,
            )
            return waited, True
        chunk = min(step, max_wait - waited)
        print(
            f"bench: loadavg {os.getloadavg()[0]:.2f} > {threshold}; "
            f"waiting {chunk:.0f}s for an idle host "
            f"({waited:.0f}/{max_wait:.0f}s used)",
            file=sys.stderr,
        )
        time.sleep(chunk)
        waited += chunk
    return waited, False


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # idle gate BEFORE the session spins up: the JVM/warm-up work below
    # contributes to the 1-min loadavg itself, so gating here measures
    # the *host's* contention, not our own warm-up
    idle_wait_sec, idle_wait_exhausted = wait_for_idle_host()
    from goose_spark.plans.guards import release_shared
    from goose_spark.queries import load_all
    from goose_spark.session import get_spark

    # console_progress=False: the compact JSON line on stdout is the
    # driver's bench channel; progress-bar escape codes on stderr were
    # ~90% of BENCH_r10's captured tail — make the channel robust.
    spark = get_spark("gosling-bench", console_progress=False)
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # warm-up parity with the reference harness (criterium JVM warm-up,
    # perf/goose/core.clj:39-53): touch the JVM, parquet reader, AND the
    # Python worker pool (Arrow path) before timing anything
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    import pandas as _pd

    spark.range(1000).mapInPandas(lambda it: it, schema="id long").count()
    # ... and the shuffle/exchange + broadcast machinery (first shuffle in
    # a fresh JVM costs seconds of codegen/AQE spin-up that otherwise
    # lands on whichever query runs first)
    from pyspark.sql import functions as F

    warm = spark.range(100_000).withColumn("k", F.col("id") % 101)
    warm.groupBy("k").count().join(F.broadcast(spark.range(101).withColumnRenamed("id", "k")), "k").count()

    from goose_spark.operators.cache import BUILD_LOG

    load_before = tuple(round(v, 2) for v in os.getloadavg())
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    cache_builds: dict[str, dict] = {}
    # VERDICT r14 directive #1 (additive, sidecar-only): the r14 driver
    # record held two same-code outliers (tx14 10.4 s vs 2.8 s snapshot,
    # ss9 5.8 vs 1.2) that the record couldn't adjudicate because
    # loadavg was stamped only at sweep start/end. Two additions:
    # (a) a per-query 1-min loadavg stamp (queries_loadavg sidecar map),
    # (b) a THIRD timed attempt when the best-of-2 lands ≥3x the
    #     committed bench_history snapshot AND ≥1 s absolute — a
    #     mid-run contention window on one query block then
    #     self-corrects instead of poisoning the round's record.
    snapshot = load_snapshot()
    queries_loadavg: dict[str, float] = {}
    outlier_retries: dict[str, dict] = {}
    for name in sorted(registry):
        spec = registry[name]
        runs: list[float] = []
        # best-of-2 (min), matching the DuckDB baseline's methodology —
        # single-shot/first-run timing made BENCH_r12 a hostage to host
        # state (229 s driver vs 148 s judge vs 114 s builder, same
        # commit). First run kept as `cold` in the sidecar. Failed
        # attempts are skipped, not fatal: a transient run-2 failure
        # must not discard a valid run-1 measurement (ADVICE r13) —
        # the query is failed (-1.0) only when NO attempt succeeded.
        # Attempt 3 exists ONLY for snapshot-relative outliers (above).
        for attempt in range(3):
            if attempt == 2:
                snap = snapshot.get(name, 0.0)
                best = min(runs) if runs else -1.0
                if not (runs and snap > 0
                        and best >= 3.0 * snap and best >= 1.0):
                    break
                outlier_retries[name] = {
                    "best_of_2": round(best, 4),
                    "snapshot": snap,
                    "loadavg_1m": round(os.getloadavg()[0], 2),
                }
            seen = set(BUILD_LOG)
            start = time.perf_counter()
            try:
                df = spec.builder(spark, sf_dir)
                df.count()
                runs.append(time.perf_counter() - start)
            except Exception as exc:  # pragma: no cover
                print(f"bench: {name} run {attempt + 1} failed: {exc}",
                      file=sys.stderr)
            # attribute session-cache builds (k-means, pair table) to
            # the query that first paid them — per-query numbers are
            # otherwise sweep-order-dependent (dd2: 1.3-6.3 s bands)
            for k in set(BUILD_LOG) - seen:
                cache_builds[k] = {"sec": BUILD_LOG[k], "first_use": name}
            # drop ONLY the per-query persist_shared() frames between
            # runs/queries (plans/guards.py): each run pays its own
            # shared-subframe materialization without leaking storage
            # memory into the next measurement, while the deliberate
            # cross-query session caches (dedup pair table, trained
            # k-means) stay warm — clearCache() here cost the sweep
            # ~8-15 s in rebuilt caches
            release_shared()
        queries_loadavg[name] = round(os.getloadavg()[0], 2)
        if not runs:
            timings[name] = cold[name] = -1.0
        else:
            # cold = first SUCCESSFUL run; min over successful runs
            cold[name] = round(runs[0], 4)
            timings[name] = round(min(runs), 4)
        if name in outlier_retries:
            outlier_retries[name]["final"] = timings[name]
    load_after = tuple(round(v, 2) for v in os.getloadavg())

    ok = [v for v in timings.values() if v >= 0]
    full = {
        "metric": "declared-query wall-clock (sum over inventory)",
        "value": round(sum(ok), 4),
        "unit": "sec",
        "timing": ("best-of-2 per query (min); queries_cold = first run; "
                   "+1 retry when best ≥3x snapshot (outlier_retries)"),
        "queries": timings,
        "queries_cold": cold,
        "cache_builds": cache_builds,
        "loadavg": {"before": load_before, "after": load_after},
        "idle_wait_sec": round(idle_wait_sec, 1),
        "idle_wait_exhausted": idle_wait_exhausted,
        "sf": sf_dir,
        "n_queries": len(timings),
        "failed": sorted(k for k, v in timings.items() if v < 0),
        "vs_duckdb": vs_duckdb(timings, sf_dir),
        "jobs_throughput": jobs_throughput(spark),
        # per-query host-state stamps + any snapshot-relative third
        # attempts (VERDICT r14 directive #1; empty dict = none fired)
        "queries_loadavg": queries_loadavg,
        "outlier_retries": outlier_retries,
        # JIT code-cache headroom at sweep end (VERDICT r14 directive
        # #9): the r14 ReservedCodeCacheSize=512m fix must keep >20%
        # headroom as the inventory grows, or late-sweep queries start
        # running interpreted again
        "code_cache": code_cache_usage(spark),
    }
    # Sidecar carries the full per-query map; stdout gets ONE COMPACT
    # line. The grading driver tail-captures ~2 kB of output — nine
    # rounds of BENCH_r*.json recorded `parsed: null` because the full
    # line (~10 kB of per-query timings) overflowed that capture. The
    # compact line keeps the driver-contract fields (metric/value/unit/
    # queries/sf) but bounds "queries" to the slowest 10; everything is
    # in the sidecar.
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    with open(sidecar, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
    vs = full["vs_duckdb"] or {}
    jt = full["jobs_throughput"]
    slowest = dict(
        sorted(
            ((k, v) for k, v in timings.items() if v >= 0),
            key=lambda kv: -kv[1],
        )[:10]
    )
    compact = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "sec",
        "queries": slowest,  # slowest 10 only — full map in `full`
        "sf": sf_dir,
        "n_queries": full["n_queries"],
        "failed": full["failed"][:20],
        "median_ratio_vs_duckdb": vs.get("median_ratio"),
        "geomean_ratio_vs_duckdb": vs.get("geomean_ratio"),
        "n_compared_vs_duckdb": vs.get("n_compared"),
        "jobs_per_sec": jt["jobs_per_sec"],
        "enqueue_jobs_per_sec": jt["enqueue_jobs_per_sec"],
        "jobs_p50_latency_sec": jt["latency_sec"]["p50"],
        # host-state sentinel (1-min loadavg): a record captured on a
        # contended host self-identifies instead of reading as a
        # regression (the BENCH_r12 lesson)
        "loadavg_1m": [load_before[0], load_after[0]],
        # idle gate (r14): seconds spent waiting for loadavg < threshold
        # before the session started; exhausted=true means the bounded
        # budget ran out and the sweep proceeded on a contended host
        "idle_wait_sec": round(idle_wait_sec, 1),
        "idle_wait_exhausted": idle_wait_exhausted,
        "timing": "best-of-2",
        "full": sidecar,
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # stay inside the driver's tail capture
        compact["queries"] = dict(list(slowest.items())[:3])
        line = json.dumps(compact)
    print(line)
    spark.stop()


def load_snapshot() -> dict:
    """Per-query seconds from the newest committed bench_history
    snapshot — the reference scale for the outlier third attempt.
    Empty dict (no retries ever fire) when no snapshot exists."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    paths = glob.glob(os.path.join(here, "bench_history", "bench_full_r*.json"))

    def rnum(p: str) -> int:
        m = re.search(r"bench_full_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    if not paths:
        return {}
    try:
        with open(max(paths, key=rnum)) as fh:
            data = json.load(fh)
        return {k: v for k, v in data.get("queries", {}).items()
                if isinstance(v, (int, float)) and v > 0}
    except (OSError, ValueError):
        return {}


def code_cache_usage(spark) -> dict | None:
    """JIT code-cache occupancy via the driver JVM's MemoryPoolMXBeans
    (the CodeHeap pools on segmented code caches, 'Code Cache' on
    unsegmented). Driver-side JMX read, zero Spark jobs."""
    try:
        beans = (spark._jvm.java.lang.management.ManagementFactory
                 .getMemoryPoolMXBeans())
        used = mx = 0
        for i in range(beans.size()):
            b = beans.get(i)
            name = b.getName()
            if "CodeHeap" in name or "Code Cache" in name:
                u = b.getUsage()
                used += u.getUsed()
                mx += u.getMax()
        if mx <= 0:
            return None
        return {
            "used_mb": round(used / 2**20, 1),
            "max_mb": round(mx / 2**20, 1),
            "headroom_pct": round(100.0 * (1 - used / mx), 1),
        }
    except Exception:  # pragma: no cover — JMX shape drift must not fail a sweep
        return None


def vs_duckdb(timings: dict, sf_dir: str) -> dict | None:
    """Per-query ratio against the recorded single-node DuckDB baseline
    (BASELINE_QUERIES.json, tools/gen_duckdb_baseline.py) — the 2× gate
    BASELINE.md's jobs metric couldn't cover. None when no baseline was
    recorded for this sf (ratios across scale factors are meaningless)."""
    import math

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_QUERIES.json")
    if not os.path.exists(path):
        return None
    base = json.load(open(path))
    # per-SF store (round 9) or the legacy single-SF layout; abspath
    # before compare: `python3 bench.py` run with a relative
    # SPARK_GRAFT_SF_DIR must still match a recorded absolute sf_dir
    if "sfs" in base:
        base = base["sfs"].get(os.path.abspath(sf_dir))
        if base is None:
            return None
    elif os.path.abspath(base.get("sf_dir", "")) != os.path.abspath(sf_dir):
        return None
    # raw ratios for every comparison/gate; round only at display time —
    # a 2.004× query must not round itself under the 2.0 gate
    ratios = {
        name: timings[name] / dsec
        for name, dsec in base["queries"].items()
        if timings.get(name, -1) >= 0 and dsec > 0
    }
    vals = sorted(ratios.values())
    if not vals:
        return None
    return {
        "baseline": base.get("engine"),
        "n_compared": len(vals),
        "median_ratio": round(vals[len(vals) // 2], 2),
        "geomean_ratio": round(
            math.exp(sum(math.log(v) for v in vals) / len(vals)), 2
        ),
        "over_2x": {k: round(v, 2) for k, v in sorted(ratios.items()) if v > 2.0},
    }


def jobs_throughput(spark, n_jobs: int = 100_000, failure_rate: float = 0.01) -> dict:
    """Goose-parity load (BASELINE.md): 100k no-op jobs, 1% induced
    failure with exactly 1 retry, through the full streaming worker
    (ledger append → availableNow micro-batch → mapInPandas execute →
    transition commit). Reference: 8,300 jobs/sec on 4 cores / 25
    threads / 1 ms Redis latency."""
    import tempfile
    import time

    from goose_spark.client import JobClient
    from goose_spark.functions.registry import reset_flaky
    from goose_spark.streaming.worker import Worker

    reset_flaky()

    # warm-up parity (criterium, perf/goose/core.clj:39-53): one small
    # untimed pass through the full streaming path first — the file
    # source / checkpoint / commit machinery costs ~4s of one-time
    # spin-up in a fresh session that would otherwise be billed to the
    # measured load
    warm_root = tempfile.mkdtemp(prefix="goose-bench-warm-")
    warm_client = JobClient(warm_root)
    warm_client.ledger.append_rows(
        [
            warm_client._job_row("flaky", (f"warm-{i}", 1), None, max_retries=1)
            if i % 100 == 0
            else warm_client._job_row("noop", (i,), None)
            for i in range(5000)
        ]
    )
    warm_worker = Worker(spark, warm_root, retry_delay_fn=lambda n: 0)
    warm_worker.process_available()
    while True:
        tbl = warm_worker.ledger.read_scheduled()
        if tbl is None or tbl.num_rows == 0:
            break
        warm_worker.tick()
    reset_flaky()

    root = tempfile.mkdtemp(prefix="goose-bench-")
    client = JobClient(root)
    fail_every = int(1 / failure_rate)
    rows = []
    enq_start = time.perf_counter()
    for i in range(n_jobs):
        if i % fail_every == 0:
            row = client._job_row("flaky", (f"bench-{i}", 1), None, max_retries=1)
        else:
            row = client._job_row("noop", (i,), None)
        rows.append(row)
    client.ledger.append_rows(rows)
    enq_s = time.perf_counter() - enq_start

    worker = Worker(spark, root, retry_delay_fn=lambda n: 0)  # immediate retry
    run_start = time.perf_counter()
    worker.process_available()  # executes all + parks the 1% retries
    # retries are due immediately (delay 0) — tick() inside
    # process_available already swept them; drain any leftovers
    while True:
        tbl = worker.ledger.read_scheduled()
        if tbl is None or tbl.num_rows == 0:
            break
        worker.tick()
    run_s = time.perf_counter() - run_start

    # per-job latency distribution: success-commit time (seq is a ns
    # clock stamped at outcome) minus enqueued_at — the engine's analog
    # of goose's 2 ms enqueue→execute latency figure (BASELINE.md);
    # micro-batch latency is dominated by trigger+batch overhead
    import duckdb

    lat = duckdb.connect().execute(
        f"""SELECT ROUND(quantile_cont(l, 0.5), 3),
                   ROUND(quantile_cont(l, 0.95), 3),
                   ROUND(quantile_cont(l, 0.99), 3),
                   ROUND(MAX(l), 3)
            FROM (SELECT seq / 1e9 - epoch(enqueued_at) AS l
                  FROM read_parquet('{worker.ledger.log_dir}/*.parquet')
                  WHERE status = 'success')"""
    ).fetchone()
    return {
        "jobs": n_jobs,
        "executions": worker.executions,
        "enqueue_sec": round(enq_s, 3),
        "enqueue_jobs_per_sec": round(n_jobs / enq_s, 1),
        "process_sec": round(run_s, 3),
        "jobs_per_sec": round(n_jobs / run_s, 1),
        "latency_sec": {"p50": lat[0], "p95": lat[1], "p99": lat[2], "max": lat[3]},
        "failure_rate": failure_rate,
    }


if __name__ == "__main__":
    main()
