"""Streaming-core soak (round-9 directive #7): sustained
continuous-trigger run with steady offered load and every stateful
subsystem attached — cron tick, retries, dead-lettering, batch
callbacks, scheduler due-sweep, and materialized-state-view
maintenance — sampling RSS and on-disk state growth over time.

What "passes" means: after the warm-up samples, RSS and
checkpoint-bytes curves are FLAT (checkpoint offsets/commits grow by
O(1) small files per trigger and are compacted by Spark; the ledger
log grows linearly with offered load BY DESIGN — it is the append-only
history, compaction is a separate retention job). A leak shows up as a
superlinear RSS slope or unbounded checkpoint growth.

Usage: python3 tools/soak.py [duration_sec] [jobs_per_sec] [--out FILE]
Defaults: 1800 s, 50 jobs/s (≈90k jobs over the soak). Prints one
markdown sample row per interval; writes the raw samples as JSONL.
Run on an idle host (bench-isolation rule).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLE_SEC = 60


def _descendants(pid: int) -> list[int]:
    """pid + all transitive children, via /proc (no psutil in here)."""
    children: dict[int, list[int]] = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat") as fh:
                ppid = int(fh.read().split(")")[-1].split()[1])
        except OSError:
            continue
        children.setdefault(ppid, []).append(int(entry))
    out, stack = [], [pid]
    while stack:
        p = stack.pop()
        out.append(p)
        stack.extend(children.get(p, []))
    return out


def rss_mb() -> float:
    """RSS of this python process + the JVM (and any python workers)
    it spawned — the whole local-mode engine."""
    total = 0
    for p in _descendants(os.getpid()):
        try:
            with open(f"/proc/{p}/status") as fh:
                for line in fh:
                    if line.startswith("VmRSS:"):
                        total += int(line.split()[1])
                        break
        except OSError:
            pass
    return total / 1024.0


def du_mb(path: str) -> float:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(path):
        for f in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total / 1e6


def main() -> None:
    duration = int(sys.argv[1]) if len(sys.argv) > 1 else 1800
    rate = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    from goose_spark.api import LedgerAPI
    from goose_spark.client import JobClient
    from goose_spark.session import get_spark
    from goose_spark.streaming.stateview import MaterializedState
    from goose_spark.streaming.worker import Worker

    root = tempfile.mkdtemp(prefix="goose-soak-")
    spark = get_spark("gosling-soak")
    spark.sparkContext.setLogLevel("ERROR")

    client = JobClient(root)
    # cron fires every minute for the whole soak
    client.perform_every("soak-cron", "* * * * *", "noop", 0)
    worker = Worker(spark, root, retry_delay_fn=lambda n: 3)
    handle = worker.start(trigger_sec=0.5)
    view = MaterializedState(os.path.join(root, "state-view"))
    view_ck = os.path.join(root, "view-checkpoint")
    ledger = worker.ledger

    print(f"# soak: {duration}s at {rate} jobs/s, ledger={root}")
    print("| t_min | rss_mb | ckpt_mb | view_mb | log_mb | enq | done |")
    print("|---|---|---|---|---|---|---|", flush=True)

    samples = []
    start = time.time()
    enq = 0
    i = 0
    last_sample = start
    last_view_fold = start
    api = LedgerAPI(spark, root)
    try:
        while time.time() - start < duration:
            sec_start = time.time()
            # steady offered load: mostly instant jobs, a slice of
            # retrying / dying / scheduled / batch work each second
            batch = []
            for _ in range(rate):
                i += 1
                if i % 20 == 0:  # retry path: fails once, succeeds on retry
                    batch.append(("flaky", (f"soak-{i}", 1)))
                elif i % 97 == 0:  # dead-letter path
                    batch.append(("always-fail", (i,)))
                else:
                    batch.append(("noop", (i,)))
            # one ledger append per second of offered load (a real
            # producer pipelines; per-job perform_async = one parquet
            # file per job, which floods the file source's metadata log
            # long before any engine limit)
            rows = [
                client._job_row(fn, args, None,
                                **({"max_retries": 1} if fn == "always-fail" else {}))
                for fn, args in batch
            ]
            client.ledger.append_rows(rows)
            enq += len(batch)
            if i % (rate * 30) < rate:  # every ~30 s: a tracked batch
                client.perform_batch("noop", [(j,) for j in range(20)],
                                     callback_fn="noop")
                enq += 20
            if i % (rate * 20) < rate:  # every ~20 s: scheduled work
                client.perform_in_sec(5, "noop", i)
                enq += 1

            now = time.time()
            if now - last_view_fold >= 15:  # incremental view maintenance
                view.attach_stream(
                    ledger.log_stream(spark), view_ck
                ).awaitTermination()
                last_view_fold = now
            if now - last_sample >= SAMPLE_SEC:
                last_sample = now
                counts = api.dashboard_counts()
                s = {
                    "t_sec": round(now - start, 1),
                    "rss_mb": round(rss_mb(), 1),
                    "ckpt_mb": round(du_mb(worker.checkpoint_dir)
                                     + du_mb(view_ck), 2),
                    "view_mb": round(du_mb(view.root), 2),
                    "log_mb": round(du_mb(os.path.join(root, "log")), 2),
                    "enqueued": enq,
                    "success": counts.get("success", 0),
                    "dead": counts.get("dead", 0),
                    "retrying": counts.get("retrying", 0),
                }
                samples.append(s)
                print(f"| {s['t_sec']/60:.1f} | {s['rss_mb']} "
                      f"| {s['ckpt_mb']} | {s['view_mb']} | {s['log_mb']} "
                      f"| {s['enqueued']} | {s['success']} |", flush=True)
            sleep = 1.0 - (time.time() - sec_start)
            if sleep > 0:
                time.sleep(sleep)
    finally:
        handle.stop()

    # drain whatever is left, then final accounting
    worker.run_loop(3, sleep_sec=2)
    view.attach_stream(ledger.log_stream(spark), view_ck).awaitTermination()
    counts = api.dashboard_counts()
    summary = {
        "duration_sec": duration,
        "offered_rate": rate,
        "enqueued": enq,
        "final_counts": counts,
        "samples": samples,
        "view_matches_state": None,
    }
    # end-to-end invariant: the maintained view equals derived state
    a = sorted((r["id"], r["status"]) for r in view.read(spark).collect())
    b = sorted((r["id"], r["status"]) for r in ledger.state(spark).collect())
    summary["view_matches_state"] = a == b
    print(json.dumps({k: v for k, v in summary.items() if k != "samples"}))
    if out_path:
        with open(out_path, "w") as fh:
            for s in samples:
                fh.write(json.dumps(s) + "\n")
            fh.write(json.dumps(summary) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
