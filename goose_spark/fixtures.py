"""Deterministic job-domain fixtures (FIXTURES.md §2, seed 42).

The driver testdata covers the relational star schema; the job-domain
tables (``jobs``, ``batches``, ``cron_entries``, ``job_events``) are
generated here — they play the role of goose's test factories
(``test/goose/factories.clj:12-60``) at query-relevant volume.

Written as plain parquet via pyarrow (single file each, committed to the
repo) so both Spark and the DuckDB oracle read byte-identical inputs.

Invariants enforced (FIXTURES.md §2.1):
  * ``error IS NOT NULL`` iff status ∈ {retrying, dead} or a ~5% slice of
    success rows ("succeeded after retry", ``src/goose/job.clj:18-19``)
  * ``died_at IS NOT NULL`` iff dead; dead rows have
    ``retry_count = max_retries`` (``src/goose/retry.clj:29-32``)
  * ``run_at IS NOT NULL`` iff scheduled/retrying
  * ``max_retries`` defaults to 27 (``src/goose/retry.clj:61`` — the same
    value goose's dead-job factory hardcodes)
  * batch statuses derive from member statuses per
    ``src/goose/batch.clj:40-46`` (Q-J6 cross-checks this)
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pandas as pd

SEED = 42
N_JOBS = 10_000
N_BATCHES = 50
N_CRON = 20

QUEUES = ["default", "priority", "test-retry", "emails", "reports"]
FNS = [f"app.jobs/{name}" for name in (
    "send-email", "resize-image", "sync-crm", "charge-card", "export-csv",
    "reindex", "purge-cache", "geo-lookup", "score-lead", "render-pdf",
    "fetch-feed", "dedupe-contacts", "rotate-keys", "warm-cache",
    "notify-slack", "archive-logs", "train-model", "compact-segment",
    "audit-trail", "refresh-view",
)]
ERRORS = [
    "connection refused", "timeout after 30s", "upstream 503",
    "invalid payload", "rate limited", "oom killed",
]

T0 = pd.Timestamp("2026-01-01 00:00:00")
SPAN_S = 180 * 24 * 3600  # → 2026-06-30

FIXTURES_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data", "fixtures")


def _uuid(rng: np.random.RandomState) -> str:
    return str(uuid.UUID(bytes=rng.bytes(16), version=4))


def _ts(rng: np.random.RandomState, n: int) -> pd.Series:
    secs = rng.randint(0, SPAN_S, size=n)
    ms = rng.randint(0, 1000, size=n)
    return (T0 + pd.to_timedelta(secs, unit="s") + pd.to_timedelta(ms, unit="ms"))


def generate_jobs(rng: np.random.RandomState) -> pd.DataFrame:
    n = N_JOBS
    statuses = rng.choice(
        ["success", "enqueued", "scheduled", "retrying", "in_progress", "dead"],
        size=n,
        p=[0.55, 0.20, 0.10, 0.05, 0.02, 0.08],
    )
    df = pd.DataFrame(
        {
            "id": [_uuid(rng) for _ in range(n)],
            "queue": rng.choice(QUEUES, size=n, p=[0.5, 0.15, 0.1, 0.15, 0.1]),
            "execute_fn": rng.choice(FNS, size=n),
            "args": [json.dumps([int(v)]) for v in rng.randint(0, 1000, size=n)],
            "status": statuses,
            "priority": rng.choice([0, 1], size=n, p=[0.9, 0.1]).astype("int32"),
            "enqueued_at": _ts(rng, n),
            "max_retries": np.where(rng.rand(n) < 0.9, 27, rng.randint(0, 5, size=n)).astype("int32"),
        }
    )

    failed = np.isin(statuses, ["retrying", "dead"])
    success_after_retry = (statuses == "success") & (rng.rand(n) < 0.05)
    has_error = failed | success_after_retry
    df["error"] = np.where(has_error, rng.choice(ERRORS, size=n), None)

    rc = rng.randint(0, 27, size=n)
    df["retry_count"] = np.where(
        statuses == "dead", df["max_retries"], np.minimum(rc, df["max_retries"])
    ).astype("int32")
    df.loc[~has_error, "retry_count"] = np.nan
    df["retry_count"] = df["retry_count"].astype("Int32")

    run_at = df["enqueued_at"] + pd.to_timedelta(rng.randint(60, 30 * 24 * 3600, size=n), unit="s")
    df["run_at"] = run_at.where(np.isin(statuses, ["scheduled", "retrying"]))

    df["first_failed_at"] = (df["enqueued_at"] + pd.to_timedelta(rng.randint(1, 3600, size=n), unit="s")).where(has_error)
    df["last_retried_at"] = (df["first_failed_at"] + pd.to_timedelta(rng.randint(1, 7200, size=n), unit="s")).where(has_error)
    df["died_at"] = (df["enqueued_at"] + pd.to_timedelta(rng.randint(3600, 60 * 24 * 3600, size=n), unit="s")).where(statuses == "dead")
    # keep died_at inside the fixture window so retention literals split it
    df.loc[df["died_at"] > pd.Timestamp("2026-06-30"), "died_at"] = pd.Timestamp("2026-06-29 12:00:00")

    df["retry_queue"] = np.where((rng.rand(n) < 0.1) & has_error, "test-retry", None)
    df["cron_name"] = np.where(rng.rand(n) < 0.05, rng.choice([f"cron-{i}" for i in range(N_CRON)], size=n), None)
    df["worker_id"] = np.where(statuses == "in_progress", rng.choice([f"worker-{i}" for i in range(8)], size=n), None)
    df["batch_id"] = None
    return df


def assign_batches(rng: np.random.RandomState, jobs: pd.DataFrame) -> pd.DataFrame:
    """Tag member jobs and derive batch rows whose status matches
    src/goose/batch.clj:40-46 over the actual member statuses."""
    from goose_spark.schema import batch_status

    rows = []
    # half the batches sample only terminal-status members so all four
    # derived statuses (in-progress/success/dead/partial-success) occur
    terminal = jobs.index[jobs["status"].isin(["success", "dead"])].to_numpy()
    only_success = jobs.index[jobs["status"] == "success"].to_numpy()
    only_dead = jobs.index[jobs["status"] == "dead"].to_numpy()
    mixed = jobs.index.to_numpy()
    for arr in (terminal, only_success, only_dead, mixed):
        rng.shuffle(arr)
    cursors = {"terminal": 0, "success": 0, "dead": 0, "mixed": 0}
    pools = {"terminal": terminal, "success": only_success, "dead": only_dead, "mixed": mixed}
    kinds = (["mixed"] * 25) + (["terminal"] * 13) + (["success"] * 8) + (["dead"] * 4)
    for kind in kinds:
        size = int(rng.randint(5, 60))
        pool = pools[kind]
        members = pool[cursors[kind] : cursors[kind] + size]
        cursors[kind] += size
        members = members[jobs.loc[members, "batch_id"].isna().to_numpy()]
        if len(members) == 0:
            continue
        size = len(members)
        bid = _uuid(rng)
        jobs.loc[members, "batch_id"] = bid
        st = jobs.loc[members, "status"]
        enq = int(st.isin(["enqueued", "in_progress", "scheduled"]).sum())
        retrying = int((st == "retrying").sum())
        succ = int((st == "success").sum())
        dead = int((st == "dead").sum())
        rows.append(
            {
                "id": bid,
                "callback_fn": "app.jobs/notify-slack" if rng.rand() < 0.7 else None,
                "linger_sec": int(rng.choice([3600, 86400])),
                "queue": str(rng.choice(QUEUES)),
                "total": int(size),
                "status": batch_status(enq, retrying, succ, dead),
                "created_at": jobs.loc[members, "enqueued_at"].min(),
            }
        )
    return pd.DataFrame(rows)


def generate_cron(rng: np.random.RandomState) -> pd.DataFrame:
    scheds = ["*/5 * * * *", "0 * * * *", "30 2 * * *", "0 9 * * 1-5",
              "15 */6 * * *", "0 0 1 * *", "45 23 * * 0"]
    tzs = ["UTC", "US/Pacific", "Asia/Kolkata", "Europe/Berlin"]
    return pd.DataFrame(
        {
            "cron_name": [f"cron-{i}" for i in range(N_CRON)],
            "cron_schedule": [scheds[i % len(scheds)] for i in range(N_CRON)],
            "timezone": [tzs[i % len(tzs)] for i in range(N_CRON)],
            "execute_fn": rng.choice(FNS, size=N_CRON),
            "args": [json.dumps([i]) for i in range(N_CRON)],
            "queue": rng.choice(QUEUES, size=N_CRON),
        }
    )


def generate_job_events(rng: np.random.RandomState) -> pd.DataFrame:
    """Streaming scenario input (FIXTURES.md §2.4): 1k burst with a 1%
    failure cohort, out-of-order events, and a 20-job batch cohort."""
    rows = []
    seq = 0
    base = pd.Timestamp("2026-07-01 00:00:00")
    for i in range(1000):
        jid = _uuid(rng)
        t = base + pd.to_timedelta(int(rng.randint(0, 600_000)), unit="ms")
        rows.append((seq, t, "enqueue", jid, "default", "noop", json.dumps([i]), None))
        seq += 1
        kind = "fail" if rng.rand() < 0.01 else "complete"
        rows.append((seq, t + pd.to_timedelta(int(rng.randint(1, 5000)), unit="ms"),
                     kind, jid, "default", "noop", None, ERRORS[0] if kind == "fail" else None))
        seq += 1
    # out-of-order cohort: event_time earlier than already-emitted rows
    for i in range(50):
        jid = _uuid(rng)
        t = base - pd.to_timedelta(int(rng.randint(1, 120_000)), unit="ms")
        rows.append((seq, t, "enqueue", jid, "late", "noop", json.dumps([i]), None))
        seq += 1
    bid = _uuid(rng)
    for i in range(20):
        jid = _uuid(rng)
        t = base + pd.to_timedelta(700_000 + i * 1000, unit="ms")
        rows.append((seq, t, "enqueue", jid, "batch-q", "noop", json.dumps([i]), bid))
        seq += 1
        terminal = ["complete", "fail", "complete"][i % 3]
        rows.append((seq, t + pd.to_timedelta(500, unit="ms"), terminal, jid,
                     "batch-q", "noop", None, bid))
        seq += 1
    return pd.DataFrame(
        rows, columns=["seq", "event_time", "kind", "job_id", "queue", "execute_fn", "args", "payload"]
    )


def write_fixtures(out_dir: str = FIXTURES_DIR) -> dict[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(SEED)
    jobs = generate_jobs(rng)
    batches = assign_batches(rng, jobs)
    cron = generate_cron(rng)
    events = generate_job_events(rng)

    paths = {}
    for name, df in [("jobs", jobs), ("batches", batches), ("cron_entries", cron), ("job_events", events)]:
        path = os.path.join(out_dir, f"{name}.parquet")
        # ms-precision timestamps (epoch-ms parity with the reference,
        # src/goose/utils.clj:44-48) — also keeps Spark's parquet reader
        # happy (it rejects TIMESTAMP(NANOS)).
        df.to_parquet(path, index=False, coerce_timestamps="ms", allow_truncated_timestamps=True)
        paths[name] = path
    # an active session may have memoized reads of the old files — evict
    # so the next t()/fixture() call resolves the fresh listing
    from goose_spark.queries.base import invalidate_read_cache

    invalidate_read_cache(out_dir)
    return paths


if __name__ == "__main__":
    for name, path in write_fixtures().items():
        print(name, "→", path)
