"""Worker process registry + heartbeat (W9).

The reference keeps a Redis process-set per worker fleet and a
per-process heartbeat key with an expiry
(``src/goose/brokers/redis/heartbeat.clj:7-33``); the console home page
and the metrics sleeper read it (``metrics.clj:55-58``). Spark owns
executor liveness, so the engine's registry exists for *observability*
parity: a ``workers/`` directory under the ledger root holds one tiny
parquet file per worker process, atomically swapped on every beat — the
file is the heartbeat key, its mtime-independent ``last_beat_at`` column
is the expiry clock.

Scale note: the registry is O(worker processes), not O(jobs) — a few
hundred rows at any fleet size. Reads are driver-side pyarrow (no Spark
job), same as the reference's O(1) Redis GETs.
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

#: Reference cadence/expiry (src/goose/defaults.clj:51-52).
HEARTBEAT_SLEEP_SEC = 15
HEARTBEAT_EXPIRE_SEC = 60

_SCHEMA = pa.schema(
    [
        ("worker_id", pa.string()),
        ("registered_at", pa.timestamp("us")),
        ("last_beat_at", pa.timestamp("us")),
        # Queue claim (worker.clj:27 `:queue` opt): the queues a scoped
        # worker consumes on its own checkpoint, empty for an unscoped
        # worker. The unscoped scheduler-owner reads these to avoid
        # double-consuming a scoped fleet's queues.
        ("queues", pa.list_(pa.string())),
    ]
)


def _now() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


class ProcessRegistry:
    """Process-set + heartbeat analog (heartbeat.clj:22-33): register on
    worker start, beat on every timer tick, deregister on graceful stop.
    A worker whose last beat is older than ``HEARTBEAT_EXPIRE_SEC`` reads
    as dead (the expiry semantics of the Redis heartbeat key)."""

    def __init__(self, root: str):
        self.dir = os.path.join(root, "workers")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, worker_id: str) -> str:
        return os.path.join(self.dir, f"{worker_id}.parquet")

    def _write(self, worker_id: str, registered_at: datetime,
               queues: list[str] | None) -> None:
        table = pa.Table.from_pylist(
            [
                {
                    "worker_id": worker_id,
                    "registered_at": registered_at,
                    "last_beat_at": _now(),
                    "queues": list(queues or []),
                }
            ],
            schema=_SCHEMA,
        )
        tmp = os.path.join(self.dir, f".tmp-{uuid.uuid4().hex}.parquet")
        pq.write_table(table, tmp)
        os.replace(tmp, self._path(worker_id))

    # -- process-set ops (add-to-set / del-from-set) -----------------------

    def register(self, worker_id: str, queues: list[str] | None = None) -> None:
        self._write(worker_id, _now(), queues)

    def beat(self, worker_id: str) -> None:
        """set-key-val with expiry (heartbeat.clj:29-32): refresh the
        beat, preserving the original registration time and queue claim."""
        reg, queues = _now(), None
        path = self._path(worker_id)
        if os.path.exists(path):
            row = pq.read_table(path).to_pylist()[0]
            reg = row["registered_at"]
            queues = row.get("queues")
        self._write(worker_id, reg, queues)

    def deregister(self, worker_id: str) -> None:
        """Graceful-stop dereg (heartbeat.clj:35-44). The engine has no
        in-progress queue to guard — checkpoint replay recovers any
        half-executed micro-batch — so removal is unconditional."""
        try:
            os.remove(self._path(worker_id))
        except FileNotFoundError:
            pass

    # -- reads (alive? / workers-count, console home) ----------------------

    def workers(self, expire_sec: int = HEARTBEAT_EXPIRE_SEC) -> list[dict]:
        cutoff = _now() - timedelta(seconds=expire_sec)
        out = []
        for f in sorted(os.listdir(self.dir)):
            if not f.endswith(".parquet") or f.startswith("."):
                continue
            row = pq.read_table(os.path.join(self.dir, f)).to_pylist()[0]
            row.setdefault("queues", [])  # pre-claim registry files
            row["alive"] = row["last_beat_at"] >= cutoff
            out.append(row)
        return out

    def claimed_queues(self, exclude_worker: str | None = None) -> set[str]:
        """Queues owned by *registered* scoped workers. Claims do NOT
        expire with the heartbeat: a crashed scoped worker's checkpoint
        still owns its unacked micro-batch, so another consumer taking
        over the queue before restart would double-execute the replay.
        The claim lives until graceful deregistration — same contract as
        the reference, where a queue's fleet owns it until shutdown."""
        claimed: set[str] = set()
        for f in sorted(os.listdir(self.dir)):
            if not f.endswith(".parquet") or f.startswith("."):
                continue
            row = pq.read_table(os.path.join(self.dir, f)).to_pylist()[0]
            if exclude_worker is not None and row["worker_id"] == exclude_worker:
                continue
            claimed.update(row.get("queues") or [])
        return claimed

    def alive(self, worker_id: str, expire_sec: int = HEARTBEAT_EXPIRE_SEC) -> bool:
        path = self._path(worker_id)
        if not os.path.exists(path):
            return False
        beat = pq.read_table(path)["last_beat_at"][0].as_py()
        return beat >= _now() - timedelta(seconds=expire_sec)

    def workers_count(self, expire_sec: int = HEARTBEAT_EXPIRE_SEC) -> int:
        """global-workers-count (heartbeat.clj:16-20): live processes."""
        return sum(1 for w in self.workers(expire_sec) if w["alive"])
