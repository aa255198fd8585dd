"""Effect-once dedup table — SURVEY §7.4.3's promise made concrete.

The engine (like goose) is AT-LEAST-ONCE: a crash between a
micro-batch's execution and its checkpoint commit replays the batch
(reference ADR ``architecture-decisions/pages/reliability.md`` — jobs
must be idempotent; orphan replay
``src/goose/brokers/redis/orphan_checker.clj:9-25`` re-runs in-progress
jobs the same way). For side effects that are NOT naturally idempotent,
this table turns the replayed execution into a no-op: every applied
effect leaves a completion marker keyed by a caller-chosen effect id —
the job id for per-job effects, the ``batch_id`` for batch callbacks —
and a replay sees the marker and skips.

Protocol (markers record COMPLETION, never intent):

1. marker exists → skip (the replay path);
2. run the effect;
3. write the marker atomically (temp file + ``os.replace``).

A crash INSIDE steps 2–3 re-runs the effect on replay — the unavoidable
window of any non-transactional sink (Spark's own foreachBatch docs
prescribe exactly this batch-id-dedup pattern). Close it where it
matters by making the effect atomic WITH the marker (emit the effect's
output and the marker under one rename) or by using a transactional
sink.

The table is a plain directory, shared by executor processes through
the same filesystem the ledger uses (at cluster scale: the DFS). Marker
names are sha256(effect_id), so any string — job ids, composite
``batch_id/phase`` keys — is safe.
"""

from __future__ import annotations

import hashlib
import os
import tempfile


class EffectOnceTable:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _marker(self, effect_id: str) -> str:
        return os.path.join(
            self.root, hashlib.sha256(effect_id.encode()).hexdigest()
        )

    def applied(self, effect_id: str) -> bool:
        return os.path.exists(self._marker(effect_id))

    def mark(self, effect_id: str, payload: str = "") -> None:
        """Atomic completion record: a concurrent reader sees the marker
        fully written or not at all (temp + rename, the ledger's own
        commit idiom)."""
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".tmp-")
        try:
            os.write(fd, payload.encode())
        finally:
            os.close(fd)
        os.replace(tmp, self._marker(effect_id))

    def sweep_older_than(self, max_age_sec: float) -> int:
        """Retention for completed markers (the dead-set/ledger
        retention analog — goose prunes its dead set the same way a
        marker table must prune, or a long-lived deployment accumulates
        one file per effect forever). Safe bound: a marker only protects
        against REPLAY of its batch, and replay reaches at most the
        checkpoint's un-committed tail — so any ``max_age_sec``
        comfortably beyond the worst replay/recovery horizon (hours,
        not the default trigger seconds) cannot re-open an effect.
        Returns the number of markers removed; scratch ``.lock``/
        ``.tmp-`` files past the horizon are swept too."""
        import contextlib
        import time

        cutoff = time.time() - max_age_sec
        removed = 0
        for f in os.listdir(self.root):
            p = os.path.join(self.root, f)
            with contextlib.suppress(OSError):  # racing sweeper/marker
                if os.path.getmtime(p) < cutoff:
                    os.unlink(p)
                    if not (f.endswith(".lock") or f.startswith(".tmp-")):
                        removed += 1
        return removed

    def run_once(self, effect_id: str, thunk) -> bool:
        """Run ``thunk`` unless ``effect_id`` already completed. Returns
        True when the effect ran, False when the marker short-circuited
        it (the replay path).

        Concurrent racers (e.g. an orphan re-run overlapping a slow live
        worker) are serialized with an exclusive ``flock`` on a per-effect
        lock file, double-checking the marker inside the lock — so two
        overlapping executors cannot both run the thunk. A crash while
        holding the lock releases it at the kernel (no deadlock) and
        leaves no marker, so replay legitimately re-runs. The lock is
        advisory and per-filesystem: at cluster scale the marker dir must
        live on a filesystem with POSIX lock semantics (or this table is
        swapped for a transactional store — the same placement decision
        goose delegates to Redis's single-writer atomicity)."""
        if self.applied(effect_id):
            return False
        import contextlib
        import fcntl

        lock_path = self._marker(effect_id) + ".lock"
        with open(lock_path, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            if self.applied(effect_id):  # raced: the other holder won
                return False
            thunk()
            self.mark(effect_id)
            # scratch cleanup (the marker is the durable record). Safe
            # despite the classic unlink-race: a racer locking a fresh
            # inode can only proceed past its marker re-check if the
            # marker is absent, and the unlink happens strictly after
            # mark() — so no two holders ever both pass the re-check.
            with contextlib.suppress(OSError):
                os.unlink(lock_path)
        return True
