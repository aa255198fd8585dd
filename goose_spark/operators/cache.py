"""Session-scoped persisted-DataFrame caches, with eviction.

Several operators reuse an expensive intermediate (projected embeddings,
shingled docs, LSH band tables) across queries in one session; persisting
it makes the kernel run once per session — at 100 TB the same role is
played by a parquet checkpoint. The naive module-dict version leaks:
entries keyed by a stopped session's applicationId accumulate forever
and their DataFrame handles pin storage bookkeeping. This helper evicts
any entry whose applicationId no longer matches the active session
(unpersisting it, best-effort — a dead JVM already freed the blocks) and
exposes an explicit clear hook.

Every build is timed into ``BUILD_LOG`` (label → seconds, including the
eager materialization) so sweep harnesses can attribute first-use build
cost: a shared cache bills its build to whichever query runs first in a
sweep (dd2 oscillated 1.3–6.3 s across bench records purely on sweep
order), and bench.py's ``cache_builds`` sidecar map makes that visible
instead of leaving the per-query numbers order-dependent mysteries
(VERDICT r12 directive #6).
"""

from __future__ import annotations

import threading
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

#: every cache dict registered through get_or_persist, for clear_caches()
_ALL_CACHES: list[dict] = []

#: guards the miss path of both caches (ADVICE r13): two concurrent
#: console builders that both miss would otherwise build+persist the
#: same frame twice, and the overwritten loser stays pinned in JVM
#: storage with no remaining handle until session stop. One module
#: lock (not per-cache): builds are rare, contention is nil, and it
#: also serializes BUILD_LOG writes. MUST be reentrant — builds nest
#: (lsh_pairs' build calls shingled_docs, both cached); a plain Lock
#: self-deadlocks the calling thread on the inner miss.
_MISS_LOCK = threading.RLock()

#: label → build seconds for every cache build THIS process performed
#: (misses only; hits cost nothing and are not logged). Sweep harnesses
#: snapshot the keys around each query to attribute first-use cost.
BUILD_LOG: dict[str, float] = {}


def _log_key(label: str | None, extra_key) -> str:
    return f"{label or 'cache'}@{extra_key}"


def get_or_persist(cache: dict, spark: SparkSession, extra_key,
                   build: Callable[[], DataFrame],
                   label: str | None = None) -> DataFrame:
    import time

    from pyspark import StorageLevel

    if not any(c is cache for c in _ALL_CACHES):
        _ALL_CACHES.append(cache)
    app = spark.sparkContext.applicationId
    for k in [k for k in cache if k[0] != app]:
        df = cache.pop(k)
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — the owning session is gone
            pass
    key = (app, extra_key)
    df = cache.get(key)
    if df is None:
        # double-checked under the module lock: without it, two
        # concurrent callers can both miss and both persist, and the
        # overwritten loser leaks pinned JVM storage (ADVICE r13)
        with _MISS_LOCK:
            df = cache.get(key)
            if df is None:
                start = time.perf_counter()
                df = build().persist(StorageLevel.MEMORY_AND_DISK)
                # eager: every consumer full-scans these intermediates
                # anyway, and materializing here (a) stops two consumers
                # racing to compute the same partitions twice and
                # (b) makes the build cost a measurable unit instead of
                # smearing into the first consumer
                df.count()
                BUILD_LOG[_log_key(label, extra_key)] = round(
                    time.perf_counter() - start, 4
                )
                cache[key] = df
    return df


def get_or_compute(cache: dict, spark: SparkSession, extra_key,
                   build: Callable, label: str | None = None):
    """Session-scoped cache for plain (non-DataFrame) values — trained
    IVF centroids, PQ codebooks. Same keying/eviction contract as
    get_or_persist, minus the persist/unpersist (nothing pins JVM
    storage). Lets ss3/ss5/ss7 share ONE k-means per (session, sf)
    instead of re-training per query."""
    import time

    if not any(c is cache for c in _ALL_CACHES):
        _ALL_CACHES.append(cache)
    app = spark.sparkContext.applicationId
    for k in [k for k in cache if k[0] != app]:
        cache.pop(k)
    key = (app, extra_key)
    if key not in cache:
        # double-checked, same rationale as get_or_persist: a duplicate
        # k-means training is merely wasted CPU (no pinned storage) but
        # the BUILD_LOG write still races without the lock
        with _MISS_LOCK:
            if key not in cache:
                start = time.perf_counter()
                cache[key] = build()
                BUILD_LOG[_log_key(label, extra_key)] = round(
                    time.perf_counter() - start, 4
                )
    return cache[key]


def clear_caches() -> None:
    """Unpersist and drop every cached intermediate (all sessions)."""
    for cache in _ALL_CACHES:
        for df in cache.values():
            try:
                if hasattr(df, "unpersist"):
                    df.unpersist()
            except Exception:  # noqa: BLE001
                pass
        cache.clear()
