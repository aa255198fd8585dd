"""Plan-shape guards — conventions SCALE.md states in prose, enforced
as code.

``bounded_broadcast`` is the broadcast-hint audit (SCALE.md §"Broadcast
hints") turned into an assertion: an explicit ``F.broadcast()`` is
NEVER overridden by the planner, so a hint on a side that is only
*conventionally* bounded (a query batch, an ingest micro-batch) is an
executor-memory cliff the first time a caller violates the convention.
The guard counts the frame with a limit-bounded job first; over the cap
it returns the frame UN-hinted, so the join degrades to the planner's
shuffle strategy (AQE may still broadcast if the bytes are genuinely
small) instead of OOM-ing every executor.

Reference analog: goose bounds the equivalent fan-in with its
batch-size validation at enqueue time (``src/goose/batch.clj``); here
the bound must live at the JOIN because Spark callers can hand any
frame to the serve/ingest paths.
"""

from __future__ import annotations

import logging
import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

#: Default row cap for NARROW rows (a few ints/strings — probe pairs,
#: band keys, id lists): ~24 B/row keeps the broadcast well under the
#: ~100 MB executor comfort zone with 40× headroom.
NARROW_ROW_CAP = 1_000_000

#: Default row cap for rows CARRYING AN EMBEDDING (array<double> dim
#: ~64-1024): 20k × 1 KiB ≈ 20 MB — the documented query-batch
#: convention for the IVF serve path.
EMBEDDING_ROW_CAP = 20_000


def bounded_broadcast(
    df: DataFrame,
    max_rows: int = NARROW_ROW_CAP,
    n_rows: int | None = None,
    label: str = "",
) -> DataFrame:
    """``F.broadcast(df)`` iff ``df`` has ≤ ``max_rows`` rows, else
    ``df`` unchanged (planner decides — shuffle, or AQE broadcast on
    measured bytes).

    The check is one ``limit(max_rows+1).count()`` job — it early-exits
    at the cap, so an over-limit frame costs O(max_rows) scan, never a
    full count of an unbounded input. Callers that already know the
    cardinality (e.g. they counted the batch for other reasons) pass
    ``n_rows`` and skip the job; any UPPER BOUND is valid (it can only
    make the guard more conservative). When the count is unknown and
    the upstream stage is non-trivial, persist the frame first so the
    count job and the real join share one materialization.
    """
    if n_rows is None:
        n_rows = df.limit(max_rows + 1).count()
    if n_rows > max_rows:
        log.warning(
            "bounded_broadcast(%s): %s rows exceeds cap %s — hint "
            "dropped, join falls back to the planner's strategy",
            label or "<unnamed>", n_rows, max_rows,
        )
        return df
    return F.broadcast(df)


#: Row cap for ``local_relation``: frames routed through the driver must
#: be provably tiny (group-by-enum aggregates, per-source summaries).
LOCAL_RELATION_CAP = 10_000


def persist_shared(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize a subframe that feeds MORE THAN ONE downstream
    subplan, so the work above it runs once instead of once per
    consumer.

    Why ``persist()`` and NOT ``localCheckpoint(eager=False)``: a lazy
    local checkpoint re-plans and re-executes the FULL lineage at
    checkpoint-build time and again serializes every block to the
    block store before the first consumer can read — judge-measured at
    sf0.1 on q29 it cost 27.8 s to build + 5.1 s to materialize while
    the protected aggregation itself was 0.8 s, and the checkpointed
    blocks are non-recomputable (an executor loss KILLS the query
    instead of recomputing the partition). ``persist()`` keeps the
    lineage (recomputable, spill-to-disk via MEMORY_AND_DISK — the
    default StorageLevel here) and the eager ``count()`` guarantees the
    two consumers never race to compute the same partition twice.

    Keep ``localCheckpoint(eager=True)`` ONLY for iterative lineage
    truncation (``operators/clusters.py`` connected-components /
    PageRank loops), where forgetting the lineage is the point.

    Every frame is recorded so sweep callers (bench, the oracle gate)
    can drop exactly these per-query materializations between queries
    via ``release_shared()`` — NOT ``spark.catalog.clearCache()``,
    which would also evict the DELIBERATE cross-query session caches
    (the dedup pair table shared by dd2/dd4/dd6/dd7/q87, the trained
    k-means shared by ss3/ss5/ss7) and re-pay their build in every
    downstream query. An un-released frame is LRU-evicted under
    storage-memory pressure, never an OOM.
    """
    out = df.persist()
    if eager:
        out.count()
    with _SHARED_LOCK:
        _SHARED_FRAMES.append(out)
    return out


#: Frames persisted by persist_shared since the last release_shared().
#: Registration/release are lock-guarded so concurrent query builders
#: (e.g. the console serving two requests) can't race the list; the
#: LIFECYCLE contract is still sweep-scoped: bench.py and
#: tools/oracle_gate.py call release_shared() between queries, and a
#: caller running queries outside a sweep should call it when done —
#: un-released frames are LRU-evicted under storage pressure (never an
#: OOM), but they stay pinned in the JVM CacheManager until then.
_SHARED_FRAMES: list[DataFrame] = []
_SHARED_LOCK = threading.Lock()


def release_shared() -> int:
    """Unpersist every frame ``persist_shared`` recorded and clear the
    list; returns how many were released. Sweep callers invoke this
    between queries so per-query shared subframes never accumulate,
    while session-level caches (pair table, k-means) stay warm."""
    with _SHARED_LOCK:
        frames, _SHARED_FRAMES[:] = list(_SHARED_FRAMES), []
    for df in frames:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — a stopped session is fine
            pass
    return len(frames)


def local_relation(df: DataFrame, max_rows: int = LOCAL_RELATION_CAP) -> DataFrame:
    """Collect a PROVABLY TINY frame and rebuild it as a driver-local
    relation (``createDataFrame`` on the collected rows, same schema).

    For a shared subframe whose cardinality is bounded by an enum or a
    small group-by key (q29's 3-row per-returnflag aggregate, sp15's
    O(sources) mixture table) this beats both checkpoint and persist:
    every downstream consumer — including broadcast-join builds — scans
    a driver-local handful of rows (LogicalRDD over parallelized rows:
    trivial jobs, zero block-store traffic, zero re-execution of the
    lineage), and the collect itself is its one execution. The ``limit``
    probe enforces the bound the same way ``bounded_broadcast`` does:
    an over-cap frame raises instead of silently flooding the driver.
    """
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"local_relation: frame exceeds {max_rows} rows — use "
            "persist_shared() for unbounded shared subframes"
        )
    return df.sparkSession.createDataFrame(rows, df.schema)
