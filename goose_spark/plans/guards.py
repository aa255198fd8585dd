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
