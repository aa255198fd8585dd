"""As-of (point-in-time) join — a two-table temporal join Spark lacks
natively (pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` / kdb ``aj``).

Scalable formulation: UNION the two sides, ONE hash shuffle on the join
key, one per-key sort, then a running ``last(..., ignorenulls)`` window
carries the most recent right-side row onto every left row — O(n log n)
per key, no range-join candidate explosion (a naive
``l.ts >= r.ts`` range join materializes O(|L|·|R|) pairs per key
before picking the max; this never does). The right side's payload is
packed into ONE struct so all carried columns come from the SAME right
row even when some of its values are null.

Semantics (backward): for each left row, the right row of the same key
with the greatest ``right_ts <= left_ts`` (ties on the timestamp admit
the right row — DuckDB's ``ON l.ts >= r.ts`` inclusive contract).
Forward mirrors it: smallest ``right_ts >= left_ts``. Left-join shape:
unmatched left rows keep null right columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              direction: str = "backward",
              suffix: str = "_right") -> DataFrame:
    """Returns ``left`` with the as-of matched ``right_cols`` (renamed
    ``<col><suffix>`` on name collisions) and ``<right_ts><suffix>``,
    null where no right row qualifies."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    if right_ts not in right_cols:
        right_cols = [right_ts] + right_cols

    pack = F.struct(*[F.col(c) for c in right_cols])
    pack_type = right.select(pack.alias("_p")).schema["_p"].dataType

    # side tags order equal timestamps so the inclusive bound holds:
    # backward → right rows first (a right row AT left_ts is visible to
    # the running last); forward → right rows last (visible to the
    # running first over the following frame).
    right_tag = 0 if direction == "backward" else 2
    # a right row with a NULL timestamp can never satisfy the inequality
    # (merge_asof/DuckDB contract) — without this filter it would sort
    # nulls-first and be carried onto every left row as a phantom match
    right = right.filter(F.col(right_ts).isNotNull())
    l = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(pack_type).alias("_rpack"),
    )
    r = right.select(
        *keys,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
        F.col(right_ts).alias("_ats"),
        F.lit(right_tag).alias("_side"),
        pack.alias("_rpack"),
    )
    u = l.unionByName(r.select(*l.columns))

    # deterministic tie-break: multiple right rows sharing (key, ts)
    # would otherwise be carried by whichever last() sees last — a
    # partitioning-dependent choice. Hash the packed right payload so
    # the carried row is a pure function of the data (left rows hash
    # null → a constant, which never competes: only right packs are
    # candidates for last/first(ignorenulls)).
    u = u.withColumn("_tie", F.xxhash64("_rpack"))
    w = Window.partitionBy(*keys).orderBy("_ats", "_side", "_tie")
    if direction == "backward":
        carried = F.last("_rpack", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        carried = F.first("_rpack", ignorenulls=True).over(
            w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
    # a left row with a NULL timestamp likewise matches nothing (it
    # would sort first and, forward, adopt the earliest right row)
    matched = u.withColumn(
        "_m", F.when(F.col("_ats").isNotNull(), carried)
    ).filter(F.col("_side") == 1)

    out_cols = [F.col(c) for c in left.columns]
    taken = set(left.columns)
    for c in right_cols:
        name = c + suffix if c in taken else c
        out_cols.append(F.col("_m").getField(c).alias(name))
    return matched.select(*out_cols)
