"""Temporal interval operators Spark has no built-in for: the banded
(bounded-Δt) join and the sweep-line concurrency profile.

Both are expressed so the plan is the one you'd want at 100 TB:

- :func:`banded_join` — "all pairs within ±band" with NO selective
  equi-key. A naive range join is O(|L|·|R|) candidate pairs (Catalyst
  plans a broadcast-nested-loop); bucketing both sides by
  ``floor(epoch/band)`` and exploding the LEFT side into its 3 adjacent
  buckets turns it into ONE hash shuffle whose candidate set is only
  the pairs at most one band apart — the standard interval-blocking
  trick (same family as the LSH band-bucket join in operators/dedup).
- :func:`interval_concurrency` — running overlap count over interval
  endpoints. The textbook formulation is a GLOBAL ordered running sum
  (single-partition window — the scale-killer sp3/sp4 eliminated); this
  one rides the same two-pass distributed prefix sum: per-bucket delta
  subtotals → O(buckets) driver round-trip → per-bucket local windows.

Reference parity: goose (a background-job library) has no temporal
analytics; these belong to the "beyond the reference" pipeline surface
(SURVEY §2.7) next to as-of join (operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize_intervals(events: DataFrame, gap_min: int,
                         key: str = "user_id", ts: str = "ts",
                         tiebreak: str = "event_id") -> DataFrame:
    """Gaps-and-islands sessionization to an INTERVAL table: one row
    per (key, session) with ``start``/``end`` timestamps. Exact-µs gap
    comparison (``unix_micros``), deterministic tie-break on
    ``tiebreak`` — the ONE sessionize-to-intervals implementation
    shared by q76/q81/the temporal example (q30 keeps its own
    per-session value aggregation on the same CTE silhouette)."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    lag_us = F.unix_micros(F.lag(ts).over(w))
    new_sess = F.when(
        lag_us.isNull()
        | ((F.unix_micros(F.col(ts)) - lag_us) > gap_min * 60 * 1_000_000),
        1,
    ).otherwise(0)
    run = Window.partitionBy(key).orderBy(ts, tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.select(key, ts, tiebreak)
        .withColumn("sid", F.sum(new_sess).over(run))
        .groupBy(key, "sid")
        .agg(F.min(ts).alias("start"), F.max(ts).alias("end"))
    )


def banded_join(left: DataFrame, right: DataFrame, band_sec: int,
                left_ts: str = "ts", right_ts: str = "ts") -> DataFrame:
    """Inner-join every left row to every right row with
    ``|left.ts - right.ts| <= band_sec`` (inclusive, exact to the µs).

    Plan shape: right rows hash into ONE band bucket
    (``floor(epoch_us / band_us)``); left rows explode into bucket-1,
    bucket, bucket+1 (any row within ±band is at most one bucket away).
    The equi-join on the bucket id is an ordinary hash shuffle —
    candidate pairs are bounded by events-per-2-bands, not |L|·|R| —
    and each qualifying pair matches EXACTLY once (the right side owns
    a single bucket). AQE's skew split handles hot buckets (a traffic
    spike inside one band) like any other skewed hash join.

    Column naming: output carries every left column plus the right
    columns suffixed ``_r`` on collision. NULL timestamps on either
    side match nothing (same contract as operators/asof.py).
    """
    band_us = band_sec * 1_000_000
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    lt = left.filter(F.col(left_ts).isNotNull()).select(
        *left.columns,
        l_us.alias("_lus"),
        F.explode(
            F.array(
                F.floor(l_us / band_us) - 1,
                F.floor(l_us / band_us),
                F.floor(l_us / band_us) + 1,
            )
        ).alias("_bkt"),
    )
    renames = {c: c + "_r" for c in right.columns if c in left.columns}
    rt = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.col(c).alias(renames.get(c, c)) for c in right.columns],
        r_us.alias("_rus"),
        F.floor(r_us / band_us).alias("_bkt"),
    )
    return (
        lt.join(rt, "_bkt")
        .filter(F.abs(F.col("_lus") - F.col("_rus")) <= band_us)
        .drop("_bkt", "_lus", "_rus")
    )


def interval_overlap_join(a: DataFrame, b: DataFrame, bucket_sec: int,
                          a_start: str = "start", a_end: str = "end",
                          b_start: str = "start", b_end: str = "end",
                          salt: int = 1) -> DataFrame:
    """Inner-join every pair of OVERLAPPING intervals (inclusive:
    ``a.start <= b.end AND b.start <= a.end``) — the interval×interval
    big brother of :func:`banded_join` (which joins points).

    Plan shape: each interval explodes over the ``bucket_sec``-wide
    buckets it spans (explode factor = len/bucket + 1 — pick a bucket
    near the typical interval length), the equi-join runs on the bucket
    id, and the EXACTLY-ONCE guard keeps each overlapping pair in one
    bucket only: the bucket containing ``max(a.start, b.start)``. Both
    intervals provably span that bucket (overlap means
    ``max(starts) <= min(ends)``), so no pair is lost, and no pair
    duplicates across buckets — no distinct needed. This is the
    standard blocked interval join (Flink interval join / Spark
    stream-stream time-bound join use the same state-bucketing idea).

    ``salt`` — degenerate-skew guard (same family as the LSH
    ``max_bucket`` cap in operators/dedup.py, but EXACT: salting
    re-shards, never drops). A hot bucket (mass-concurrent intervals)
    concentrates its bucket² candidate pairs in one join task; with
    ``salt = S`` the ``a`` side spreads each bucket across S sub-shards
    (per-row ``monotonically_increasing_id % S`` — even for identical
    rows, the worst skew) and the ``b`` side replicates into all S, so
    the hot task shrinks ×S at the cost of S× shuffle volume on ``b``.
    Pass the bigger/hotter side as ``a``. Default 1 = off (AQE's
    skew-join split already re-balances moderate skew); the pair set is
    identical at any salt.
    """
    bus = bucket_sec * 1_000_000

    def prep(df, s, e, tag):
        sus, eus = F.unix_micros(F.col(s)), F.unix_micros(F.col(e))
        return df.filter(F.col(s).isNotNull() & F.col(e).isNotNull()).select(
            *[F.col(c).alias(f"{c}_{tag}") for c in df.columns],
            sus.alias(f"_s_{tag}"),
            eus.alias(f"_e_{tag}"),
            F.explode(
                F.sequence(F.floor(sus / bus), F.floor(eus / bus))
            ).alias("_bkt"),
        )

    pa, pb = prep(a, a_start, a_end, "a"), prep(b, b_start, b_end, "b")
    keys = ["_bkt"]
    if salt > 1:
        # row-level shard id: stable within an execution (partition id +
        # row position), spreads even bit-identical rows; correctness
        # never depends on WHICH shard a row lands in — each a-row owns
        # exactly one, and every b-row visits all S
        pa = pa.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), salt))
        pb = pb.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<long>"))
        )
        keys = ["_bkt", "_salt"]
    later_start = F.greatest(F.col("_s_a"), F.col("_s_b"))
    return (
        pa.join(pb, keys)
        .filter(
            (F.col("_s_a") <= F.col("_e_b"))
            & (F.col("_s_b") <= F.col("_e_a"))
            & (F.col("_bkt") == F.floor(later_start / bus))
        )
        .drop(*keys, "_s_a", "_e_a", "_s_b", "_e_b")
    )


def interval_concurrency(intervals: DataFrame, spark: SparkSession,
                         start_col: str = "start", end_col: str = "end",
                         bucket: str = "day") -> DataFrame:
    """Sweep-line concurrency: for each interval endpoint, the number of
    intervals open at that instant (closed intervals: a start is counted
    before an end at the same timestamp — the max-overlap convention).

    Returns ``(ts, delta, level)`` rows, one per endpoint: ``level`` is
    the running open-interval count AFTER applying the endpoint's ±1.

    Scale shape (the whole point): a global ``Window.orderBy(ts)``
    running sum funnels every endpoint through one task. Instead:

    1. endpoints bucket by ``date_trunc(bucket, ts)``;
    2. pass 1: per-bucket SUM(delta) → driver (O(buckets) longs) →
       exclusive running offsets, broadcast back;
    3. pass 2: per-bucket ordered window adds the local prefix sum to
       the bucket's offset — all buckets rank in parallel.

    Intermediate levels at tied (ts, delta) keys are a permutation of
    the same value set (+1 runs ascend, −1 runs descend), so any
    aggregate over ``level`` that is order-insensitive within ties —
    MAX/MIN per period, the daily peak — is deterministic and
    engine-portable even though Spark's intra-tie row order is not.
    """
    # same NULL contract as banded_join/interval_overlap_join: a row
    # missing either endpoint is no interval — and a NULL bucket would
    # crash the driver-side offset sort
    intervals = intervals.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    )
    starts = intervals.select(
        F.col(start_col).alias("ts"), F.lit(1).alias("delta")
    )
    ends = intervals.select(F.col(end_col).alias("ts"), F.lit(-1).alias("delta"))
    pts = starts.unionAll(ends).withColumn(
        "_bkt", F.date_trunc(bucket, "ts")
    )
    sums = pts.groupBy("_bkt").agg(F.sum("delta").alias("s")).collect()
    offs, acc = [], 0
    for r in sorted(sums, key=lambda r: r["_bkt"]):
        offs.append((r["_bkt"], acc))
        acc += int(r["s"])
    off_df = spark.createDataFrame(offs, "_bkt timestamp, _off long")
    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.col("ts"), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pts.join(F.broadcast(off_df), "_bkt")
        .withColumn("level", (F.col("_off") + F.sum("delta").over(w)).cast("long"))
        .drop("_bkt", "_off")
    )
