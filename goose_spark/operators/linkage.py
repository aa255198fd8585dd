"""Entity-resolution / record-linkage blocking (north-star extension).

Fuzzy-matching identifiers at corpus scale is an all-pairs problem
unless the match predicate itself yields a lossless blocking scheme.
For fixed-width keys under a Hamming / edit-distance-1 predicate the
multi-part pigeonhole does exactly that (the table layout Manku et al.
2007 use for simhash dup detection, and the partition scheme of
PassJoin, Li et al. 2011): split the P positions into ``n_parts``
interleaved parts — two strings within Hamming distance d must agree
EXACTLY on at least ``n_parts - d`` parts, so equi-joining on every
(n_parts - d)-subset of parts produces a candidate set that provably
contains every true pair. Each join is a plain hash equi-join on a
composite key; nothing is ever compared all-pairs, and the part count
is the skew lever (more parts → more joins on longer, more selective
keys).

Spark shape: ``k`` equi-joins (k = C(n_parts, n_parts-d)) unioned, then
one cheap ``levenshtein`` verify on the bounded candidate set — on the
WINDOWED substring, the same characters the blocks are built from. For
equal-length strings levenshtein ≤ 1 ⟺ Hamming ≤ 1, so the verify is
exact. No ``distinct`` is needed after the union for d=1: a window
distance-1 pair differs in exactly one position, hence exactly one
part, hence its clean parts form exactly one blocking subset; window
distance-0 pairs (clean on every part, so they match every subset) are
claimed by branch 0 alone via a window-inequality filter on the other
branches — every true pair is emitted exactly once even on
duplicate-heavy inputs and windows that don't span the whole string
(tested).

Reference analog: none (goose has no fuzzy matching); this is the
LLM-pipeline identity-dedup shape (user ids, URLs, near-identical
titles).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goose_spark.queries.base import register, t


def _interleaved_parts(offset: int, length: int, n_parts: int) -> list[list[int]]:
    """1-based substr positions [offset, offset+length) dealt round-robin
    into n_parts groups — interleaving spreads low-entropy positions
    (constant prefixes, zero padding) across every part."""
    positions = list(range(offset, offset + length))
    return [positions[i::n_parts] for i in range(n_parts)]


def _part_col(col, positions: list[int]):
    return F.concat(*[F.substring(col, p, 1) for p in positions])


def hamming_pairs(
    df: DataFrame,
    id_col: str,
    s_col: str,
    offset: int,
    length: int,
    n_parts: int = 3,
    max_dist: int = 1,
) -> DataFrame:
    """All pairs of rows whose ``s_col`` values (equal-width, compared on
    the window [offset, offset+length), 1-based) are within levenshtein
    ``max_dist``. Returns (a_id, a_s, b_id, b_s, dist) with a_id < b_id;
    ``dist`` is measured on the WINDOW, matching the blocking scheme —
    characters outside [offset, offset+length) never affect membership
    or distance. (Verifying the full string against window-only blocks
    would both change the predicate and break the emitted-exactly-once
    property: a pair equal inside the window but differing outside is
    clean on every part, so it matches every blocking subset.)

    Lossless by the pigeonhole argument above; every join is bounded by
    the part-key block sizes, never |df|².
    """
    if n_parts <= max_dist:
        raise ValueError("need n_parts > max_dist for a non-trivial block")
    parts = _interleaved_parts(offset, length, n_parts)
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.col(s_col).alias("_s"),
        F.substring(F.col(s_col), offset, length).alias("_w"),
        *[_part_col(F.col(s_col), p).alias(f"_p{i}") for i, p in enumerate(parts)],
    )
    # The verify work lives on the PROBE side of each block join —
    # spread it across every core (a parquet dim table often arrives as
    # 1-3 input splits, which would serialize the levenshtein
    # verification into as few tasks). The partition count is explicit
    # because AQE would otherwise coalesce this ~MB shuffle down to one
    # task — partition sizing by BYTES is exactly wrong for a join
    # whose cost is candidate-pair compute, not input volume. The build
    # side is deliberately NOT hint-broadcast: an explicit broadcast()
    # is never overridden, so it would force a corpus-sized table into
    # every executor at scale — the planner auto-broadcasts under the
    # threshold and swaps to a shuffled join on the composite part
    # keys beyond it.
    n_slots = df.sparkSession.sparkContext.defaultParallelism
    probe = keyed.repartition(2 * n_slots, F.col("_id"))
    branches = []
    for j, subset in enumerate(combinations(range(n_parts), n_parts - max_dist)):
        a = probe.alias("a")
        b = keyed.alias("b")
        cond = F.col("a._id") < F.col("b._id")
        for i in subset:
            cond = cond & (F.col(f"a._p{i}") == F.col(f"b._p{i}"))
        if j > 0:
            # window-equal strings are clean on EVERY part, so they
            # would match every blocking subset — claim them for branch
            # 0 alone (an inequality filter on the WINDOW, no dedup
            # shuffle). A pair with d≥1 window edits is unaffected: its
            # windows differ. Comparing full strings here would leak
            # duplicates for pairs that differ only outside the window.
            cond = cond & (F.col("a._w") != F.col("b._w"))
        branches.append(
            a.join(b, cond).select(
                F.col("a._id").alias("a_id"),
                F.col("a._s").alias("a_s"),
                F.col("b._id").alias("b_id"),
                F.col("b._s").alias("b_s"),
                F.col("a._w").alias("_aw"),
                F.col("b._w").alias("_bw"),
            )
        )
    cand = branches[0]
    for br in branches[1:]:
        cand = cand.unionAll(br)
    if max_dist > 1:
        # a pair with <= max_dist edits can have several clean subsets
        cand = cand.distinct()
    return (
        cand.withColumn("dist", F.levenshtein("_aw", "_bw"))
        .filter(F.col("dist") <= max_dist)
        .drop("_aw", "_bw")
    )


# --------------------------------------------------------------------------
# q86 — fuzzy name pairs over customer (9-digit payload, 3 parts, d=1)
# --------------------------------------------------------------------------

_OFF, _LEN, _NP = 10, 9, 3  # c_name = 'Customer#' + 9 digits → positions 10..18

_PARTS = _interleaved_parts(_OFF, _LEN, _NP)


def _part_sql(alias: str, positions: list[int]) -> str:
    return " || ".join(f"substr({alias}, {p}, 1)" for p in positions)


def _q86_oracle() -> str:
    part_defs = ", ".join(
        f"{_part_sql('c_name', p)} AS p{i}" for i, p in enumerate(_PARTS)
    )
    joins = []
    for subset in combinations(range(_NP), _NP - 1):
        on = " AND ".join(f"a.p{i} = b.p{i}" for i in subset)
        joins.append(
            f"SELECT a.c_name AS an, b.c_name AS bn FROM p a JOIN p b "
            f"ON {on} AND a.c_custkey < b.c_custkey"
        )
    cand = " UNION ALL ".join(joins)
    pos_case = " ".join(
        f"WHEN substr(an, {p}, 1) <> substr(bn, {p}, 1) THEN {p - _OFF + 1}"
        for p in range(_OFF, _OFF + _LEN - 1)
    )
    return f"""
WITH p AS (SELECT c_custkey, c_name, {part_defs} FROM customer),
cand AS ({cand}),
ver AS (SELECT an, bn FROM cand WHERE levenshtein(an, bn) <= 1)
SELECT CASE {pos_case} ELSE {_LEN} END AS pos,
       COUNT(*) AS n_pairs, MIN(an) AS first_a, MAX(bn) AS last_b
FROM ver GROUP BY 1 ORDER BY pos"""


@register(
    "q86_fuzzy_name_pairs",
    _q86_oracle(),
    doc="Record-linkage blocked fuzzy self-join: all customer-name pairs "
        "within edit distance 1, found via the Hamming pigeonhole (Manku "
        "et al. 2007 / PassJoin): the 9-digit payload splits into 3 "
        "interleaved parts, a distance-1 pair must agree exactly on 2 of "
        "them, so 3 composite-key equi-joins + a levenshtein verify "
        "replace the all-pairs scan; each verified pair is emitted by "
        "exactly one join branch (no distinct). Output: pair counts per "
        "differing digit position. At 100 TB the part count is the "
        "selectivity/skew lever — longer composite keys shrink blocks.",
    tags=("llm", "linkage"),
)
def q86(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    pairs = hamming_pairs(
        c, "c_custkey", "c_name", _OFF, _LEN, n_parts=_NP, max_dist=1
    )
    pos = F.lit(None).cast("int")
    for p in range(_OFF + _LEN - 2, _OFF - 1, -1):
        pos = F.when(
            F.substring("a_s", p, 1) != F.substring("b_s", p, 1), p - _OFF + 1
        ).otherwise(pos)
    pos = F.coalesce(pos, F.lit(_LEN))
    return (
        pairs.select(pos.alias("pos"), "a_s", "b_s")
        .groupBy("pos")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("a_s").alias("first_a"),
            F.max("b_s").alias("last_b"),
        )
        .orderBy("pos")
    )
