"""Z-order (Morton-curve) data layout — the multi-dimensional file
clustering trick behind Delta OPTIMIZE ZORDER / Iceberg sort orders.

Parquet scans prune at file/row-group granularity from footer min/max
stats. A table sorted by ONE column prunes filters on that column only;
interleaving the bits of N columns into one sort key makes every file's
bounding box tight in ALL N dimensions, so a conjunctive range filter
skips most files no matter which dimension it constrains. At 100 TB
this is a layout decision, not a query decision: cluster once on write,
every subsequent scan prunes for free.

Everything stays JVM-side whole-stage-codegen: the z-value is a pure
bit-arithmetic expression (no UDF), normalization is exact integer
arithmetic (``(x - min) * (2^bits - 1) DIV span`` — never a double, so
bucket boundaries are engine-portable), and the cluster step is one
``repartitionByRange`` on the z-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from goose_spark.queries.base import register, t

ZBITS = 12  # per-dimension resolution: 2^12 cells per axis


def _norm_expr(col: str, lo, hi, bits: int, dialect: str) -> str:
    """Exact integer normalization of ``col`` into [0, 2^bits):
    ``((col - lo) * (2^bits - 1)) DIV max(span, 1)``. Same arithmetic in
    Spark SQL (``DIV``) and DuckDB (``//``) — both are exact int64
    floor-division, so the two engines bucket identically. ``lo``/``hi``
    may be int literals or SQL sub-expressions (strings)."""
    top = (1 << bits) - 1
    div = "DIV" if dialect == "spark" else "//"
    if isinstance(lo, int) and isinstance(hi, int):
        span = max(hi - lo, 1)
    else:
        span = f"GREATEST(({hi}) - ({lo}), 1)"
    return f"(CAST((({col} - ({lo})) * {top}) AS BIGINT) {div} ({span}))"


def zvalue_sql(cols: list[tuple[str, int, int]], bits: int = ZBITS,
               dialect: str = "spark") -> str:
    """SQL expression string for the Morton interleave of ``cols``
    (each a ``(name, min, max)`` triple). Dimension 0 owns the highest
    bit of each group. Unrolled shift-and-mask terms land on disjoint
    bits, so ``+`` assembles the key exactly in both dialects
    (Spark: ``shiftleft()/shiftright()/&``; DuckDB: ``<< >> &``)."""
    n = len(cols)
    terms = []
    for d, (name, lo, hi) in enumerate(cols):
        nx = _norm_expr(name, lo, hi, bits, dialect)
        for i in range(bits):
            out_bit = i * n + (n - 1 - d)
            if dialect == "spark":
                terms.append(
                    f"shiftleft(shiftright({nx}, {i}) & 1, {out_bit})"
                )
            else:
                terms.append(f"((({nx} >> {i}) & 1) << {out_bit})")
    return "(" + " + ".join(terms) + ")"


def _bounds(df: DataFrame, cols: list[str]) -> list[tuple[str, int, int]]:
    """One O(1)-result agg pass for the per-column min/max the
    normalization needs (the only driver traffic in the operator)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    return [(c, int(row[f"_lo_{c}"]), int(row[f"_hi_{c}"])) for c in cols]


def cluster_by_zorder(df: DataFrame, cols: list[str], bits: int = ZBITS,
                      num_files: int = 8) -> DataFrame:
    """Return ``df`` re-laid-out along the Morton curve of ``cols``:
    range-partitioned into ``num_files`` z-ranges and sorted within
    each, ready for a partitioned/bucketed write. Range partitioning
    (not hash) is what makes each output file a contiguous curve
    segment — i.e. a tight N-dimensional bounding box."""
    z = F.expr(zvalue_sql(_bounds(df, cols), bits, "spark")).alias("_z")
    return (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


# --- registry query --------------------------------------------------------

_ZCOLS = ["l_partkey", "l_suppkey"]


def _q77_oracle() -> str:
    cols = [
        (c, f"(SELECT MIN({c}) FROM lineitem)", f"(SELECT MAX({c}) FROM lineitem)")
        for c in _ZCOLS
    ]
    zexpr = zvalue_sql(cols, ZBITS, "duck")
    shift = 2 * ZBITS - 4
    return f"""WITH z AS (SELECT {zexpr} AS zv FROM lineitem)
       SELECT CAST(zv >> {shift} AS BIGINT) AS quadrant, COUNT(*) AS n,
              MIN(zv) AS min_z, MAX(zv) AS max_z
       FROM z GROUP BY quadrant ORDER BY quadrant"""


@register(
    "q77_zorder_quadrants",
    _q77_oracle(),
    doc="Morton z-curve layout key over (l_partkey, l_suppkey), "
        "histogrammed by top-level curve quadrant. The z-value is the "
        "clustering key cluster_by_zorder lays files out on; computing "
        "it as an oracled query pins the bit-interleave arithmetic "
        "engine-portably (exact int64 normalization — DIV vs // — then "
        "unrolled shift-and-mask terms on disjoint bits). Pure "
        "whole-stage-codegen expression work over one scan + one "
        "16-group agg: a corpus-scan shape at any scale. The layout "
        "payoff (file-footer min/max pruning in BOTH dimensions) is "
        "asserted by tests/test_layout.py on real written files.",
)
def q77(spark, sf: str):
    li = t(spark, sf, "lineitem")
    zv = F.expr(zvalue_sql(_bounds(li, _ZCOLS), ZBITS, "spark"))
    shift = 2 * ZBITS - 4
    return (
        li.select(zv.alias("zv"))
        .groupBy(F.shiftright("zv", shift).cast("bigint").alias("quadrant"))
        .agg(
            F.count("*").alias("n"),
            F.min("zv").alias("min_z"),
            F.max("zv").alias("max_z"),
        )
        .orderBy("quadrant")
    )
