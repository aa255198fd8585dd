"""SQL-callable forms of the temporal operators (round-8 directive):
:mod:`operators/asof`, :mod:`operators/intervals` are DataFrame
functions; this module emits the SAME scalable silhouettes as pure
Spark-SQL text over registered views, so a ``spark.sql``-only consumer
(the `goose_spark.sql.register_views` surface) can run them without
touching the Python DataFrame API.

Each generator introspects the input views' schemas (for column fan-out
and NULL typing) and returns one SQL string whose PLAN matches the
DataFrame twin: union + one key shuffle + running last() for as-of;
bucket-explode + hash equi-join for the banded and interval-overlap
joins — never an inequality join Catalyst would plan as a nested loop.
Parity with the DataFrame forms is pinned in tests/test_temporal_sql.py
(same inputs → identical rows).

``register_*_view`` helpers execute the SQL and register the result, so
downstream SQL composes over it like any table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _q(name: str) -> str:
    return f"`{name}`"


def asof_join_sql(spark: SparkSession, left_view: str, right_view: str,
                  on: str | list[str], left_ts: str = "ts",
                  right_ts: str = "ts", right_cols: list[str] | None = None,
                  direction: str = "backward", suffix: str = "_right") -> str:
    """SQL text equivalent of ``asof.asof_join`` (same semantics incl.
    the inclusive tie contract, NULL-ts filtering, and the
    ``xxhash64(_rpack)`` deterministic tie-break)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left, right = spark.table(left_view), spark.table(right_view)
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    if right_ts not in right_cols:
        right_cols = [right_ts] + right_cols

    right_tag = 0 if direction == "backward" else 2
    lcols = list(left.columns)
    nonkey = [c for c in lcols if c not in keys]
    ltypes = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    pack = ", ".join(f"'{c}', {_q(c)}" for c in right_cols)
    l_branch = (
        f"SELECT {', '.join(_q(c) for c in lcols)}, "
        f"{_q(left_ts)} AS _ats, 1 AS _side, NULL AS _rpack "
        f"FROM {_q(left_view)}"
    )
    r_nulls = ", ".join(
        f"CAST(NULL AS {ltypes[c]}) AS {_q(c)}" for c in nonkey
    )
    r_branch = (
        f"SELECT {', '.join(_q(k) for k in keys)}"
        + (f", {r_nulls}" if r_nulls else "")
        + f", {_q(right_ts)} AS _ats, {right_tag} AS _side, "
        f"named_struct({pack}) AS _rpack "
        f"FROM {_q(right_view)} WHERE {_q(right_ts)} IS NOT NULL"
    )
    part = ", ".join(_q(k) for k in keys)
    if direction == "backward":
        carried = (
            f"last(_rpack, true) OVER (PARTITION BY {part} "
            f"ORDER BY _ats, _side, xxhash64(_rpack) "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
    else:
        carried = (
            f"first(_rpack, true) OVER (PARTITION BY {part} "
            f"ORDER BY _ats, _side, xxhash64(_rpack) "
            f"ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
        )
    taken = set(lcols)
    out = [f"{_q(c)}" for c in lcols]
    for c in right_cols:
        name = c + suffix if c in taken else c
        out.append(f"_m.{_q(c)} AS {_q(name)}")
    return (
        f"WITH _u AS ({l_branch} UNION ALL {r_branch}),\n"
        f"_w AS (SELECT *, CASE WHEN _ats IS NOT NULL THEN {carried} END AS _m FROM _u)\n"
        f"SELECT {', '.join(out)} FROM _w WHERE _side = 1"
    )


def banded_join_sql(spark: SparkSession, left_view: str, right_view: str,
                    band_sec: int, left_ts: str = "ts",
                    right_ts: str = "ts") -> str:
    """SQL text equivalent of ``intervals.banded_join``: right rows own
    ONE floor(epoch/band) bucket, left rows explode into the 3 adjacent
    buckets, equi-join on the bucket id + exact |Δ| ≤ band filter."""
    left, right = spark.table(left_view), spark.table(right_view)
    band_us = band_sec * 1_000_000
    lb = f"floor(unix_micros({_q(left_ts)}) / {band_us})"
    renames = {c: c + "_r" for c in right.columns if c in left.columns}
    rsel = ", ".join(
        f"{_q(c)} AS {_q(renames[c])}" if c in renames else _q(c)
        for c in right.columns
    )
    out = [_q(c) for c in left.columns] + [
        _q(renames.get(c, c)) for c in right.columns
    ]
    return (
        f"WITH _lt AS (\n"
        f"  SELECT {', '.join(_q(c) for c in left.columns)}, "
        f"unix_micros({_q(left_ts)}) AS _lus, _bkt\n"
        f"  FROM {_q(left_view)}\n"
        f"  LATERAL VIEW explode(array({lb} - 1, {lb}, {lb} + 1)) _t AS _bkt\n"
        f"  WHERE {_q(left_ts)} IS NOT NULL),\n"
        f"_rt AS (\n"
        f"  SELECT {rsel}, unix_micros({_q(right_ts)}) AS _rus, "
        f"floor(unix_micros({_q(right_ts)}) / {band_us}) AS _bkt\n"
        f"  FROM {_q(right_view)} WHERE {_q(right_ts)} IS NOT NULL)\n"
        f"SELECT {', '.join(out)} FROM _lt JOIN _rt USING (_bkt)\n"
        f"WHERE abs(_lus - _rus) <= {band_us}"
    )


def interval_overlap_join_sql(spark: SparkSession, a_view: str, b_view: str,
                              bucket_sec: int,
                              a_start: str = "start", a_end: str = "end",
                              b_start: str = "start", b_end: str = "end") -> str:
    """SQL text equivalent of ``intervals.interval_overlap_join``
    (salt=1 form — the salt lever stays on the DataFrame side): both
    sides explode over spanned buckets, equi-join on the bucket, and the
    max-start-bucket guard keeps each overlapping pair exactly once."""
    a, b = spark.table(a_view), spark.table(b_view)
    bus = bucket_sec * 1_000_000

    def prep(view, df, s, e, tag):
        su = f"unix_micros({_q(s)})"
        eu = f"unix_micros({_q(e)})"
        cols = ", ".join(f"{_q(c)} AS {_q(c + '_' + tag)}" for c in df.columns)
        return (
            f"SELECT {cols}, {su} AS _s_{tag}, {eu} AS _e_{tag}, _bkt\n"
            f"  FROM {_q(view)}\n"
            f"  LATERAL VIEW explode(sequence(floor({su} / {bus}), "
            f"floor({eu} / {bus}))) _t AS _bkt\n"
            f"  WHERE {_q(s)} IS NOT NULL AND {_q(e)} IS NOT NULL"
        )

    out = [f"{_q(c + '_a')}" for c in a.columns] + [f"{_q(c + '_b')}" for c in b.columns]
    return (
        f"WITH _pa AS ({prep(a_view, a, a_start, a_end, 'a')}),\n"
        f"_pb AS ({prep(b_view, b, b_start, b_end, 'b')})\n"
        f"SELECT {', '.join(out)} FROM _pa JOIN _pb USING (_bkt)\n"
        f"WHERE _s_a <= _e_b AND _s_b <= _e_a\n"
        f"  AND _bkt = floor(greatest(_s_a, _s_b) / {bus})"
    )


def register_asof_view(spark: SparkSession, out_view: str, *args, **kwargs) -> DataFrame:
    df = spark.sql(asof_join_sql(spark, *args, **kwargs))
    df.createOrReplaceTempView(out_view)
    return df


def register_banded_view(spark: SparkSession, out_view: str, *args, **kwargs) -> DataFrame:
    df = spark.sql(banded_join_sql(spark, *args, **kwargs))
    df.createOrReplaceTempView(out_view)
    return df


def register_overlap_view(spark: SparkSession, out_view: str, *args, **kwargs) -> DataFrame:
    df = spark.sql(interval_overlap_join_sql(spark, *args, **kwargs))
    df.createOrReplaceTempView(out_view)
    return df
