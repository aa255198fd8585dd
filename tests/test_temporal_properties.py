"""Property-based cross-checks for the temporal operators against
independent reference implementations: pandas merge_asof for the as-of
join, O(n²) pair enumeration for the banded join, a pure-python sweep
for interval concurrency. Few examples, each a real Spark round-trip."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from goose_spark.operators.asof import asof_join
from goose_spark.operators.intervals import banded_join, interval_concurrency

BASE = dt.datetime(2024, 3, 1)


def _ts(sec):
    return BASE + dt.timedelta(seconds=int(sec))


# unique right timestamps per key: pandas merge_asof tie-breaks among
# duplicate right ts by input order, which no engine contract pins
rights = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 5000)),
    min_size=1, max_size=25, unique_by=lambda t: (t[0], t[1]),
)
lefts = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 5000)),
    min_size=1, max_size=25,
)


@given(lefts, rights, st.sampled_from(["backward", "forward"]))
@settings(max_examples=6, deadline=None)
def test_asof_matches_pandas_merge_asof(spark, lrows, rrows, direction):
    left = spark.createDataFrame(
        [(k, _ts(s), i) for i, (k, s) in enumerate(lrows)],
        "k int, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [(k, _ts(s), 1000 + i) for i, (k, s) in enumerate(rrows)],
        "k int, ts timestamp, rid int",
    )
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(left, right, on="k", direction=direction).collect()
    }
    lp = pd.DataFrame(
        [(k, _ts(s), i) for i, (k, s) in enumerate(lrows)],
        columns=["k", "ts", "lid"],
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        [(k, _ts(s), 1000 + i) for i, (k, s) in enumerate(rrows)],
        columns=["k", "ts", "rid"],
    ).sort_values("ts", kind="stable")
    ref = pd.merge_asof(lp, rp, on="ts", by="k", direction=direction)
    want = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in ref.itertuples()
    }
    assert got == want


@given(lefts, rights, st.integers(1, 600))
@settings(max_examples=6, deadline=None)
def test_banded_join_matches_pair_enumeration(spark, lrows, rrows, band):
    left = spark.createDataFrame(
        [(i, _ts(s)) for i, (_, s) in enumerate(lrows)], "lid int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1000 + i, _ts(s)) for i, (_, s) in enumerate(rrows)],
        "rid int, ts timestamp",
    )
    got = sorted(
        (r["lid"], r["rid"]) for r in banded_join(left, right, band_sec=band).collect()
    )
    want = sorted(
        (i, 1000 + j)
        for i, (_, ls) in enumerate(lrows)
        for j, (_, rs) in enumerate(rrows)
        if abs(ls - rs) <= band
    )
    assert got == want


intervals = st.lists(
    st.tuples(st.integers(0, 200), st.integers(0, 60)),
    min_size=1, max_size=30,
)


@given(intervals)
@settings(max_examples=6, deadline=None)
def test_concurrency_matches_pure_sweep(spark, ivs):
    rows = [(_ts(s * 3600), _ts((s + d) * 3600 + 1)) for s, d in ivs]
    df = spark.createDataFrame(rows, "start timestamp, end timestamp")
    got = {}
    for r in interval_concurrency(df, spark).collect():
        day = r["ts"].strftime("%Y-%m-%d")
        got[day] = max(got.get(day, -(10 ** 9)), r["level"])
    pts = sorted(
        [(s, 1) for s, _ in rows] + [(e, -1) for _, e in rows],
        key=lambda p: (p[0], -p[1]),
    )
    want, lvl = {}, 0
    for ts, d in pts:
        lvl += d
        day = ts.strftime("%Y-%m-%d")
        want[day] = max(want.get(day, -(10 ** 9)), lvl)
    assert got == want
