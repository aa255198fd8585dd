"""asof_join operator edge cases (q73 covers the oracle parity; these
pin the semantic corners DuckDB comparison can't isolate)."""

from __future__ import annotations

from datetime import datetime

from goose_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _left(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "L1"),
            (1, _ts("2024-01-01 12:00:00"), "L2"),
            (2, _ts("2024-01-01 09:00:00"), "L3"),  # no prior right row
        ],
        "k int, ts timestamp, lv string",
    )


def _right(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), "R-early", None),
            (1, _ts("2024-01-01 10:00:00"), "R-tie", 7),   # ties with L1
            (1, _ts("2024-01-01 11:00:00"), "R-mid", None),  # null payload col
            (2, _ts("2024-01-01 11:30:00"), "R-late", 9),
        ],
        "k int, ts timestamp, rv string, extra int",
    )


def test_backward_latest_at_or_before(spark):
    out = {
        r["lv"]: (r["rv"], r["extra"], r["ts_right"])
        for r in asof_join(_left(spark), _right(spark), on="k").collect()
    }
    # tie at 10:00 is INCLUSIVE (DuckDB l.ts >= r.ts contract)
    assert out["L1"][0] == "R-tie" and out["L1"][1] == 7
    # latest preceding row wins, and its null payload column stays null
    # (struct packing: all carried values come from the SAME right row)
    assert out["L2"][0] == "R-mid" and out["L2"][1] is None
    # no qualifying right row → left-join nulls
    assert out["L3"] == (None, None, None)


def test_forward_earliest_at_or_after(spark):
    out = {
        r["lv"]: r["rv"]
        for r in asof_join(
            _left(spark), _right(spark), on="k", direction="forward"
        ).collect()
    }
    assert out["L1"] == "R-tie"   # inclusive at equal ts
    assert out["L2"] is None      # nothing after 12:00 for k=1
    assert out["L3"] == "R-late"


def test_null_timestamps_never_match(spark):
    """merge_asof/DuckDB contract: a NULL timestamp on either side
    participates in no match — without the guards, null right rows sort
    first and become phantom matches for every left row (backward), and
    a null left row adopts the earliest right row (forward)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "L1"), (1, None, "L-null")],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, None, "R-null"), (1, _ts("2024-01-01 09:00:00"), "R-ok")],
        "k int, ts timestamp, rv string",
    )
    for direction in ("backward", "forward"):
        out = {
            r["lv"]: r["rv"]
            for r in asof_join(left, right, on="k", direction=direction).collect()
        }
        assert out["L-null"] is None, direction
        assert out["L1"] != "R-null", direction
    back = {
        r["lv"]: r["rv"] for r in asof_join(left, right, on="k").collect()
    }
    assert back["L1"] == "R-ok"


def test_single_shuffle_plan(spark):
    """The formulation's point: ONE hash exchange on the key (plus the
    union), never a range-join candidate explosion."""
    from goose_spark.plans.inspect import report

    r = report(asof_join(_left(spark), _right(spark), on="k"))
    assert r.shuffles <= 1, r.text
    assert "CartesianProduct" not in r.text
