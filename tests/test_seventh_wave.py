"""Round-11 seventh-wave operators: half-life decayed engagement (q98),
churn cohorts (q99), vocabulary-growth curve (tx20) — independent
driver-side recomputes and invariant checks beyond the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from goose_spark.queries import load_all
from goose_spark.queries.base import t
from tests.conftest import SF_CORRECT
import pytest

# excluded from the DEFAULT pytest run (pytest.ini deselects
# 'slowsuite' so 'python -m pytest tests/ -x -q' completes inside
# the grading driver's window — r15 directive 5); tools/partest.py
# and 'pytest -m ""' still run it
pytestmark = pytest.mark.slowsuite

REG = load_all()


def _events(spark):
    return t(spark, SF_CORRECT, "events").select(
        "user_id", "event_type", "value", "ts"
    ).collect()


def test_decayed_engagement_matches_python_recompute(spark):
    """Per-user scores recomputed with plain Python arithmetic — the
    exact power-of-two weights make both computations bit-identical, so
    the comparison is equality after the same 6/4-decimal rounding."""
    from decimal import ROUND_HALF_UP, Decimal

    rows = REG["q98_decayed_engagement"].builder(spark, SF_CORRECT).collect()
    ev = _events(spark)
    h = max(r["ts"].date() for r in ev)
    score: dict = {}
    count: dict = {}
    for r in ev:
        age = (h - r["ts"].date()).days
        base = r["value"] if r["event_type"] == "purchase" else r["value"] * 0.1
        c = Decimal(repr(base / (1 << min(age, 60)))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
        score[r["user_id"]] = score.get(r["user_id"], Decimal(0)) + c
        count[r["user_id"]] = count.get(r["user_id"], 0) + 1
    want = sorted(
        ((round(float(s), 4), uid) for uid, s in score.items()),
        key=lambda x: (-x[0], x[1]),
    )[:100]
    got = [(r["score"], r["user_id"]) for r in rows]
    assert got == want
    for r in rows:
        assert r["n_events"] == count[r["user_id"]]
        assert r["freshest_d"] >= 0


def test_decayed_engagement_recency_dominates(spark):
    """A user's score is bounded by sum(value)/2^freshest — stale users
    cannot outrank fresh ones with comparable volume (the operator's
    point)."""
    rows = REG["q98_decayed_engagement"].builder(spark, SF_CORRECT).collect()
    assert rows and rows[0]["score"] >= rows[-1]["score"]
    # every reported user has at least one recent event: with a 1-day
    # half-life, anyone >20 days stale needs 2^20x the value to chart
    assert all(r["freshest_d"] <= 20 for r in rows)


def test_churn_cohorts_partition_the_user_base(spark):
    rows = REG["q99_churn_cohorts"].builder(spark, SF_CORRECT).collect()
    n_users = t(spark, SF_CORRECT, "events").select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users  # grid is a partition
    assert sum(r["n_events"] for r in rows) == t(spark, SF_CORRECT, "events").count()
    assert {r["lifecycle"] for r in rows} <= {"active", "lapsing", "churned"}
    assert {r["spend_tier"] for r in rows} <= {"casual", "regular", "whale"}
    assert len({(r["lifecycle"], r["spend_tier"]) for r in rows}) == len(rows)
    # the grid must actually split this data (degenerate 1-cell grids
    # hash-match trivially and test nothing)
    assert len(rows) >= 4
    for r in rows:
        assert r["events_per_user"] == r["n_events"] // r["n_users"]


def test_churn_cohorts_ltv_total(spark):
    """Cohort LTVs sum to total purchase value (rounded per-event the
    same way)."""
    rows = REG["q99_churn_cohorts"].builder(spark, SF_CORRECT).collect()
    total = (
        t(spark, SF_CORRECT, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.round("value", 6).cast("decimal(18,6)")).alias("s"))
        .collect()[0]["s"]
    )
    assert abs(sum(r["cohort_ltv"] for r in rows) - float(total)) < 1e-3


def test_vocab_growth_curve_invariants(spark):
    """Deciles cover the corpus; cumulative columns are non-decreasing;
    the final checkpoint equals the exact corpus-wide counts."""
    rows = REG["tx20_vocab_growth"].builder(spark, SF_CORRECT).collect()
    assert [r["pct"] for r in rows] == list(range(10, 101, 10))
    d = t(spark, SF_CORRECT, "documents")
    tok = d.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    assert rows[-1]["n_docs"] == d.count()
    assert rows[-1]["n_tokens"] == tok.count()
    assert rows[-1]["n_types"] == tok.distinct().count()
    assert sum(r["new_types"] for r in rows) == rows[-1]["n_types"]
    for a, b in zip(rows, rows[1:]):
        assert b["n_docs"] > a["n_docs"]
        assert b["n_tokens"] > a["n_tokens"]
        assert b["n_types"] >= a["n_types"]
        # a closed vocabulary means TTR must fall as tokens accumulate
        assert b["ttr"] <= a["ttr"]


def test_vocab_growth_first_occurrence_plan_no_nested_loop(spark):
    """The curve is computed by bucket arithmetic + a 10-row window —
    never an inequality join. The only BroadcastNestedLoopJoin nodes
    allowed are the 1-row scalar (max doc_id) broadcasts, the same
    convention test_plans_and_io pins repo-wide; the decile joins
    themselves must be hash equi-joins."""
    from goose_spark.plans.inspect import physical_plan

    plan = physical_plan(REG["tx20_vocab_growth"].builder(spark, SF_CORRECT))
    assert "CartesianProduct" not in plan.replace("BroadcastNestedLoopJoin", "")
    # the three decile-bucket joins are hash joins on b
    assert plan.count("BroadcastHashJoin") >= 2
