"""Unit tests: backoff parity, cron parsing, batch status derivation."""

from datetime import datetime

import pytest

from goose_spark.functions import cron
from goose_spark.functions.backoff import default_retry_delay_sec, max_retries_exceeded
from goose_spark.schema import batch_status


def test_backoff_formula_parity():
    # 20 + rand(20)·(n+1) + n⁴  (src/goose/retry.clj:22-27)
    assert default_retry_delay_sec(0, lambda n: 0) == 20
    assert default_retry_delay_sec(0, lambda n: 19) == 20 + 19
    assert default_retry_delay_sec(2, lambda n: 5) == 20 + 5 * 3 + 16
    assert default_retry_delay_sec(10, lambda n: 0) == 20 + 10_000


def test_max_retries_boundary():
    # job executes max_retries + 1 times total (retry.clj:86-91 comment)
    assert not max_retries_exceeded(0, 1)
    assert max_retries_exceeded(1, 1)
    assert max_retries_exceeded(27, 27)


def test_batch_status_derivation():
    # src/goose/batch.clj:40-46
    assert batch_status(1, 0, 0, 0) == "in-progress"
    assert batch_status(0, 2, 1, 1) == "in-progress"
    assert batch_status(0, 0, 5, 0) == "success"
    assert batch_status(0, 0, 0, 5) == "dead"
    assert batch_status(0, 0, 3, 2) == "partial-success"


def test_cron_simple_next():
    s = cron.parse("*/5 * * * *")
    assert s.next_after(datetime(2026, 1, 1, 0, 0)) == datetime(2026, 1, 1, 0, 5)
    assert s.next_after(datetime(2026, 1, 1, 0, 4, 30)) == datetime(2026, 1, 1, 0, 5)


def test_cron_hourly_daily():
    assert cron.parse("0 * * * *").next_after(datetime(2026, 3, 1, 10, 30)) == datetime(2026, 3, 1, 11, 0)
    assert cron.parse("30 2 * * *").next_after(datetime(2026, 3, 1, 3, 0)) == datetime(2026, 3, 2, 2, 30)


def test_cron_weekday_rule():
    # 0 9 * * 1-5 → weekdays at 09:00; 2026-01-03 is a Saturday
    nxt = cron.parse("0 9 * * 1-5").next_after(datetime(2026, 1, 3, 10, 0))
    assert nxt == datetime(2026, 1, 5, 9, 0)  # Monday


def test_cron_dom_dow_or_rule():
    # both restricted → OR (standard cron): day 15 OR Sunday
    s = cron.parse("0 0 15 * 0")
    nxt = s.next_after(datetime(2026, 1, 12, 0, 0))  # Mon Jan 12
    assert nxt == datetime(2026, 1, 15, 0, 0)  # dom hits before Sunday 18th


def test_cron_month_boundary():
    assert cron.parse("0 0 1 * *").next_after(datetime(2026, 1, 31, 23, 59)) == datetime(2026, 2, 1, 0, 0)


def test_cron_prev_run():
    s = cron.parse("*/15 * * * *")
    assert s.prev_before(datetime(2026, 1, 1, 0, 44)) == datetime(2026, 1, 1, 0, 30)


def test_cron_timezone():
    # 09:00 US/Pacific == 17:00 UTC (PST, winter)
    nxt = cron.next_run("0 9 * * *", "US/Pacific", datetime(2026, 1, 10, 0, 0))
    assert nxt == datetime(2026, 1, 10, 17, 0)


def test_cron_validity():
    assert cron.valid("*/5 * * * *")
    assert cron.valid("0 9 * * 1-5")
    assert not cron.valid("not a cron")
    assert not cron.valid("61 * * * *")
    assert not cron.valid("* * * *")


def test_cron_boundary_one_ms():
    # due-time boundary parity (registry_test.clj:20-40): strictly-after
    s = cron.parse("0 * * * *")
    assert s.next_after(datetime(2026, 1, 1, 1, 0, 0)) == datetime(2026, 1, 1, 2, 0)


def test_cron_dst_boundaries_run_exactly_once():
    """DST semantics pinned (Vixie-cron-style): a schedule in the
    spring-forward gap still fires once (shifted +1h to the first
    existing instant); a fall-back schedule fires on the FIRST of the
    two wall-clock occurrences, not both."""
    from datetime import datetime

    from goose_spark.functions.cron import next_run

    # US 2026 spring forward: Mar 8, 02:00→03:00 America/New_York.
    # "30 2" does not exist that day; the run lands at 03:30 EDT = 07:30Z.
    spring = next_run("30 2 * * *", "America/New_York", datetime(2026, 3, 8, 5, 0))
    assert spring == datetime(2026, 3, 8, 7, 30)
    # and the day after, it is back to the normal 02:30 EDT = 06:30Z
    after = next_run("30 2 * * *", "America/New_York", spring)
    assert after == datetime(2026, 3, 9, 6, 30)

    # US 2026 fall back: Nov 1, 01:30 occurs twice (EDT then EST); the
    # engine fires the first (EDT = 05:30Z) and the NEXT run is the
    # following day, never the second occurrence
    fall = next_run("30 1 * * *", "America/New_York", datetime(2026, 11, 1, 4, 0))
    assert fall == datetime(2026, 11, 1, 5, 30)
    nxt = next_run("30 1 * * *", "America/New_York", fall)
    assert nxt == datetime(2026, 11, 2, 6, 30)
