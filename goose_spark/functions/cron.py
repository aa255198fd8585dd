"""UNIX cron parsing — next/previous occurrence computation.

The reference delegates to the cron-utils JVM library
(``src/goose/cron/parsing.clj:11-48``: ``next-run-epoch-ms`` /
``previous-run-epoch-ms`` with an IANA timezone). croniter is not
available in this environment, so this is a small self-contained
5-field UNIX cron engine supporting ``*``, lists, ranges, steps and
the standard day-of-month/day-of-week OR rule.

Fields: minute hour day-of-month month day-of-week (0-6, 0=Sunday;
7 normalized to 0).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta
from zoneinfo import ZoneInfo

_BOUNDS = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 6)]


def _parse_field(spec: str, lo: int, hi: int, is_dow: bool) -> frozenset[int]:
    vals: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ValueError(f"invalid step {step}")
        if part == "*" or part == "":
            rng = range(lo, hi + 1)
        elif "-" in part:
            a, b = part.split("-", 1)
            a, b = int(a), int(b)
            if is_dow:
                a, b = a % 7, b % 7
            if a > b:
                raise ValueError(f"inverted range {part}")
            rng = range(a, b + 1)
        else:
            v = int(part)
            if is_dow:
                v = v % 7
            rng = range(v, v + 1)
        for v in rng[::step] if step > 1 else rng:
            if not (lo <= v <= hi):
                raise ValueError(f"value {v} out of bounds [{lo},{hi}]")
            vals.add(v)
    if not vals:
        raise ValueError("empty field")
    return frozenset(vals)


@dataclass(frozen=True)
class CronSchedule:
    minutes: frozenset[int]
    hours: frozenset[int]
    doms: frozenset[int]
    months: frozenset[int]
    dows: frozenset[int]
    dom_star: bool
    dow_star: bool

    def _day_matches(self, dt: datetime) -> bool:
        # standard cron rule: if both dom and dow are restricted, match EITHER
        dom_ok = dt.day in self.doms
        dow_ok = ((dt.weekday() + 1) % 7) in self.dows  # python Mon=0 → cron Sun=0
        if self.dom_star and self.dow_star:
            return True
        if self.dom_star:
            return dow_ok
        if self.dow_star:
            return dom_ok
        return dom_ok or dow_ok

    def _matches(self, dt: datetime) -> bool:
        return (
            dt.minute in self.minutes
            and dt.hour in self.hours
            and dt.month in self.months
            and self._day_matches(dt)
        )

    def next_after(self, dt: datetime) -> datetime:
        """First occurrence strictly after ``dt`` (minute resolution)."""
        cur = dt.replace(second=0, microsecond=0) + timedelta(minutes=1)
        for _ in range(366 * 24 * 60):  # ≥1 year scan bound
            if cur.month not in self.months:
                # jump to the 1st of the next month
                if cur.month == 12:
                    cur = cur.replace(year=cur.year + 1, month=1, day=1, hour=0, minute=0)
                else:
                    cur = cur.replace(month=cur.month + 1, day=1, hour=0, minute=0)
                continue
            if not self._day_matches(cur):
                cur = (cur + timedelta(days=1)).replace(hour=0, minute=0)
                continue
            if cur.hour not in self.hours:
                cur = (cur + timedelta(hours=1)).replace(minute=0)
                continue
            if cur.minute not in self.minutes:
                cur = cur + timedelta(minutes=1)
                continue
            return cur
        raise ValueError("no occurrence within a year")

    def prev_before(self, dt: datetime) -> datetime:
        """Last occurrence at or before ``dt`` (used for single-run
        backfill — parity with goose's 'backfill exactly 1 missed run',
        architecture-decisions/pages/cron-jobs.md)."""
        cur = dt.replace(second=0, microsecond=0)
        for _ in range(366 * 24 * 60):
            if cur.month not in self.months:
                prev_month_last = cur.replace(day=1) - timedelta(days=1)
                cur = prev_month_last.replace(hour=23, minute=59)
                continue
            if not self._day_matches(cur):
                cur = (cur - timedelta(days=1)).replace(hour=23, minute=59)
                continue
            if cur.hour not in self.hours:
                cur = (cur - timedelta(hours=1)).replace(minute=59)
                continue
            if cur.minute not in self.minutes:
                cur = cur - timedelta(minutes=1)
                continue
            return cur
        raise ValueError("no occurrence within a year")


def parse(expr: str) -> CronSchedule:
    parts = expr.split()
    if len(parts) != 5:
        raise ValueError(f"cron expression must have 5 fields: {expr!r}")
    fields = []
    for spec, (lo, hi), is_dow in zip(parts, _BOUNDS, [False, False, False, False, True]):
        fields.append(_parse_field(spec, lo, hi, is_dow))
    return CronSchedule(
        minutes=fields[0],
        hours=fields[1],
        doms=fields[2],
        months=fields[3],
        dows=fields[4],
        dom_star=parts[2] == "*",
        dow_star=parts[4] == "*",
    )


def valid(expr: str) -> bool:
    """Registration-time validity gate — parity with
    ``src/goose/specs.clj:104`` via ``src/goose/cron/parsing.clj:23-29``."""
    try:
        parse(expr)
        return True
    except (ValueError, IndexError):
        return False


def next_run(expr: str, tz: str, after_utc: datetime) -> datetime:
    """Next occurrence in UTC (naive), evaluated in the entry's timezone —
    parity with ``src/goose/cron/parsing.clj:31-39``."""
    zone = ZoneInfo(tz)
    local = after_utc.replace(tzinfo=ZoneInfo("UTC")).astimezone(zone)
    nxt = parse(expr).next_after(local.replace(tzinfo=None))
    return nxt.replace(tzinfo=zone).astimezone(ZoneInfo("UTC")).replace(tzinfo=None)


def prev_run(expr: str, tz: str, before_utc: datetime) -> datetime:
    zone = ZoneInfo(tz)
    local = before_utc.replace(tzinfo=ZoneInfo("UTC")).astimezone(zone)
    prev = parse(expr).prev_before(local.replace(tzinfo=None))
    return prev.replace(tzinfo=zone).astimezone(ZoneInfo("UTC")).replace(tzinfo=None)
