"""Property-based tests (hypothesis) for the pure kernels: cron field
semantics, backoff monotonicity, batch-status totality."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from goose_spark.functions import cron
from goose_spark.functions.backoff import default_retry_delay_sec
from goose_spark.schema import batch_status

dts = st.datetimes(min_value=datetime(2020, 1, 1), max_value=datetime(2030, 12, 31))


@given(dts, st.integers(1, 59))
@settings(max_examples=50, deadline=None)
def test_cron_every_n_minutes_properties(dt, n):
    s = cron.parse(f"*/{n} * * * *")
    nxt = s.next_after(dt)
    assert nxt > dt.replace(second=0, microsecond=0)
    assert nxt.minute % n == 0
    assert (nxt - dt) <= timedelta(minutes=n + 1)


@given(dts, st.integers(0, 23), st.integers(0, 59))
@settings(max_examples=50, deadline=None)
def test_cron_daily_fires_once_per_day(dt, hour, minute):
    s = cron.parse(f"{minute} {hour} * * *")
    nxt = s.next_after(dt)
    assert (nxt.hour, nxt.minute) == (hour, minute)
    assert s.next_after(nxt) - nxt == timedelta(days=1)


@given(dts)
@settings(max_examples=50, deadline=None)
def test_cron_prev_next_adjoint(dt):
    s = cron.parse("0 * * * *")
    prev = s.prev_before(dt)
    assert prev <= dt
    assert s.next_after(prev) > prev
    # no occurrence strictly between prev and the next one
    assert s.next_after(prev) >= prev + timedelta(hours=1)


@given(st.integers(0, 50), st.integers(0, 19))
def test_backoff_monotone_in_retry_count(n, jitter):
    fixed = lambda _: jitter  # noqa: E731
    assert default_retry_delay_sec(n + 1, fixed) > default_retry_delay_sec(n, fixed)
    assert default_retry_delay_sec(n, fixed) >= 20


@given(st.integers(0, 100), st.integers(0, 100), st.integers(0, 100), st.integers(0, 100))
def test_batch_status_total_and_terminal(enq, retrying, success, dead):
    s = batch_status(enq, retrying, success, dead)
    assert s in ("in-progress", "success", "dead", "partial-success")
    if enq + retrying > 0:
        assert s == "in-progress"
    else:
        assert s != "in-progress" or (enq + retrying) > 0


@given(st.text(max_size=40))
@settings(max_examples=100, deadline=None)
def test_cron_parse_never_crashes_on_garbage(expr):
    # valid() must be a total function (spec-gate parity)
    assert cron.valid(expr) in (True, False)


# ---------------------------------------------------------------------------
# linkage pigeonhole blocking (pure core of operators/linkage.py)
# ---------------------------------------------------------------------------

from itertools import combinations as _combos

from goose_spark.operators.linkage import _interleaved_parts


def _part_values(s, parts, offset):
    # mirror of the SQL/Column substr concat (1-based positions)
    return ["".join(s[p - offset] for p in plist) for plist in parts]


@given(
    st.integers(4, 16),          # payload length
    st.integers(1, 2),           # max_dist
    st.data(),
)
@settings(max_examples=200, deadline=None)
def test_pigeonhole_blocking_is_lossless(length, max_dist, data):
    """If hamming(a, b) <= d then SOME (n_parts - d)-subset of the
    interleaved parts agrees exactly — the losslessness claim every
    hamming_pairs join branch relies on. Validates the part-position
    construction (1-based substr offsets, round-robin interleave)."""
    n_parts = max_dist + data.draw(st.integers(1, 3))
    if n_parts > length:
        return
    a = data.draw(st.text(alphabet="0123456789", min_size=length, max_size=length))
    # perturb <= max_dist random positions to build b
    n_edits = data.draw(st.integers(0, max_dist))
    pos = data.draw(
        st.lists(st.integers(0, length - 1), min_size=n_edits,
                 max_size=n_edits, unique=True)
    )
    b = list(a)
    for p in pos:
        b[p] = data.draw(st.sampled_from("0123456789"))
    b = "".join(b)
    offset = data.draw(st.integers(1, 5))
    parts = _interleaved_parts(offset, length, n_parts)
    # part positions must tile [offset, offset+length) exactly once
    flat = sorted(p for plist in parts for p in plist)
    assert flat == list(range(offset, offset + length))
    pa, pb = _part_values(a, parts, offset), _part_values(b, parts, offset)
    clean = {i for i in range(n_parts) if pa[i] == pb[i]}
    assert any(
        set(sub) <= clean for sub in _combos(range(n_parts), n_parts - max_dist)
    ), f"pair at hamming<={max_dist} missed by every blocking subset"
