"""Hamming-pigeonhole blocked fuzzy join (operators/linkage.py).

The operator's whole value is the LOSSLESS claim: the blocked candidate
set provably contains every pair within the distance bound. These tests
pin that against a brute-force reference, plus the emitted-exactly-once
property the q86 docstring relies on to skip the distinct.
"""

from __future__ import annotations

import itertools

import pytest

from goose_spark.operators.linkage import hamming_pairs


def _hamming(a: str, b: str) -> int:
    return sum(x != y for x, y in zip(a, b))


def _brute(rows, max_dist):
    out = set()
    for (ia, sa), (ib, sb) in itertools.combinations(rows, 2):
        if _hamming(sa, sb) <= max_dist:
            out.add((min(ia, ib), max(ia, ib)))
    return out


# Width-8 payloads: planted distance-1 neighbours, a double-edit pair
# whose edits land in the SAME stride-3 part (positions 1 and 4 → part 0
# — it becomes a candidate but must be rejected by the verify), a
# double-edit pair split across parts (never even a candidate), and
# unrelated strings.
ROWS = [
    (1, "00000000"),
    (2, "00000001"),   # d=1 vs 1 (pos 8)
    (3, "10000000"),   # d=1 vs 1 (pos 1)
    (4, "10010000"),   # d=1 vs 3; d=2 vs 1 with both edits in part 0
    (5, "01100000"),   # d=2 vs 1, edits in different parts
    (6, "99999999"),
    (7, "99989999"),   # d=1 vs 6 (pos 4)
    (8, "12345678"),
]


def test_blocked_equals_brute_force_d1(spark):
    df = spark.createDataFrame(ROWS, ["id", "s"])
    got = hamming_pairs(df, "id", "s", offset=1, length=8, n_parts=3, max_dist=1)
    pairs = {(r.a_id, r.b_id) for r in got.collect()}
    assert pairs == _brute(ROWS, 1)


def test_each_pair_emitted_exactly_once_d1(spark):
    df = spark.createDataFrame(ROWS, ["id", "s"])
    got = hamming_pairs(df, "id", "s", offset=1, length=8, n_parts=3, max_dist=1)
    rows = [(r.a_id, r.b_id) for r in got.collect()]
    assert len(rows) == len(set(rows))


def test_blocked_equals_brute_force_d2_four_parts(spark):
    df = spark.createDataFrame(ROWS, ["id", "s"])
    got = hamming_pairs(df, "id", "s", offset=1, length=8, n_parts=4, max_dist=2)
    pairs = {(r.a_id, r.b_id) for r in got.collect()}
    assert pairs == _brute(ROWS, 2)


def test_offset_window_ignores_prefix(spark):
    # same payloads behind a constant prefix — identical pair set; dist
    # is measured on the WINDOW (the prefix never participates)
    prefixed = [(i, "ID#" + s) for i, s in ROWS]
    df = spark.createDataFrame(prefixed, ["id", "s"])
    got = hamming_pairs(df, "id", "s", offset=4, length=8, n_parts=3, max_dist=1)
    pairs = {(r.a_id, r.b_id) for r in got.collect()}
    assert pairs == _brute(ROWS, 1)


def test_partial_window_differs_outside_emitted_once(spark):
    # Pairs equal INSIDE the window but differing outside it are clean
    # on every part, so they match every blocking subset — the windowed
    # claim filter must still emit them exactly once, with dist 0 (the
    # characters outside [offset, offset+length) are not part of the
    # predicate). Window = positions 1..4 of a width-8 string.
    rows = [
        (1, "0000AAAA"),
        (2, "0000BBBB"),   # window-equal to 1, differs only outside
        (3, "0001CCCC"),   # window d=1 vs 1 and 2
        (4, "9999AAAA"),   # outside chars equal to 1, window far away
    ]
    df = spark.createDataFrame(rows, ["id", "s"])
    got = hamming_pairs(df, "id", "s", offset=1, length=4, n_parts=3, max_dist=1)
    res = sorted((r.a_id, r.b_id, r.dist) for r in got.collect())
    # exactly once each, windowed distances
    assert res == [(1, 2, 0), (1, 3, 1), (2, 3, 1)]


def test_duplicate_strings_emit_each_pair_once(spark):
    # exact duplicates are clean on EVERY part — without the branch-0
    # claim rule they would be emitted once per blocking subset
    rows = [(1, "00000000"), (2, "00000000"), (3, "00000000"), (4, "00000001")]
    df = spark.createDataFrame(rows, ["id", "s"])
    got = hamming_pairs(df, "id", "s", offset=1, length=8, n_parts=3, max_dist=1)
    pairs = sorted((r.a_id, r.b_id) for r in got.collect())
    assert pairs == sorted(_brute(rows, 1))  # all 6 pairs, each once


def test_rejects_degenerate_part_split():
    with pytest.raises(ValueError):
        hamming_pairs(None, "id", "s", offset=1, length=8, n_parts=1, max_dist=1)
