"""Containment near-dup (tx14): planted near-superset detection,
direction asymmetry, the max_posting degenerate-corpus guard, and
short-doc safety. Oracle parity at sf0.01 runs in test_oracle_parity."""

from __future__ import annotations

from goose_spark.operators.containment import containment_pairs
from goose_spark.operators.textlib import with_shingles

INNER = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
)
OUTER = (
    "intro words before the quoted block starts here " + INNER +
    " and some closing commentary after the quoted block ends"
)
OTHER = (
    "completely unrelated content about columnar execution engines "
    "scanning immutable parquet files with predicate pushdown enabled"
)


def _shingled(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return with_shingles(df)


def test_detects_containment_one_direction(spark):
    out = containment_pairs(
        _shingled(spark, [(1, INNER), (2, OUTER), (3, OTHER)])
    ).collect()
    pairs = {(r["inner_id"], r["outer_id"]): r["containment"] for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.8
    # the superset is NOT contained in the snippet
    assert (2, 1) not in pairs
    assert all(3 not in p for p in pairs)


def test_exact_duplicate_is_mutually_contained(spark):
    out = containment_pairs(
        _shingled(spark, [(1, INNER), (2, INNER)])
    ).collect()
    pairs = {(r["inner_id"], r["outer_id"]): r["containment"] for r in out}
    assert pairs == {(1, 2): 1.0, (2, 1): 1.0}


def test_max_posting_guard_drops_common_probes(spark):
    # every doc identical → every shingle's posting list has length 4;
    # a cap below that drops all probes (degenerate-corpus guard)
    rows = [(i, INNER) for i in range(4)]
    assert containment_pairs(_shingled(spark, rows), max_posting=3).count() == 0
    assert containment_pairs(_shingled(spark, rows), max_posting=4).count() == 12


def test_short_docs_are_safe(spark):
    out = containment_pairs(
        _shingled(spark, [(1, "too short"), (2, ""), (3, INNER)])
    ).collect()
    assert out == []


def test_full_containment_never_missed(spark):
    """Provable blocking guarantee: if EVERY shingle of A appears in B
    (containment 1.0), then A's rarest shingles are in B too, so the
    probe join MUST produce the candidate — recall is exactly 1.0 for
    full containments, independent of K. Randomized corpus: 30 base
    docs, 10 planted full-containments (snippet = contiguous slice)."""
    import random

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(120)]
    rows = []
    for i in range(30):
        n = rng.randint(25, 60)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    planted = []
    for j in range(10):
        base_id = rng.randrange(30)
        words = rows[base_id][1].split()
        a = rng.randrange(0, len(words) - 12)
        snippet = " ".join(words[a : a + 12])
        rows.append((100 + j, snippet))
        planted.append((100 + j, base_id))
    out = containment_pairs(_shingled(spark, rows), threshold=0.999).collect()
    got = {(r["inner_id"], r["outer_id"]) for r in out}
    for inner, outer in planted:
        assert (inner, outer) in got, (inner, outer)
