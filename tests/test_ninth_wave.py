"""Round-12 ninth-wave operators: temperature-mixture materialization
(sp16) — invariants the DuckDB hash-match can't see (sampling quality,
temperature direction, determinism across partitionings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from goose_spark.queries import load_all
from tests.conftest import SF_CORRECT

REG = load_all()


def _rows(spark):
    return {
        r["source"]: r
        for r in REG["sp16_mixture_materialize"].builder(spark, SF_CORRECT).collect()
    }


def test_sp16_rates_and_realized_tokens(spark):
    """Per-source realized token share lands near the temperature
    target (md5-uniform sampling: expected = rate, tolerance from the
    per-source doc counts), capped rates saturate at 1.0, and nothing
    exceeds its source's inventory."""
    rows = _rows(spark)
    assert rows  # every source present even when n_sampled == 0
    for src, r in rows.items():
        assert 0.0 < r["rate"] <= 1.0, src
        assert r["n_sampled"] <= r["n_docs_in"], src
        if r["rate"] == 1.0:
            assert r["n_sampled"] == r["n_docs_in"], src
        else:
            # binomial(n, rate): allow 5 sigma around the expectation
            import math

            n, p = r["n_docs_in"], r["rate"]
            sigma = math.sqrt(n * p * (1 - p))
            assert abs(r["n_sampled"] - n * p) <= 5 * sigma + 1, (src, r)


def test_sp16_temperature_flattens_the_mixture(spark):
    """alpha=0.5 up-samples the tail: the SMALLEST source by tokens must
    get a sampling rate >= the LARGEST source's rate (equality only if
    both saturate) — the whole point of temperature mixing."""
    rows = list(_rows(spark).values())
    smallest = min(rows, key=lambda r: r["target_tokens"] / max(r["rate"], 1e-12))
    largest = max(rows, key=lambda r: r["target_tokens"] / max(r["rate"], 1e-12))
    assert smallest["rate"] >= largest["rate"]


def test_sp16_membership_is_partitioning_independent(spark):
    """The sampled doc set is a pure function of doc_id — identical
    under a different partitioning (the reproducible-subset guarantee;
    an RNG-based sample would fail this)."""
    a = sorted(
        (r["source"], r["n_sampled"], r["sampled_tokens"])
        for r in REG["sp16_mixture_materialize"].builder(spark, SF_CORRECT).collect()
    )
    from goose_spark.queries.base import t as _t

    # recompute membership directly from the documents table under
    # repartition(7): same predicate, same docs
    d = _t(spark, SF_CORRECT, "documents").repartition(7)
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4),
        16, 10,
    ).cast("long")
    direct = d.select("source", "doc_id", u.alias("u"))
    rates = {
        r["source"]: r["rate"]
        for r in REG["sp16_mixture_materialize"].builder(spark, SF_CORRECT).collect()
    }
    import math

    picked = {}
    for src, rate in rates.items():
        thr = math.floor(rate * 65536)
        picked[src] = (
            direct.filter((F.col("source") == src) & (F.col("u") < thr)).count()
        )
    b = sorted((s, picked[s]) for s in picked)
    assert [(s, n) for s, n, _ in a] == b
