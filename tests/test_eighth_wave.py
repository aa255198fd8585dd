"""Round-11 eighth-wave operators: temperature-scaled mixture
allocation (sp15), per-source duplication audit (tx21) — independent
driver-side recomputes beyond the DuckDB oracle gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from goose_spark.queries import load_all
from goose_spark.queries.base import t
from tests.conftest import SF_CORRECT

REG = load_all()


def test_temperature_mixture_matches_python_recompute(spark):
    from decimal import ROUND_HALF_UP, Decimal

    from goose_spark.operators.pipeline import MIXTURE_BUDGET

    import re

    rows = REG["sp15_temperature_mixture"].builder(spark, SF_CORRECT).collect()
    docs = t(spark, SF_CORRECT, "documents").select("source", "text").collect()
    n_tok: dict = {}
    n_docs: dict = {}
    for d in docs:
        n_tok[d["source"]] = n_tok.get(d["source"], 0) + len(
            re.split(r"\s+", d["text"].lower())
        )
        n_docs[d["source"]] = n_docs.get(d["source"], 0) + 1
    wt = {
        s: Decimal(repr(math.sqrt(v))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
        for s, v in n_tok.items()
    }
    tw, tt = float(sum(wt.values())), sum(n_tok.values())
    assert {r["source"] for r in rows} == set(n_tok)
    for r in rows:
        s = r["source"]
        assert r["n_docs"] == n_docs[s]
        assert r["n_tok"] == n_tok[s]
        assert r["natural_share"] == round(n_tok[s] / tt, 6)
        assert r["temp_share"] == round(float(wt[s]) / tw, 6)
        assert r["alloc_tokens"] == math.floor(MIXTURE_BUDGET * float(wt[s]) / tw)


def test_temperature_mixture_flattens_the_distribution(spark):
    """The point of alpha=0.5: small sources gain share, big sources
    lose it — temp_share must strictly order-compress natural_share,
    and the allocation must stay within the budget."""
    from goose_spark.operators.pipeline import MIXTURE_BUDGET

    rows = REG["sp15_temperature_mixture"].builder(spark, SF_CORRECT).collect()
    assert sum(r["alloc_tokens"] for r in rows) <= MIXTURE_BUDGET
    mean_nat = sum(r["natural_share"] for r in rows) / len(rows)
    for r in rows:
        if r["natural_share"] > mean_nat:
            assert r["temp_share"] <= r["natural_share"]
        if r["natural_share"] < mean_nat:
            assert r["temp_share"] >= r["natural_share"]


def test_dup_audit_matches_python_recompute(spark):
    import hashlib
    import re

    from goose_spark.operators.text import LEAD_TOKENS

    rows = REG["tx21_dup_audit_by_source"].builder(spark, SF_CORRECT).collect()
    docs = t(spark, SF_CORRECT, "documents").select("source", "text").collect()
    fps = [
        (d["source"], hashlib.md5(
            " ".join(re.split(r"\s+", d["text"].lower())[:LEAD_TOKENS]).encode()
        ).hexdigest())
        for d in docs
    ]
    n: dict = {}
    srcs: dict = {}
    for s, fp in fps:
        n[fp] = n.get(fp, 0) + 1
        srcs.setdefault(fp, set()).add(s)
    want: dict = {}
    for s, fp in fps:
        w = want.setdefault(s, {"n_docs": 0, "dup": 0, "cross": 0, "fps": set()})
        w["n_docs"] += 1
        w["fps"].add(fp)
        if n[fp] > 1:
            w["dup"] += 1
        if len(srcs[fp]) > 1:
            w["cross"] += 1
    assert {r["source"] for r in rows} == set(want)
    for r in rows:
        w = want[r["source"]]
        assert r["n_docs"] == w["n_docs"]
        assert r["n_fingerprints"] == len(w["fps"])
        assert r["dup_docs"] == w["dup"]
        assert r["cross_source_docs"] == w["cross"]
        assert r["dup_rate"] == round(w["dup"] / w["n_docs"], 6)
    # the audit must be non-degenerate on the test corpus: shared
    # leads exist at every SF (that is why the fingerprint is the
    # lead prefix, not the full text — see LEAD_TOKENS)
    assert sum(r["dup_docs"] for r in rows) > 0


def test_dup_audit_consistent_with_lead_groups(spark):
    """Total duplicated docs must equal the sum over lead-fingerprint
    groups of size>1 of group size — an independent Spark recompute of
    the same quantity through a different plan."""
    from goose_spark.operators.text import LEAD_TOKENS
    from goose_spark.operators.textlib import words

    rows = REG["tx21_dup_audit_by_source"].builder(spark, SF_CORRECT).collect()
    g = (
        t(spark, SF_CORRECT, "documents")
        .select(
            F.md5(
                F.concat_ws(" ", F.slice(words(F.col("text")), 1, LEAD_TOKENS))
            ).alias("fp")
        )
        .groupBy("fp").count().filter(F.col("count") > 1)
        .agg(F.sum("count")).collect()[0][0]
    )
    assert sum(r["dup_docs"] for r in rows) == (g or 0)
