"""Corpus-wide heavy hitters (frequent tokens) — the two-pass
Misra-Gries candidates + exact-recount scheme, EXACT and oracled.

The naive "GROUP BY token HAVING share >= φ" shuffles every token
occurrence (at 100 TB: trillions of rows through one exchange keyed by
a Zipf-skewed token — the hottest key IS the answer). The classic
streaming-sketch decomposition avoids it:

1. **Candidates** (one corpus pass, zero shuffle): each partition keeps
   a Misra-Gries summary of capacity k = ⌈1/φ⌉ over its own token
   stream and emits ≤ k (token) rows + its token count. The averaging
   argument makes the UNION of partition summaries a guaranteed
   SUPERSET of the global φ-heavy hitters: if a token's global share
   exceeds φ, its local share exceeds φ in at least one partition, and
   MG with capacity ⌈1/φ⌉ never evicts a token whose local share
   exceeds 1/(k+1) < φ. Driver traffic: ≤ partitions × k tokens.
2. **Exact recount** (one corpus pass, bounded shuffle): explode
   tokens, broadcast-semi-join against the candidate set (so the
   exchange carries only candidate occurrences — bounded by
   partitions × k distinct keys), exact COUNT, HAVING count ≥ ⌈φ·N⌉.

The result is bit-for-bit the full GROUP BY's answer (DuckDB oracle
runs exactly that), at a fraction of the shuffle. Same family as the
datasketches frequent-items aggregator; done as plain operators so the
guarantee is inspectable.

Tokenization: ascii word runs ``[a-z0-9]+`` over lower(text) — chosen
because Python ``re`` (pass 1) and JVM/DuckDB regexps (pass 2/oracle)
agree on it byte-for-byte; pass 1 only needs superset soundness, but
identical streams keep the guarantee airtight.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goose_spark.queries.base import register, t

PHI = 0.002  # share threshold: tokens in ≥ 0.2% of all token slots
_TOK = "[a-z0-9]+"


def mg_candidates(docs: DataFrame, phi: float = PHI,
                  text_col: str = "text") -> DataFrame:
    """Per-partition Misra-Gries summaries: (token) candidate rows plus
    one (NULL token, n_tokens) row per partition carrying the local
    stream length. Capacity ⌈1/φ⌉ ⇒ union is a superset of every token
    with global share > φ."""
    cap = math.ceil(1.0 / phi)

    def compress(counts: dict, k: int) -> dict:
        """Mergeable-summaries MG merge (Agarwal et al. 2012): keep the
        top-k counters, subtract the (k+1)-th largest from each —
        equivalent to a run of MG decrement steps, so the superset
        guarantee is preserved while batch counting stays exact/C-speed."""
        if len(counts) <= k:
            return counts
        import heapq

        top = heapq.nlargest(k + 1, counts.items(), key=lambda kv: kv[1])
        pivot = top[-1][1]
        return {t_: c - pivot for t_, c in top[:k] if c > pivot}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import itertools
        from collections import Counter

        counts: Counter = Counter()
        n = 0
        for pdf in batches:
            found = pdf[text_col].dropna().str.lower().str.findall(_TOK)
            toks = list(itertools.chain.from_iterable(found))
            n += len(toks)
            counts.update(toks)  # exact within the batch, C-speed
            if len(counts) > 8 * cap:  # periodic summary compression
                counts = Counter(compress(counts, cap))
        counters = compress(dict(counts), cap)
        out = pd.DataFrame({"token": list(counters.keys())})
        out["n_tokens"] = 0
        yield pd.concat(
            [out, pd.DataFrame({"token": [None], "n_tokens": [n]})],
            ignore_index=True,
        )

    return docs.select(text_col).mapInPandas(
        kernel, schema="token string, n_tokens long"
    )


def heavy_hitters(docs: DataFrame, spark: SparkSession,
                  phi: float = PHI, text_col: str = "text") -> DataFrame:
    """Exact φ-heavy hitters: (token, cnt, share), share rounded to 6.
    Equals the full GROUP BY ... HAVING answer; shuffles only candidate
    occurrences."""
    partials = mg_candidates(docs, phi, text_col).collect()
    # ≤ partitions × ⌈1/φ⌉ rows — the documented driver traffic
    n_total = sum(r["n_tokens"] for r in partials if r["token"] is None)
    cands = sorted({r["token"] for r in partials if r["token"] is not None})
    threshold = math.ceil(phi * n_total)
    cand_df = spark.createDataFrame([(c,) for c in cands], "token string")
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_TOK), F.lit(0))
        ).alias("token")
    )
    return (
        toks.join(F.broadcast(cand_df), "token")  # semi: bounded keys only
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= threshold)
        .select(
            "token",
            "cnt",
            F.round(F.col("cnt") / F.lit(float(n_total)), 6).alias("share"),
        )
        .orderBy(F.col("cnt").desc(), "token")
    )


_TX13_ORACLE = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '{_TOK}')) AS token
  FROM documents),
tot AS (SELECT COUNT(*) AS n FROM toks)
SELECT token, COUNT(*) AS cnt,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot), 6) AS share
FROM toks GROUP BY token
HAVING COUNT(*) >= CAST(CEIL({PHI} * (SELECT CAST(n AS DOUBLE) FROM tot)) AS BIGINT)
ORDER BY cnt DESC, token"""


@register(
    "tx13_heavy_hitters",
    _TX13_ORACLE,
    doc="EXACT corpus-wide frequent tokens (share ≥ 0.2%) via the "
        "two-pass Misra-Gries scheme: per-partition capacity-⌈1/φ⌉ "
        "summaries (zero shuffle, ≤ partitions×500 rows to the driver — "
        "a guaranteed SUPERSET of the heavy hitters by the averaging "
        "argument) then an exact recount whose shuffle carries ONLY "
        "candidate occurrences. Bit-for-bit equal to the full "
        "GROUP BY/HAVING (the DuckDB oracle runs exactly that) without "
        "ever shuffling the Zipf-skewed token column at corpus width — "
        "the vocabulary-statistics pass every tokenizer-training "
        "pipeline runs at 100 TB.",
    tags=("llm", "text"),
)
def tx13(spark: SparkSession, sf: str) -> DataFrame:
    return heavy_hitters(t(spark, sf, "documents"), spark)
