"""Containment near-dup detection — finds documents mostly CONTAINED in
another (near-supersets: quotations, boilerplate-wrapped reposts,
pages embedding an earlier page). Symmetric Jaccard misses these: a
500-word doc pasted into a 5000-word page has Jaccard ≈ 0.1 but
containment ≈ 1.0, and corpus-dedup practice (e.g. the CCNet /
RefinedWeb lineage) removes the contained copy.

    containment(A → B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|

Blocking — the 100 TB design: MinHash approximates JACCARD, so LSH
bands cannot block for containment (the small doc's signature is
dominated by the big doc's extra shingles). Instead each doc probes
the inverted shingle index with its K globally-RAREST shingles
(prefix-filtering principle, PPJoin lineage): if A is τ-contained in
B, each of A's shingles — rare ones included — appears in B with
probability ≥ τ, so K probes miss with probability ≤ (1-τ)^K (≈0.8%
at τ=0.8, K=3 under independence). Probing RARE shingles bounds the
join fan-out: a probe's candidate list is exactly that shingle's
posting list, and the probes are chosen to be the shortest lists the
doc can offer. Cost: one corpus shingle scan for the frequency table
(tx5's shape), one doc_id-window for probe selection, then a join
whose right side is only the probed postings — never doc × doc.

``max_posting`` caps degenerate corpora (every shingle common —
boilerplate-only docs): probes with posting lists longer than the cap
are dropped from candidacy, the same frequency-cap rationale as the
LSH hot-bucket guard (dedup._build_pairs). Default None = exact parity
with the oracle.

No reference analog (nilenso/goose is a job library); extends the
LLM-pipeline dedup family (SURVEY §2.5 north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from goose_spark.operators.dedup import _SHINGLES_SQL, shingled_docs
from goose_spark.queries.base import register

#: Rarest shingles each doc probes the inverted index with.
K_PROBE = 3

#: Target bytes per verify-exchange partition: the two verify joins
#: carry an ~8·|sh| byte hash array per candidate row, and candidate
#: volume tracks the shingle-table size, so the partition count derives
#: from the INPUT SIZE (Catalyst stats of the shingled frame — exact
#: for the materialized session cache) instead of a constant × cores
#: (r15; guide §2 scale-adaptive partitioning). At sf0.1 (7 MB shingle
#: cache) this floors at defaultParallelism — the old 8×cores=256
#: constant was tuned on the 64x densified smoke (~450 MB → ~226
#: partitions here, within 12% of the measured-good 256) and cost
#: ~0.8 s/run in 512 near-empty tasks at sf0.1.
VERIFY_TARGET_BYTES = 2 * 1024 * 1024
#: Hard cap on the derived width (runaway-stats guard: an unmaterialized
#: input's size estimate can be wildly conservative).
VERIFY_MAX_PARTS_PER_CORE = 64
#: Containment threshold (fraction of the inner doc inside the outer).
CONTAIN_T = 0.8

_TX14_ORACLE = f"""
WITH sh AS (SELECT doc_id, {_SHINGLES_SQL} AS s FROM documents),
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
freq AS (SELECT g, COUNT(*) AS f FROM ex GROUP BY g),
probe AS (SELECT doc_id, g FROM (
   SELECT e.doc_id, e.g,
          ROW_NUMBER() OVER (PARTITION BY e.doc_id ORDER BY f.f, e.g) AS rn
   FROM ex e JOIN freq f USING (g)) WHERE rn <= {K_PROBE}),
cand AS (SELECT DISTINCT p.doc_id AS inner_id, e.doc_id AS outer_id
         FROM probe p JOIN ex e USING (g) WHERE p.doc_id <> e.doc_id)
SELECT c.inner_id, c.outer_id,
       ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(a.s), 6) AS containment
FROM cand c JOIN sh a ON a.doc_id = c.inner_id
            JOIN sh b ON b.doc_id = c.outer_id
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) >= {CONTAIN_T}
ORDER BY inner_id, outer_id"""


def containment_pairs(docs_shingled: DataFrame, k_probe: int = K_PROBE,
                      threshold: float = CONTAIN_T,
                      max_posting: int | None = None) -> DataFrame:
    """(doc_id, sh) → (inner_id, outer_id, containment) for every
    ordered pair with containment(inner → outer) ≥ threshold among
    rare-shingle-blocked candidates. See module docstring for the
    blocking recall/cost argument.

    Two LOSSLESS cost cuts (results provably unchanged, so the DuckDB
    oracle needs no mirror — the round-9 tx14 growth-bound work):

    * size prefilter: containment ≥ τ forces |sb| ≥ |∩| ≥ τ·|sa|, so
      candidates failing ``nb ≥ τ·na`` are dropped BEFORE the distinct
      and the array joins — in real corpora this kills the reverse
      direction of every asymmetric pair (a 5000-word page can never be
      0.8-contained in the 500-word quote it embeds). The sizes ride
      the probe/posting rows (constants per doc), zero extra joins.
    * hashed verify: the exact |sa ∩ sb| is computed on xxhash64'd
      shingle arrays — 8 bytes/element through the two candidate-keyed
      exchanges instead of ~50-byte shingle strings. Counts are
      identical barring int64 collisions (p ≈ |sh|²·2⁻⁶⁴ per pair).
    """
    sh = docs_shingled.select("doc_id", "sh")
    # constant-per-doc size rides the explode so the size prefilter
    # needs no extra join against a sizes table
    ex = sh.select("doc_id", F.size("sh").alias("n"), F.explode("sh").alias("g"))
    freq = ex.groupBy("g").agg(F.count("*").alias("f"))
    w = Window.partitionBy("doc_id").orderBy("f", "g")
    probe = (
        ex.join(freq, "g")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k_probe)
        .select("doc_id", "n", "g", "f")
    )
    if max_posting is not None:
        probe = probe.filter(F.col("f") <= max_posting)
    cand = (
        probe.select(F.col("doc_id").alias("inner_id"), F.col("n").alias("na"), "g")
        .join(
            ex.select(F.col("doc_id").alias("outer_id"), F.col("n").alias("nb"), "g"),
            "g",
        )
        .filter(F.col("inner_id") != F.col("outer_id"))
        # lossless: |∩| ≤ |sb|, so containment ≥ τ ⟹ |sb| ≥ τ|sa|
        .filter(F.col("nb").cast("double") >= F.lit(threshold) * F.col("na"))
        .select("inner_id", "outer_id")
        # plain distinct on purpose: HashAggregate partial-aggregates
        # map-side BEFORE its exchange, so the shuffle carries near-
        # result-size rows; an explicit repartition here was measured
        # to ship the RAW candidate stream instead (64x: 361 → 448 s)
        .distinct()
    )
    hs = F.transform("sh", lambda x: F.xxhash64(x))
    a = sh.select(F.col("doc_id").alias("inner_id"), hs.alias("ha"))
    b = sh.select(F.col("doc_id").alias("outer_id"), hs.alias("hb"))
    inter = F.size(F.array_intersect("ha", "hb")).cast("double")
    cont = inter / F.size("ha")
    # The two verify exchanges carry an ~8·|sh| byte array per row; at a
    # densified corpus (64x smoke: ~10x the 22M result pairs in
    # candidate rows) the session's 32 static shuffle partitions put
    # GBs in one task and OOM the heap — and AQE only splits partitions
    # it flags as SKEWED, so uniform oversize keeps the static count.
    # Size these two joins explicitly from the input size (see
    # VERIFY_TARGET_BYTES); pre-partitioning on each join key means the
    # join REUSES the distribution (no extra exchange), and a global
    # initialPartitionNum — the config-level alternative — was measured
    # to tax every iterative/cached plan.
    cores = docs_shingled.sparkSession.sparkContext.defaultParallelism
    sh_bytes = int(
        str(docs_shingled._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    verify_parts = max(
        cores,
        min(VERIFY_MAX_PARTS_PER_CORE * cores, sh_bytes // VERIFY_TARGET_BYTES),
    )
    return (
        cand.repartition(verify_parts, "inner_id")
        .join(a, "inner_id")
        .repartition(verify_parts, "outer_id")
        .join(b, "outer_id")
        .filter(cont >= threshold)
        .select("inner_id", "outer_id", F.round(cont, 6).alias("containment"))
        .orderBy("inner_id", "outer_id")
    )


@register(
    "tx14_containment",
    _TX14_ORACLE,
    doc="Containment near-dup pairs (inner τ-contained in outer, τ=0.8): "
        "rare-shingle probes against the inverted shingle index "
        "(prefix-filtering blocking — miss prob ≤ (1-τ)^K), exact "
        "containment verify on candidates only. Catches near-supersets "
        "symmetric Jaccard (dd2) misses.",
    tags=("llm", "dedup", "text"),
)
def tx14(spark: SparkSession, sf: str) -> DataFrame:
    return containment_pairs(shingled_docs(spark, sf))
