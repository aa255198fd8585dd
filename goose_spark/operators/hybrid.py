"""Hybrid retrieval — reciprocal-rank fusion of a sparse lexical
ranking and the dense cosine ranking (ss13).

The practical RAG serving shape: lexical recall catches exact
terminology the embedding misses, dense recall catches paraphrase the
lexicon misses, and RRF (Cormack, Clarke & Büttcher, SIGIR'09) fuses
the two WITHOUT score calibration: rrf(d) = Σ_lists 1/(K + rank_d).
Ranks, not scores, cross the modality boundary — which is also what
makes the operator hash-matchable: every input to the fusion is an
exact integer rank.

Determinism by construction (the DuckDB-oracle contract):
* lexical score = Σ over shared tokens of min(tf_q, tf_d) · ⌊N/df⌋ —
  rarity-weighted token overlap with INTEGER weights (the BM25 idf
  argument without the log; integer floor-division), so per-pair
  scores are exact BIGINT sums — no float summation order anywhere.
* dense rank = exact cosine (ss1's semantics, ties by doc id).
* rrf = 1/(K+r_lex) + 1/(K+r_vec): two IEEE divisions of small ints in
  a fixed order — bit-identical across engines.

Scale shape: the lexical side is a token-keyed inverted-index join
(posting lists, never doc×doc text comparison) + one (query, doc)
hash-agg of integer products; the dense side is the broadcast-queries
scan (the ss5 partition-pruned index serves the same ranks at corpus
scale); fusion is a FULL OUTER join of two ≤C-row-per-query rank lists
— O(queries × C). Each modality is blind to the other until ranks —
exactly why hybrid beats either alone on real corpora.

No reference analog (nilenso/goose is a job library); extends the
similarity/retrieval family (SURVEY §2.5 north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from goose_spark.plans.guards import EMBEDDING_ROW_CAP, bounded_broadcast
from goose_spark.queries.base import register, t

#: RRF smoothing constant (the SIGIR'09 default).
RRF_K = 60
#: Per-modality candidate-list depth entering the fusion.
RRF_C = 50
#: Final fused top-k per query.
RRF_TOP = 10
#: Queries: the first N embedding ids, their text = same-id document.
N_Q = 10

_WORDS_SQL = "string_split_regex(lower(text), '\\s+')"

_SS13_ORACLE = f"""
WITH nvec AS (SELECT COUNT(*) AS nv FROM embeddings),
d AS (SELECT doc_id, text FROM documents, nvec WHERE doc_id < nv),
toks AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest({_WORDS_SQL}) AS tok FROM d) WHERE tok <> ''
  GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(*) AS dfreq FROM toks GROUP BY tok),
n AS (SELECT COUNT(*) AS nd FROM d),
qt AS (SELECT doc_id AS query_id, tok, tf AS tfq FROM toks
       WHERE doc_id < {N_Q}),
lex AS (
  SELECT qt.query_id, toks.doc_id,
         SUM(LEAST(qt.tfq, toks.tf) * (n.nd // df.dfreq)) AS lex_score
  FROM qt JOIN toks USING (tok) JOIN df USING (tok), n
  WHERE toks.doc_id <> qt.query_id
  GROUP BY qt.query_id, toks.doc_id),
lex_r AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY lex_score DESC, doc_id) AS r_lex
  FROM lex),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      WHERE vec_id < {N_Q}),
cos AS (
  SELECT q.query_id, v.vec_id AS doc_id,
         list_dot_product(q.qe, v.embedding)
         / sqrt(list_dot_product(q.qe, q.qe)
                * list_dot_product(v.embedding, v.embedding)) AS c
  FROM q JOIN embeddings v ON v.vec_id <> q.query_id),
vec_r AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY c DESC, doc_id) AS r_vec
  FROM cos),
fused AS (
  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
         COALESCE(l.doc_id, v.doc_id) AS doc_id,
         l.r_lex, v.r_vec,
         COALESCE(1.0 / ({RRF_K} + l.r_lex), 0)
         + COALESCE(1.0 / ({RRF_K} + v.r_vec), 0) AS rrf
  FROM (SELECT * FROM lex_r WHERE r_lex <= {RRF_C}) l
  FULL OUTER JOIN (SELECT * FROM vec_r WHERE r_vec <= {RRF_C}) v
    ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
SELECT query_id, doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank,
       CAST(r_lex AS BIGINT) AS r_lex, CAST(r_vec AS BIGINT) AS r_vec,
       ROUND(rrf, 8) AS rrf
FROM fused
QUALIFY rank <= {RRF_TOP}
ORDER BY query_id, rank"""


def rrf_fuse(lex_r: DataFrame, vec_r: DataFrame, k: int = RRF_K,
             c: int = RRF_C, top: int = RRF_TOP) -> DataFrame:
    """Fuse two (query_id, doc_id, rank) lists by reciprocal-rank —
    the modality-agnostic half every hybrid stack shares; callers can
    hand it ANY two rankers (e.g. the ss5 indexed serve for the dense
    side at corpus scale)."""
    l = lex_r.filter(F.col("r_lex") <= c)
    v = vec_r.filter(F.col("r_vec") <= c)
    fused = l.join(v, ["query_id", "doc_id"], "full_outer").select(
        "query_id", "doc_id", "r_lex", "r_vec",
        (
            F.coalesce(1.0 / (F.lit(k) + F.col("r_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k) + F.col("r_vec")), F.lit(0.0))
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top)
        .select("query_id", "doc_id", "rank",
                F.col("r_lex").cast("long").alias("r_lex"),
                F.col("r_vec").cast("long").alias("r_vec"),
                F.round("rrf", 8).alias("rrf"))
        .orderBy("query_id", "rank")
    )


@register(
    "ss13_hybrid_rrf",
    _SS13_ORACLE,
    doc=f"Hybrid retrieval via reciprocal-rank fusion (RRF, K={RRF_K}): "
        f"a sparse lexical ranking (rarity-weighted token overlap over "
        f"the inverted token index — INTEGER weights ⌊N/df⌋, so scores "
        f"are exact BIGINT sums) fused with the exact dense cosine "
        f"ranking (ss1 semantics) as 1/(K+r_lex) + 1/(K+r_vec) over the "
        f"top-{RRF_C} of each list. Ranks, not scores, cross the "
        f"modality boundary — no calibration, and the whole operator "
        f"hash-matches. The lexical side is posting-list joins (never "
        f"doc×doc text); at corpus scale the dense ranks come from the "
        f"ss5 partition-pruned index via the shared rrf_fuse stage.",
    tags=("llm", "similarity", "text"),
)
def ss13(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.similarity import _dot, _embeddings

    emb = _embeddings(spark, sf)
    nv = emb.count()  # bounded: id-space size of the vector corpus
    lex_r = _lexical_ranks(spark, sf, nv)

    q = emb.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    cos = _dot(F.col("qe"), F.col("emb")) / F.sqrt(
        _dot(F.col("qe"), F.col("qe")) * _dot(F.col("emb"), F.col("emb"))
    )
    wv = Window.partitionBy("query_id").orderBy(F.col("c").desc(), "doc_id")
    vec_r = (
        bounded_broadcast(q, max_rows=EMBEDDING_ROW_CAP, n_rows=N_Q,
                          label="ss13 queries")
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("doc_id"), cos.alias("c"))
        .withColumn("r_vec", F.row_number().over(wv))
        .drop("c")
    )
    return rrf_fuse(lex_r, vec_r)


def _lexical_ranks(spark: SparkSession, sf: str, nv: int) -> DataFrame:
    """The sparse half both hybrid forms share: rarity-weighted integer
    token overlap over the inverted token index → (query_id, doc_id,
    r_lex). Posting-list joins keyed on token, one (query, doc)
    hash-agg — never doc×doc text comparison."""
    d = t(spark, sf, "documents").filter(F.col("doc_id") < nv)

    # the token index feeds THREE subplans (df table, query tokens, the
    # posting join) and the planner does not reuse the exchange across
    # them (0 ReusedExchange in the before plan — the explode+agg ran
    # 3x per query): one persist_shared materialization, released by
    # sweep callers between queries
    from goose_spark.plans.guards import persist_shared

    toks = persist_shared(
        d.select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("dfreq"))
    nd = d.agg(F.count("*").alias("nd"))
    qt = toks.filter(F.col("doc_id") < N_Q).select(
        F.col("doc_id").alias("query_id"), "tok", F.col("tf").alias("tfq")
    )
    lex = (
        qt.join(toks, "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(dfreq, "tok")
        .join(F.broadcast(nd))
        .groupBy("query_id", "doc_id")
        .agg(
            # true integer floor division (`div`), matching the oracle's
            # `//` exactly — double division + cast truncation only
            # agrees while nd/dfreq stays inside double precision
            F.sum(F.least("tfq", "tf") * F.expr("nd div dfreq")).alias("lex_score")
        )
    )
    wl = Window.partitionBy("query_id").orderBy(F.col("lex_score").desc(), "doc_id")
    return lex.select(
        "query_id", "doc_id", F.row_number().over(wl).alias("r_lex")
    )


@register(
    "ss14_hybrid_indexed",
    None,  # approximate (probed-cell dense ranks) — rows-only; fusion
    # parity vs the exact ss13 pinned in tests/test_hybrid.py
    doc=f"Hybrid retrieval SERVED FROM THE PERSISTED IVF INDEX — the "
        f"ss13→ss14 move mirrors ss9→ss12 (MMR): the dense ranks come "
        f"from the ss5 partition-pruned probed-cell read "
        f"(ivf_index_query, top-{RRF_C}), so a query batch opens "
        f"nprobe/k of the corpus instead of a corpus-wide cosine scan; "
        f"the lexical posting-list half and the rank-only RRF fusion "
        f"are byte-identical to ss13. This is the RAG serving "
        f"composition at 100 TB; ss13 is its exact cross-check "
        f"(fusion-parity ≥ 0.9 overlap pinned in tests/test_hybrid.py).",
    tags=("llm", "similarity", "text"),
)
def ss14(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.annindex import index_manifest, ivf_index_query
    from goose_spark.operators.similarity import _embeddings, ivf_index_for

    emb = _embeddings(spark, sf)
    # vector-corpus size from the index manifest (zero-job driver
    # read; every vector is indexed) instead of a count job
    idx = ivf_index_for(spark, sf)
    nv = index_manifest(idx)["n"]
    lex_r = _lexical_ranks(spark, sf, nv)

    q = emb.filter(F.col("vec_id") < N_Q).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    vec_r = ivf_index_query(spark, idx, q, topk=RRF_C).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("r_vec"),
    )
    return rrf_fuse(lex_r, vec_r)
