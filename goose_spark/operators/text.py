"""Text-analysis operators over the ``documents`` table (north-star
extension, SURVEY §2.5): token counting, language-ID, quality scoring,
document fingerprinting.

All pure column algebra (no UDFs) — at 100 TB these run inside
whole-stage codegen directly over the parquet scan, shuffling only the
tiny per-group aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goose_spark.operators.textlib import (
    LANG_MARKERS,
    TOKEN_RE,
    marker_count,
    normalized_fingerprint,
    token_count_bpe,
    token_count_ws,
)
from goose_spark.plans.guards import persist_shared
from goose_spark.queries.base import register, t

_WORDS = "string_split_regex(lower(text), '\\s+')"


@register(
    "tx1_token_counts",
    f"""SELECT lang, source,
               CAST(SUM(len({_WORDS})) AS BIGINT) AS ws_tokens,
               CAST(SUM(len(regexp_extract_all(text, '{TOKEN_RE}'))) AS BIGINT) AS bpe_tokens,
               ROUND(CAST(SUM(len({_WORDS})) AS DOUBLE) / COUNT(*), 2) AS avg_ws_tokens
        FROM documents GROUP BY lang, source ORDER BY lang, source""",
    doc="Token counting: whitespace + BPE-ish regex tokenizer, aggregated "
        "per (lang, source). Pure codegen expressions over the scan.",
    tags=("llm", "text"),
)
def tx1(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    ws, bpe = token_count_ws(F.col("text")), token_count_bpe(F.col("text"))
    return (
        d.groupBy("lang", "source")
        .agg(
            F.sum(ws).cast("long").alias("ws_tokens"),
            F.sum(bpe).cast("long").alias("bpe_tokens"),
            F.round(F.sum(ws).cast("double") / F.count("*"), 2).alias("avg_ws_tokens"),
        )
        .orderBy("lang", "source")
    )


def _predicted_lang_sql() -> str:
    cnt = {
        lang: f"len(regexp_extract_all(lower(text), '{pat}'))"
        for lang, pat in LANG_MARKERS.items()
    }
    return f"""CASE
        WHEN {cnt['en']} >= {cnt['es']} AND {cnt['en']} >= {cnt['de']}
         AND {cnt['en']} >= {cnt['fr']} AND {cnt['en']} >= {cnt['zh']} THEN 'en'
        WHEN {cnt['es']} >= {cnt['de']} AND {cnt['es']} >= {cnt['fr']}
         AND {cnt['es']} >= {cnt['zh']} THEN 'es'
        WHEN {cnt['de']} >= {cnt['fr']} AND {cnt['de']} >= {cnt['zh']} THEN 'de'
        WHEN {cnt['fr']} >= {cnt['zh']} THEN 'fr'
        ELSE 'zh' END"""


@register(
    "tx2_langid_confusion",
    f"""SELECT lang, {_predicted_lang_sql()} AS predicted, COUNT(*) AS n
        FROM documents GROUP BY 1, 2 ORDER BY lang, predicted""",
    doc="Language-ID via stopword-marker counts (n-gram heuristic) with "
        "deterministic tie precedence; output is the confusion matrix "
        "against the labeled lang column.",
    tags=("llm", "text"),
)
def tx2(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    c = {lang: marker_count(F.col("text"), lang) for lang in LANG_MARKERS}
    predicted = (
        F.when(
            (c["en"] >= c["es"]) & (c["en"] >= c["de"]) & (c["en"] >= c["fr"]) & (c["en"] >= c["zh"]),
            "en",
        )
        .when((c["es"] >= c["de"]) & (c["es"] >= c["fr"]) & (c["es"] >= c["zh"]), "es")
        .when((c["de"] >= c["fr"]) & (c["de"] >= c["zh"]), "de")
        .when(c["fr"] >= c["zh"], "fr")
        .otherwise("zh")
        .alias("predicted")
    )
    return (
        d.groupBy("lang", predicted)
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted")
    )


@register(
    "tx3_quality_scores",
    f"""SELECT doc_id,
               CAST(len({_WORDS}) AS BIGINT) AS n_tokens,
               ROUND(CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
                     / length(text), 4) AS alpha_ratio,
               ROUND(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS DOUBLE)
                     / length(text), 4) AS punct_ratio,
               ROUND(CAST(length(text) AS DOUBLE) / len({_WORDS}), 4) AS avg_token_span,
               CASE WHEN length(text) >= 200 AND
                         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
                         / length(text) >= 0.7 THEN 'high'
                    WHEN length(text) >= 100 THEN 'medium'
                    ELSE 'low' END AS quality_bucket
        FROM documents ORDER BY doc_id LIMIT 200""",
    doc="Quality scoring: length / alpha / punctuation ratios + bucket — "
        "the heuristic pre-filter of an LLM data pipeline.",
    tags=("llm", "text"),
)
def tx3(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    n_tok = token_count_ws(F.col("text"))
    alpha = F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]"), F.lit(0))).cast("double")
    punct = F.size(F.regexp_extract_all(F.col("text"), F.lit("[^A-Za-z0-9 ]"), F.lit(0))).cast("double")
    length = F.length("text")
    alpha_ratio = F.round(alpha / length, 4)
    return (
        d.select(
            "doc_id",
            n_tok.alias("n_tokens"),
            alpha_ratio.alias("alpha_ratio"),
            F.round(punct / length, 4).alias("punct_ratio"),
            F.round(length.cast("double") / n_tok, 4).alias("avg_token_span"),
            F.when((length >= 200) & (alpha / length >= 0.7), "high")
            .when(length >= 100, "medium")
            .otherwise("low")
            .alias("quality_bucket"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@register(
    "tx4_fingerprints",
    """SELECT doc_id, md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
       FROM documents ORDER BY doc_id LIMIT 200""",
    doc="Document fingerprinting: md5 over normalized text (the exact-dup "
        "key used by dd1).",
    tags=("llm", "text"),
)
def tx4(spark: SparkSession, sf: str) -> DataFrame:
    return (
        t(spark, sf, "documents")
        .select("doc_id", normalized_fingerprint(F.col("text")).alias("fp"))
        .orderBy("doc_id")
        .limit(200)
    )


@register(
    "tx5_tfidf_top_terms",
    f"""WITH toks AS (
          SELECT doc_id, lang, unnest({_WORDS}) AS tok FROM documents),
        tf AS (
          SELECT lang, tok, COUNT(*) AS n_tok,
                 COUNT(DISTINCT doc_id) AS df_docs
          FROM toks WHERE tok <> '' GROUP BY lang, tok),
        nl AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
        scored AS (
          SELECT tf.lang, tok, CAST(n_tok AS BIGINT) AS n_tok,
                 ROUND(n_tok * ln(CAST(n_docs AS DOUBLE) / df_docs), 6) AS tfidf,
                 ROW_NUMBER() OVER (
                   PARTITION BY tf.lang
                   ORDER BY n_tok * ln(CAST(n_docs AS DOUBLE) / df_docs) DESC, tok
                 ) AS rnk
          FROM tf JOIN nl ON nl.lang = tf.lang)
        SELECT lang, tok, n_tok, tfidf, rnk
        FROM scored WHERE rnk <= 10 ORDER BY lang, rnk""",
    doc="Per-language TF-IDF top-10 terms: corpus-frequency weighting "
        "(ln(N/df)) over the word-count shuffle tx1 already pays — the "
        "vocabulary-selection pass of a training-data pipeline. Two "
        "shuffles total ((lang,tok) agg + per-lang top-k window); at "
        "100 TB the (lang,tok) partial agg collapses the token "
        "explosion map-side, and the window runs over O(vocab) rows, "
        "never O(tokens).",
    tags=("llm", "text"),
)
def tx5(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = t(spark, sf, "documents")
    toks = (
        d.select("doc_id", "lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    tf = toks.groupBy("lang", "tok").agg(
        F.count("*").alias("n_tok"),
        F.countDistinct("doc_id").alias("df_docs"),
    )
    nl = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    score = F.col("n_tok") * F.log(F.col("n_docs").cast("double") / F.col("df_docs"))
    w = Window.partitionBy("lang").orderBy(score.desc(), "tok")
    return (
        tf.join(F.broadcast(nl), "lang")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(
            "lang", "tok", F.col("n_tok").cast("long").alias("n_tok"),
            F.round(score, 6).alias("tfidf"), "rnk",
        )
        .orderBy("lang", "rnk")
    )


_TX6_ORACLE = r"""
WITH w AS (SELECT doc_id,
                  string_split_regex(lower(text), '\s+') AS w
           FROM documents),
 s AS (SELECT doc_id, len(w) AS n_tok, len(list_distinct(w)) AS n_distinct,
              CASE WHEN len(w) >= 2
                   THEN list_transform(generate_series(1, len(w) - 1),
                                       i -> w[i] || ' ' || w[i+1])
                   ELSE [] END AS bg
       FROM w),
 bgc AS (SELECT doc_id, MAX(cnt) AS max_bg
         FROM (SELECT doc_id, b, COUNT(*) AS cnt
               FROM (SELECT doc_id, unnest(bg) AS b FROM s)
               GROUP BY doc_id, b)
         GROUP BY doc_id)
SELECT s.doc_id, n_tok,
       ROUND(1 - CAST(n_distinct AS DOUBLE) / n_tok, 4) AS dup_word_frac,
       ROUND(CAST(COALESCE(max_bg, 0) AS DOUBLE)
             / GREATEST(n_tok - 1, 1), 4) AS top_bigram_frac,
       CASE WHEN 1 - CAST(n_distinct AS DOUBLE) / n_tok > 0.6
              THEN 'drop_dup_words'
            WHEN CAST(COALESCE(max_bg, 0) AS DOUBLE)
                 / GREATEST(n_tok - 1, 1) > 0.05
              THEN 'drop_repeated_bigram'
            ELSE 'keep' END AS verdict
FROM s LEFT JOIN bgc ON bgc.doc_id = s.doc_id
ORDER BY s.doc_id LIMIT 200"""


@register(
    "tx6_repetition_filter",
    _TX6_ORACLE,
    doc="Gopher-style repetition quality filter (Rae et al. 2021 §A1.1 "
        "heuristics, token-based): per-doc duplicate-word fraction "
        "(1 - distinct/total) and most-frequent-bigram fraction, with a "
        "keep/drop verdict. Computed in ONE Arrow mapInPandas pass — the "
        "per-document Counter needs no token explode and no shuffle at "
        "all, so at 100 TB this is a pure map over the corpus scan "
        "(the DuckDB oracle does the equivalent unnest+group plan).",
    tags=("llm", "text"),
)
def tx6(spark: SparkSession, sf: str) -> DataFrame:
    import pandas as pd

    d = t(spark, sf, "documents").select("doc_id", "text")

    def stats(batches):
        import re
        from collections import Counter

        ws = re.compile(r"\s+")
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w = ws.split(text.lower())
                n = len(w)
                bgs = Counter(zip(w, w[1:]))
                rows.append(
                    (doc_id, n, len(set(w)), max(bgs.values()) if bgs else 0)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_tok", "n_distinct", "max_bg"]
            )

    raw = d.mapInPandas(
        stats, "doc_id long, n_tok long, n_distinct long, max_bg long"
    )
    dup = F.lit(1) - F.col("n_distinct").cast("double") / F.col("n_tok")
    bgf = F.col("max_bg").cast("double") / F.greatest(
        F.col("n_tok") - 1, F.lit(1)
    )
    verdict = (
        F.when(dup > 0.6, "drop_dup_words")
        .when(bgf > 0.05, "drop_repeated_bigram")
        .otherwise("keep")
    )
    return (
        raw.select(
            "doc_id",
            "n_tok",
            F.round(dup, 4).alias("dup_word_frac"),
            F.round(bgf, 4).alias("top_bigram_frac"),
            verdict.alias("verdict"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


RARE_FREQ_LT = 5  # corpus frequency below this = "rare" token

_TX7_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
  FROM documents),
 toks2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
 vocab AS (SELECT tok, COUNT(*) AS c FROM toks2 GROUP BY tok)
SELECT doc_id, COUNT(*) AS n_tok,
       CAST(SUM(CASE WHEN c < {RARE_FREQ_LT} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rare,
       ROUND(CAST(SUM(CASE WHEN c < {RARE_FREQ_LT} THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 4) AS rare_ratio,
       CAST(MIN(c) AS BIGINT) AS min_freq
FROM toks2 JOIN vocab USING (tok)
GROUP BY doc_id ORDER BY doc_id LIMIT 200"""


@register(
    "tx7_rare_token_ratio",
    _TX7_ORACLE,
    doc="Rare-token (OOV-rate) quality score: per-doc count/ratio of "
        "tokens whose corpus frequency is below a threshold, plus the "
        "rarest frequency seen — the integer-exact stand-in for an LM "
        "perplexity filter (CCNet-style), trained on the corpus itself. "
        "Token explode → corpus-vocabulary join on tok → per-doc agg: "
        "the vocabulary aggregate partially combines map-side, the "
        "tok-keyed join and the doc_id agg are ordinary hash shuffles, "
        "and every output is an integer or an exact int ratio — no "
        "float summation order anywhere, so it hash-matches at any "
        "parallelism.",
    tags=("llm", "text"),
)
def tx7(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    rare = (F.col("c") < RARE_FREQ_LT).cast("long")
    return (
        toks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum(rare).alias("n_rare"),
            F.round(F.sum(rare).cast("double") / F.count("*"), 4).alias("rare_ratio"),
            F.min("c").alias("min_freq"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


# ---------------------------------------------------------------------------
# tx10 — winnowing fingerprints (rolling-hash document fingerprinting)
# ---------------------------------------------------------------------------

_WIN_K = 5  # k-gram width (tokens per hash)
_WIN_W = 4  # winnowing window (hashes per min-selection)

_TX10_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk
              FROM documents),
kg AS (SELECT doc_id,
              list_transform(generate_series(1, len(tk) - {_WIN_K - 1}),
                             i -> md5(array_to_string(tk[i:i+{_WIN_K - 1}], ' '))) AS h
       FROM toks WHERE len(tk) >= {_WIN_K}),
win AS (SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(h) - {_WIN_W - 1}),
                   i -> list_min(h[i:i+{_WIN_W - 1}]))) AS fps
        FROM kg WHERE len(h) >= {_WIN_W})
SELECT doc_id, len(fps) AS n_fingerprints,
       md5(array_to_string(list_sort(fps), ',')) AS fp_digest
FROM win ORDER BY doc_id LIMIT 400"""


#: session cache for the winnowing fingerprint table — the O(tokens)
#: md5-per-k-gram kernel is the most expensive pure-compute scan in the
#: text family and THREE plan legs consume its output (tx10's digest,
#: tx12's inverted index AND tx12's join-back side); without
#: memoization the kernel executes three times per sweep (~2.5 s each,
#: r13 bench). Keyed (applicationId, sf); at 100 TB the same role is
#: played by a parquet checkpoint of (doc_id, fps).
_WINNOW_CACHE: dict = {}


def winnow_fps(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, fps array<string>) — each doc's distinct winnowing
    fingerprints (_WIN_K-token grams, _WIN_W-hash min-selection window),
    computed once per session."""
    from goose_spark.operators.cache import get_or_persist
    from goose_spark.operators.textlib import words

    def build() -> DataFrame:
        d = t(spark, sf, "documents")
        tk = words(F.col("text"))
        base = d.select("doc_id", tk.alias("tk")).filter(F.size("tk") >= _WIN_K)
        kgram = F.transform(
            F.sequence(F.lit(1), F.size("tk") - (_WIN_K - 1)),
            lambda i: F.md5(F.array_join(F.slice("tk", i, _WIN_K), " ")),
        )
        h = base.select("doc_id", kgram.alias("h")).filter(F.size("h") >= _WIN_W)
        mins = F.transform(
            F.sequence(F.lit(1), F.size("h") - (_WIN_W - 1)),
            lambda i: F.array_min(F.slice("h", i, _WIN_W)),
        )
        return h.select("doc_id", F.array_distinct(mins).alias("fps"))

    return get_or_persist(_WINNOW_CACHE, spark, sf, build, label="winnow_fps")



@register(
    "tx10_winnowing",
    _TX10_ORACLE,
    doc=f"Winnowing document fingerprints (Schleimer et al. 2003, the "
        f"MOSS rolling-hash scheme): {_WIN_K}-gram hashes, minimum per "
        f"{_WIN_W}-hash sliding window, distinct mins = the fingerprint "
        f"set. Guarantees any shared run of >= {_WIN_K + _WIN_W - 1} "
        f"tokens yields a shared fingerprint — the locality property "
        f"md5-of-whole-doc (tx4) lacks. Map-only JVM higher-order "
        f"functions; the digest pins the exact fingerprint set. At "
        f"100 TB the (fingerprint -> doc) inverted index this feeds is "
        f"one explode + groupBy, the same shape as dd2's band index. "
        f"The fingerprint table itself is session-cached (winnow_fps — "
        f"shared with tx12's two consumers; bench attributes its build "
        f"in cache_builds).",
    tags=("llm", "text"),
)
def tx10(spark: SparkSession, sf: str) -> DataFrame:
    return (
        winnow_fps(spark, sf)
        .select(
            "doc_id",
            F.size("fps").cast("long").alias("n_fingerprints"),
            F.md5(F.array_join(F.array_sort("fps"), ",")).alias("fp_digest"),
        )
        .orderBy("doc_id")
        .limit(400)
    )


# ---------------------------------------------------------------------------
# tx11 — corpus report card
# ---------------------------------------------------------------------------

_TX11_ORACLE = """
WITH s AS (SELECT lang,
                  len(string_split_regex(lower(text), '\\s+')) AS n_toks,
                  n_chars,
                  md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp
           FROM documents)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(MIN(n_toks) AS BIGINT) AS min_toks,
       CAST(MAX(n_toks) AS BIGINT) AS max_toks,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_toks), 4) AS chars_per_token,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS distinct_docs,
       ROUND(1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*), 4) AS dup_rate
FROM s GROUP BY lang ORDER BY lang"""


@register(
    "tx11_corpus_report",
    _TX11_ORACLE,
    doc="Corpus report card — the first query a data engineer runs on a "
        "new dump: per-language doc/token volumes, token-length extremes, "
        "chars-per-token (a tokenizer sanity signal), and the exact-dup "
        "rate via normalized fingerprints. One scan, one (lang) "
        "hash-agg; the COUNT(DISTINCT fp) expands per lang but stays "
        "map-side-combinable, and at 100 TB the same report runs per "
        "dump partition and unions.",
    tags=("llm", "text"),
)
def tx11(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.textlib import normalized_fingerprint, token_count_ws

    d = t(spark, sf, "documents")
    s = d.select(
        "lang",
        token_count_ws(F.col("text")).alias("n_toks"),
        "n_chars",
        normalized_fingerprint(F.col("text")).alias("fp"),
    )
    return (
        s.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.min("n_toks").alias("min_toks"),
            F.max("n_toks").alias("max_toks"),
            F.round(
                F.sum("n_chars").cast("double") / F.sum("n_toks"), 4
            ).alias("chars_per_token"),
            F.count_distinct("fp").alias("distinct_docs"),
            F.round(
                F.lit(1.0) - F.count_distinct("fp").cast("double") / F.count("*"), 4
            ).alias("dup_rate"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# tx12 — duplicated-span detection (winnowing inverted index)
# ---------------------------------------------------------------------------

_TX12_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk
              FROM documents),
kg AS (SELECT doc_id,
              list_transform(generate_series(1, len(tk) - {_WIN_K - 1}),
                             i -> md5(array_to_string(tk[i:i+{_WIN_K - 1}], ' '))) AS h
       FROM toks WHERE len(tk) >= {_WIN_K}),
win AS (SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(h) - {_WIN_W - 1}),
                   i -> list_min(h[i:i+{_WIN_W - 1}]))) AS fps
        FROM kg WHERE len(h) >= {_WIN_W}),
fp AS (SELECT doc_id, unnest(fps) AS f FROM win),
shared AS (SELECT f FROM fp GROUP BY f HAVING COUNT(DISTINCT doc_id) >= 2)
SELECT p.doc_id,
       COUNT(*) AS n_fps,
       CAST(COUNT(s.f) AS BIGINT) AS shared_fps,
       ROUND(CAST(COUNT(s.f) AS DOUBLE) / COUNT(*), 4) AS dup_span_ratio
FROM fp p LEFT JOIN shared s ON p.f = s.f
GROUP BY p.doc_id ORDER BY p.doc_id LIMIT 400"""


@register(
    "tx12_duplicate_spans",
    _TX12_ORACLE,
    doc=f"Duplicated-SPAN detection (the exact-substring dedup family of "
        f"Lee et al. 2022, approximated at winnowing granularity): every "
        f"shared token run of >= {_WIN_K + _WIN_W - 1} words is caught by "
        f"a shared fingerprint (tx10's locality guarantee), so a doc's "
        f"share of corpus-duplicated fingerprints measures how much of "
        f"it is boilerplate/copied text — the signal used to EXCISE "
        f"repeated spans rather than drop whole near-dup docs (dd2-dd5 "
        f"operate at document granularity; this operates inside them). "
        f"Plan: the session-cached winnow_fps table (kernel runs once per "
        f"session, shared with tx10 and this query's two plan legs), "
        f"one explode, one (fp) hash-agg for the inverted index, one "
        f"join back, one (doc) agg — the dd2 band-index shape, no "
        f"quadratic stage at any scale.",
    tags=("llm", "dedup"),
)
def tx12(spark: SparkSession, sf: str) -> DataFrame:
    fp = winnow_fps(spark, sf).select(
        "doc_id", F.explode("fps").alias("f")
    )
    shared = (
        fp.groupBy("f")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("f", F.lit(1).alias("_shared"))
    )
    return (
        fp.join(shared, "f", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_fps"),
            F.count("_shared").alias("shared_fps"),
            F.round(
                F.count("_shared").cast("double") / F.count("*"), 4
            ).alias("dup_span_ratio"),
        )
        .orderBy("doc_id")
        .limit(400)
    )


@register(
    "tx17_keyword_tfidf",
    f"""WITH tok AS (
          SELECT doc_id, unnest({_WORDS}) AS token FROM documents),
        tf AS (
          SELECT doc_id, token, COUNT(*) AS tf
          FROM tok WHERE token <> '' GROUP BY doc_id, token),
        df AS (
          SELECT token, COUNT(DISTINCT doc_id) AS df
          FROM tok WHERE token <> '' GROUP BY token),
        n AS (SELECT COUNT(*) AS n FROM documents),
        ranked AS (
          SELECT tf.doc_id, tf.token, tf.tf, df.df,
                 ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) AS score,
                 ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                    ORDER BY tf.tf DESC, df.df, tf.token) AS rnk
          FROM tf JOIN df USING (token) CROSS JOIN n)
        SELECT doc_id, CAST(rnk AS INT) AS rnk, token,
               tf, df, score
        FROM ranked WHERE rnk <= 3 AND doc_id < 200
        ORDER BY doc_id, rnk""",
    doc="Per-document keyword extraction: top-3 tokens by TF-IDF with an "
        "EXACT-INTEGER rank order (tf DESC, corpus df ASC, token) so "
        "both engines agree bit-for-bit; the displayed score "
        "tf·ln(N/df) is rounded to 4 decimals. Plan: one token explode "
        "feeds both the per-doc tf agg and the corpus df agg "
        "(ReuseExchange), df joins back token-keyed, N broadcast as a "
        "1-row agg — per-doc window over tf rows only. The "
        "summarization/indexing silhouette over the documents table.",
    tags=("llm", "text"),
)
def tx17(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from goose_spark.operators.textlib import words

    d = t(spark, sf, "documents")
    tok = (
        d.select("doc_id", F.explode(words(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_ = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), "df", "token"
    )
    return (
        tf.join(df_, "token")
        .join(F.broadcast(n))
        .withColumn("rnk", F.row_number().over(w))
        .filter((F.col("rnk") <= 3) & (F.col("doc_id") < 200))
        .select(
            "doc_id", "rnk", "token", "tf", "df",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 4
            ).alias("score"),
        )
        .orderBy("doc_id", "rnk")
    )


# ---------------------------------------------------------------------------
# tx18 — PMI collocations (phrase mining)
# ---------------------------------------------------------------------------

PMI_MIN_COUNT = 5  # bigrams rarer than this are PMI noise


_TX18_ORACLE = rf"""
WITH tk AS (
  SELECT doc_id,
         list_filter({_WORDS}, x -> x <> '') AS w
  FROM documents),
bg AS (
  SELECT unnest(list_transform(range(1, len(w)),
                               i -> struct_pack(a := w[i], b := w[i + 1]))) AS p
  FROM tk),
big AS (SELECT p.a AS a, p.b AS b, COUNT(*) AS c_ab FROM bg GROUP BY 1, 2),
uni AS (
  SELECT tok, COUNT(*) AS c
  FROM (SELECT unnest(list_filter({_WORDS}, x -> x <> '')) AS tok
        FROM documents)
  GROUP BY tok),
tot AS (SELECT (SELECT SUM(c) FROM uni) AS t_tok,
               (SELECT SUM(c_ab) FROM big) AS t_big)
SELECT a, b, c_ab,
       ua.c AS c_a, ub.c AS c_b,
       ROUND((CAST(c_ab AS DOUBLE) / t_big)
             / ((CAST(ua.c AS DOUBLE) / t_tok)
                * (CAST(ub.c AS DOUBLE) / t_tok)), 4) AS pmi_ratio
FROM big JOIN uni ua ON ua.tok = a JOIN uni ub ON ub.tok = b, tot
WHERE c_ab >= {PMI_MIN_COUNT}
ORDER BY pmi_ratio DESC, a, b LIMIT 50"""


@register(
    "tx18_pmi_bigrams",
    _TX18_ORACLE,
    doc="PMI-ranked collocations (phrase mining): adjacent-token bigram "
        "counts vs unigram expectation — pmi_ratio = p(ab)/(p(a)p(b)), "
        "the exp of pointwise mutual information, reported as the exact "
        "ratio of integer counts so no transcendental function touches "
        "the hash-matched output. Bigrams built JVM-side from the token "
        "array (transform over an index sequence — no Python, no "
        "per-row UDF), then two map-side-combinable hash-aggs; the "
        "count-keyed joins back to the unigram vocabulary are ordinary "
        "token-hash shuffles and the top-50 is a TakeOrdered O(k) "
        "funnel. The phrase-discovery stage of a tokenizer/quality "
        "pipeline (Mikolov-style word2phrase uses this exact score "
        "with a discount).",
    tags=("llm", "text"),
)
def tx18(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.textlib import words

    d = t(spark, sf, "documents")
    # tokenize the corpus ONCE: the token-array frame feeds BOTH the
    # bigram branch and the unigram branch, and each previously re-ran
    # the regex tokenizer over every document (2 full tokenize passes
    # per query — the dominant cost; guide §1.2). persist_shared
    # materializes the arrays a single time; both aggs read the cache
    # (released by sweep callers between queries), r15.
    tk = persist_shared(
        d.select(
            F.filter(words(F.col("text")), lambda x: x != "").alias("w")
        )
    )
    # size guard matters: Spark's sequence(0, -1) REVERSES instead of
    # returning empty, so a 0/1-token doc would index w[-1] → nulls
    bigrams = (
        tk.filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2), "
                    "i -> named_struct('a', w[i], 'b', w[i + 1]))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    # each count table feeds BOTH its total and the score joins;
    # persist_shared computes the explode+agg once and keeps the
    # lineage recomputable (O(vocab)/O(bigram-types) rows — too big
    # for a driver-local relation, wrong shape for a lazy checkpoint,
    # which re-executes the full lineage at build: see plans/guards.py)
    big = persist_shared(
        bigrams.groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    )
    uni = persist_shared(
        tk.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    tot = uni.agg(F.sum("c").alias("t_tok")).crossJoin(
        big.agg(F.sum("c_ab").alias("t_big"))
    )
    ratio = F.round(
        (F.col("c_ab").cast("double") / F.col("t_big"))
        / (
            (F.col("c_a").cast("double") / F.col("t_tok"))
            * (F.col("c_b").cast("double") / F.col("t_tok"))
        ),
        4,
    )
    return (
        big.filter(F.col("c_ab") >= PMI_MIN_COUNT)
        .join(uni.select(F.col("tok").alias("a"), F.col("c").alias("c_a")), "a")
        .join(uni.select(F.col("tok").alias("b"), F.col("c").alias("c_b")), "b")
        .join(F.broadcast(tot))
        .select("a", "b", "c_ab", "c_a", "c_b", ratio.alias("pmi_ratio"))
        .orderBy(F.col("pmi_ratio").desc(), "a", "b")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# tx19 — lexical richness (type-token / hapax profile per language)
# ---------------------------------------------------------------------------

_TX19_ORACLE = rf"""
WITH toks AS (
  SELECT lang, unnest(list_filter({_WORDS}, x -> x <> '')) AS tok
  FROM documents),
vocab AS (SELECT lang, tok, COUNT(*) AS c FROM toks GROUP BY lang, tok)
SELECT lang,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       COUNT(*) AS n_types,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS ttr,
       ROUND(CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS hapax_ratio
FROM vocab GROUP BY lang ORDER BY lang"""


@register(
    "tx19_lexical_richness",
    _TX19_ORACLE,
    doc="Lexical-richness profile per language: type-token ratio and "
        "hapax-legomenon ratio — the vocabulary-health gauges a corpus "
        "audit reads before tokenizer training (a crawl slice whose TTR "
        "collapses is template/boilerplate spam; one whose hapax ratio "
        "explodes is OCR noise). COUNT(DISTINCT) is expressed as the "
        "two-level (lang, tok) hash-agg, so both levels partially "
        "aggregate map-side and the final shuffle carries only O(vocab) "
        "count rows — never a distinct over raw token instances. All "
        "outputs integers or exact int ratios.",
    tags=("llm", "text"),
)
def tx19(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.textlib import words

    d = t(spark, sf, "documents")
    toks = d.select(
        "lang", F.explode(words(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    vocab = toks.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    hapax = F.sum((F.col("c") == 1).cast("long"))
    return (
        vocab.groupBy("lang")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").alias("n_types"),
            hapax.alias("hapax"),
            F.round(F.count("*").cast("double") / F.sum("c"), 6).alias("ttr"),
            F.round(hapax.cast("double") / F.count("*"), 6).alias("hapax_ratio"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# tx20 — vocabulary growth curve (Heaps' law profile)
# ---------------------------------------------------------------------------

_TX20_ORACLE = rf"""
WITH mx AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
tok AS (
  SELECT doc_id, unnest(list_filter({_WORDS}, x -> x <> '')) AS tok
  FROM documents),
db AS (SELECT (CAST(doc_id AS BIGINT) * 10) // n AS b, COUNT(*) AS d
       FROM documents, mx GROUP BY 1),
tb AS (SELECT (CAST(doc_id AS BIGINT) * 10) // n AS b, COUNT(*) AS tk
       FROM tok, mx GROUP BY 1),
nb AS (SELECT (CAST(fd AS BIGINT) * 10) // n AS b, COUNT(*) AS nt
       FROM (SELECT tok, MIN(doc_id) AS fd FROM tok GROUP BY tok), mx
       GROUP BY 1)
SELECT CAST((b + 1) * 10 AS BIGINT) AS pct,
       CAST(SUM(d) OVER w AS BIGINT) AS n_docs,
       CAST(SUM(tk) OVER w AS BIGINT) AS n_tokens,
       CAST(SUM(COALESCE(nt, 0)) OVER w AS BIGINT) AS n_types,
       CAST(COALESCE(nt, 0) AS BIGINT) AS new_types,
       ROUND(CAST(SUM(COALESCE(nt, 0)) OVER w AS DOUBLE)
             / SUM(tk) OVER w, 6) AS ttr
FROM db JOIN tb USING (b) LEFT JOIN nb USING (b)
WINDOW w AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY pct"""


@register(
    "tx20_vocab_growth",
    _TX20_ORACLE,
    doc="Vocabulary-growth (Heaps' law) curve: cumulative distinct types "
        "vs cumulative token instances at corpus deciles, plus the "
        "NEW-types delta per decile — the tokenizer-sizing / corpus-"
        "novelty gauge (a crawl slice whose new_types flatlines is "
        "adding no vocabulary; one that explodes is noise). Cumulative "
        "distinct is NOT computed as a running set: each type collapses "
        "to its FIRST-occurrence doc (one token-keyed min-agg), docs and "
        "first-occurrences bucket into deciles by pure row arithmetic "
        "((doc_id*10) div n — no inequality join, no NestedLoop), and "
        "the cumulative curve is a running sum over the 10 bucket rows. "
        "Scale shape: one explode + two map-side-combinable hash-aggs "
        "over O(vocab)/O(docs) rows; the window touches 10 rows. All "
        "outputs integers or exact int ratios.",
    tags=("llm", "text"),
)
def tx20(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from goose_spark.operators.textlib import words

    d = t(spark, sf, "documents")
    # n is ONE scalar — collect it and fold it into the bucket
    # expression as a literal: removes two broadcast joins entirely
    # (the join existed only to carry the scalar). doc_id is cast to
    # long BEFORE the *10 so the bucket arithmetic cannot wrap at
    # >~214M docs if a source ships 32-bit ids (the oracle casts too).
    n_row = d.agg((F.max("doc_id") + 1).alias("n")).collect()[0]["n"]
    if n_row is None:
        # empty documents table: max() is NULL — return the empty curve
        # with the output schema instead of TypeError-ing on int(None)
        # (r12 advice; the earlier broadcast-join form degraded to empty)
        return spark.createDataFrame(
            [],
            "pct long, n_docs long, n_tokens long, n_types long, "
            "new_types long, ttr double",
        )
    n_docs = int(n_row)
    bucket = F.expr(f"(CAST(doc_id AS BIGINT) * 10) div {n_docs}")
    tok = d.select(
        "doc_id", F.explode(words(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    db = d.groupBy(bucket.alias("b")).agg(F.count("*").alias("d"))
    # ONE pass over the token explode: per-(tok, bucket) counts carry
    # everything both curves need — token volume per bucket (sum) and
    # the first-occurrence bucket per type (min b == bucket of min
    # doc_id, because the bucket expression is monotone in doc_id).
    # O(vocab x 10) rows, shared by two consumers → persist_shared
    # (recomputable; NOT a lazy checkpoint — see plans/guards.py).
    tk1 = persist_shared(
        tok.groupBy("tok", bucket.alias("b")).agg(F.count("*").alias("c"))
    )
    tb = tk1.groupBy("b").agg(F.sum("c").alias("tk"))
    nb = (
        tk1.groupBy("tok")
        .agg(F.min("b").alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("nt"))
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    return (
        db.join(tb, "b").join(nb, "b", "left")
        .withColumn("nt", F.coalesce("nt", F.lit(0)))
        .select(
            ((F.col("b") + 1) * 10).cast("long").alias("pct"),
            F.sum("d").over(w).cast("long").alias("n_docs"),
            F.sum("tk").over(w).cast("long").alias("n_tokens"),
            F.sum("nt").over(w).cast("long").alias("n_types"),
            F.col("nt").cast("long").alias("new_types"),
            F.round(
                F.sum("nt").over(w).cast("double") / F.sum("tk").over(w), 6
            ).alias("ttr"),
        )
        .orderBy("pct")
    )


# ---------------------------------------------------------------------------
# tx21 — duplication audit per source (lead-prefix dup + cross-source rates)
# ---------------------------------------------------------------------------

#: Leading-token window the prefix fingerprint covers. Exact full-text
#: dups are rare at small SFs; shared LEADS (boilerplate openings,
#: syndicated lead paragraphs) are the signal a crawl audit reads.
LEAD_TOKENS = 8

_TX21_ORACLE = rf"""
WITH f AS (
  SELECT doc_id, source,
         md5(array_to_string(
               list_slice({_WORDS}, 1, {LEAD_TOKENS}), ' ')) AS fp
  FROM documents),
c AS (SELECT fp, COUNT(*) AS n, COUNT(DISTINCT source) AS ns
      FROM f GROUP BY fp)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT f.fp) AS BIGINT) AS n_fingerprints,
       CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
       CAST(SUM(CASE WHEN c.ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS cross_source_docs,
       ROUND(CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS dup_rate
FROM f JOIN c USING (fp)
GROUP BY source ORDER BY source"""


@register(
    "tx21_dup_audit_by_source",
    _TX21_ORACLE,
    doc=f"Per-source duplication audit on the LEAD-prefix fingerprint "
        f"(md5 of the first {LEAD_TOKENS} tokens — the C4-style "
        f"boilerplate-opening / syndicated-lead signal, which fires "
        f"long before full-text dups do): for every source, how many "
        f"of its docs share a lead with ANY other doc (dup_docs / "
        f"dup_rate) and how many collide across source boundaries "
        f"(cross_source_docs — the syndication/mirror signal that "
        f"tells a crawl team which domains republish each other). The "
        f"provenance-level report on top of dd1's mechanism: one "
        f"fingerprint hash-agg (count + distinct-source count collapse "
        f"map-side), one fp-keyed join back, one source rollup — the "
        f"fp shuffle IS dd1's scale mechanism, and the count table is "
        f"O(unique fingerprints). All outputs integers or exact int "
        f"ratios.",
    tags=("llm", "text"),
)
def tx21(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.textlib import words

    d = t(spark, sf, "documents")
    lead_fp = F.md5(
        F.concat_ws(" ", F.slice(words(F.col("text")), 1, LEAD_TOKENS))
    )
    f = d.select("doc_id", "source", lead_fp.alias("fp"))
    c = f.groupBy("fp").agg(
        F.count("*").alias("n"), F.count_distinct("source").alias("ns")
    )
    return (
        f.join(c, "fp")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("fp").cast("long").alias("n_fingerprints"),
            F.sum((F.col("n") > 1).cast("long")).alias("dup_docs"),
            F.sum((F.col("ns") > 1).cast("long")).alias("cross_source_docs"),
            F.round(
                F.sum((F.col("n") > 1).cast("long")).cast("double")
                / F.count("*"), 6,
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# tx22 — OOV rate against the top-V corpus vocabulary (quality signal)
# ---------------------------------------------------------------------------

#: Vocabulary size the OOV rate is measured against. Rank cut is
#: deterministic in both engines: ORDER BY count DESC, token ASC.
VOCAB_V = 1000

_TX22_ORACLE = rf"""
WITH toks AS (
  SELECT lang, source, unnest(list_filter({_WORDS}, x -> x <> '')) AS tok
  FROM documents),
vc AS (SELECT tok FROM (
         SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
         ORDER BY c DESC, tok LIMIT {VOCAB_V})),
f AS (SELECT lang, source, tok,
             CASE WHEN vc.tok IS NULL THEN 1 ELSE 0 END AS oov
      FROM toks LEFT JOIN vc USING (tok))
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_tok,
       CAST(SUM(oov) AS BIGINT) AS n_oov,
       ROUND(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 6) AS oov_rate,
       CAST(COUNT(DISTINCT CASE WHEN oov = 1 THEN tok END) AS BIGINT)
         AS oov_types
FROM f GROUP BY lang, source ORDER BY lang, source"""


@register(
    "tx22_oov_rate",
    _TX22_ORACLE,
    doc=f"Out-of-vocabulary rate per (lang, source) against the top-"
        f"{VOCAB_V} corpus vocabulary — the CCNet/Gopher-style quality "
        f"signal (a slice whose tokens mostly miss the head vocabulary "
        f"is boilerplate, code, or noise; one at ~0 adds no lexical "
        f"novelty — read WITH tx20's new-types curve). Deterministic "
        f"vocabulary cut: ORDER BY count DESC, token ASC LIMIT "
        f"{VOCAB_V}, identical in both engines. Scale shape: one "
        f"token hash-agg (map-side combinable) feeding a TakeOrdered "
        f"O(V) head, the {VOCAB_V}-row vocabulary broadcast back onto "
        f"the token stream as a left join, one (lang, source) agg — "
        f"the corpus is never shuffled by token twice, and the "
        f"token explode stays map-side into the first partial agg.",
    tags=("llm", "text"),
)
def tx22(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.textlib import words

    d = t(spark, sf, "documents")
    toks = d.select(
        "lang", "source", F.explode(words(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    vocab = (
        toks.groupBy("tok").agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "tok")
        .limit(VOCAB_V)
        .select("tok", F.lit(1).alias("_in"))
    )
    oov = F.when(F.col("_in").isNull(), 1).otherwise(0)
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_tok"),
            F.sum(oov).cast("long").alias("n_oov"),
            F.round(F.sum(oov).cast("double") / F.count("*"), 6).alias("oov_rate"),
            F.count_distinct(
                F.when(oov == 1, F.col("tok"))
            ).cast("long").alias("oov_types"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# tx23 — Zipf rank-frequency slope per source (corpus-health regression)
# ---------------------------------------------------------------------------

#: regression window: the head of the rank-frequency curve (Zipf's law
#: holds in the head; the tail bends under tokenization artifacts)
ZIPF_HEAD_R = 200

_TX23_ORACLE = f"""WITH toks AS (
  SELECT source, unnest({_WORDS}) AS tok FROM documents),
 tf AS (
  SELECT source, tok, COUNT(*) AS c FROM toks WHERE tok <> ''
  GROUP BY source, tok),
 ranked AS (
  SELECT source, c,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY c DESC, tok) AS r
  FROM tf)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_ranked,
       ROUND(covar_pop(ln(r), ln(c)) / var_pop(ln(r)), 4) AS zipf_slope,
       ROUND(POWER(corr(ln(r), ln(c)), 2), 4) AS fit_r2
FROM ranked WHERE r <= {ZIPF_HEAD_R}
GROUP BY source ORDER BY source"""


@register(
    "tx23_zipf_slope",
    _TX23_ORACLE,
    doc=f"Zipf rank-frequency slope per source: least-squares fit of "
        f"ln(freq) on ln(rank) over each source's top-{ZIPF_HEAD_R} "
        f"tokens (slope = covar_pop/var_pop, fit = corr²) — the "
        f"corpus-health regression (natural text sits near slope −1 "
        f"with high fit; templated/boilerplate slices flatten the head, "
        f"token-noise slices steepen it and kill the fit — the Wenzek "
        f"CCNet-style distribution gauge, read with tx16's drift PSI). "
        f"Deterministic rank: ROW_NUMBER ordered (count DESC, token "
        f"ASC), identical in both engines. Scale shape: one map-side-"
        f"combinable (source, token) hash-agg; the per-source head cut "
        f"is a rank filter on a (source)-partitioned window — "
        f"WindowGroupLimit pushes the top-{ZIPF_HEAD_R} bound into each "
        f"map partition, so the regression input is O(sources × "
        f"{ZIPF_HEAD_R}) rows and the fit itself is one tiny agg.",
    tags=("llm", "text"),
)
def tx23(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from goose_spark.operators.textlib import words

    d = t(spark, sf, "documents")
    tf = (
        d.select("source", F.explode(words(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("source").orderBy(F.col("c").desc(), "tok")
    ranked = (
        tf.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= ZIPF_HEAD_R)
        .select("source", F.log(F.col("r")).alias("lr"),
                F.log(F.col("c")).alias("lc"))
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_ranked"),
            F.round(
                F.covar_pop("lr", "lc") / F.var_pop("lr"), 4
            ).alias("zipf_slope"),
            F.round(F.pow(F.corr("lr", "lc"), 2), 4).alias("fit_r2"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# tx24 — quality-filter calibration sweep (survival CDF over thresholds)
# ---------------------------------------------------------------------------

#: alpha-ratio thresholds swept by the calibration table
_TX24_GRID = [0.50, 0.55, 0.60, 0.65, 0.70, 0.75, 0.80, 0.85, 0.90]

_TX24_ORACLE = f"""WITH d AS (
  SELECT CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
           / length(text) AS alpha_ratio,
         len({_WORDS}) AS n_toks
  FROM documents),
 tot AS (SELECT COUNT(*) AS nd, SUM(n_toks) AS nt FROM d),
 grid AS (SELECT CAST(unnest([{', '.join(str(x) for x in _TX24_GRID)}]) AS DOUBLE) AS threshold)
SELECT threshold,
       CAST(SUM(CASE WHEN alpha_ratio >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS surviving_docs,
       ROUND(CAST(SUM(CASE WHEN alpha_ratio >= threshold THEN 1 ELSE 0 END) AS DOUBLE)
             / MAX(nd), 6) AS doc_survival,
       CAST(SUM(CASE WHEN alpha_ratio >= threshold THEN n_toks ELSE 0 END) AS BIGINT) AS surviving_tokens,
       ROUND(CAST(SUM(CASE WHEN alpha_ratio >= threshold THEN n_toks ELSE 0 END) AS DOUBLE)
             / MAX(nt), 6) AS token_survival
FROM grid CROSS JOIN d CROSS JOIN tot
GROUP BY threshold ORDER BY threshold"""


@register(
    "tx24_filter_calibration",
    _TX24_ORACLE,
    doc=f"Quality-filter calibration sweep: for each alpha-ratio "
        f"threshold in a {len(_TX24_GRID)}-point grid, the doc AND "
        f"token survival rates — the table a pipeline owner reads to "
        f"pick the quality cutoff (the Gopher/CCNet filter-tuning loop: "
        f"too low keeps boilerplate, too high burns real tokens; the "
        f"knee of the token-survival curve is the defensible setting). "
        f"Spark plan: per-doc (alpha_ratio, n_toks) computed once in "
        f"the scan, the threshold grid EXPLODED against it ({len(_TX24_GRID)} "
        f"literal rows per doc — a map-side constant fan-out, not a "
        f"join), one hash-agg to O(grid) rows; corpus totals ride the "
        f"SAME aggregate because every doc lands in every threshold "
        f"group exactly once, so the group's count(*)/sum(n_toks) ARE "
        f"nd/nt — no second documents scan (VERDICT r13 directive #2). "
        f"One scan, one shuffle of {len(_TX24_GRID)} x partials at any "
        f"corpus size.",
    tags=("llm", "text"),
)
def tx24(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    alpha = (
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]"), F.lit(0)))
        .cast("double") / F.length("text")
    )
    per_doc = d.select(
        alpha.alias("alpha_ratio"),
        token_count_ws(F.col("text")).alias("n_toks"),
    )
    grid = F.array(*[F.lit(x) for x in _TX24_GRID])
    surv_docs = F.sum(
        F.when(F.col("alpha_ratio") >= F.col("threshold"), 1).otherwise(0)
    ).cast("long")
    surv_toks = F.sum(
        F.when(F.col("alpha_ratio") >= F.col("threshold"), F.col("n_toks"))
        .otherwise(F.lit(0))
    ).cast("long")
    # corpus totals fold into the grid aggregate: the explode puts every
    # doc in every threshold group exactly once, so per-group count(*)
    # and sum(n_toks) equal nd and nt — single documents scan, no
    # second pass / crossJoin (VERDICT r13 directive #2)
    return (
        per_doc.select("alpha_ratio", "n_toks",
                       F.explode(grid).alias("threshold"))
        .groupBy("threshold")
        .agg(surv_docs.alias("surviving_docs"),
             surv_toks.alias("surviving_tokens"),
             F.count("*").alias("nd"),
             F.sum("n_toks").alias("nt"))
        .select(
            "threshold",
            "surviving_docs",
            F.round(F.col("surviving_docs").cast("double") / F.col("nd"), 6)
            .alias("doc_survival"),
            "surviving_tokens",
            F.round(F.col("surviving_tokens").cast("double") / F.col("nt"), 6)
            .alias("token_survival"),
        )
        .orderBy("threshold")
    )
