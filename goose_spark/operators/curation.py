"""Corpus-curation operators a large-scale training-data pipeline runs
between dedup and packing: benchmark decontamination (n-gram overlap),
temperature-weighted mixture resampling, and PII scrubbing.

These extend the engine beyond the reference's job-queue surface (the
SURVEY §2.5 north-star LLM-pipeline family); like the sp*/tx* family they are DataFrame
algebra + Arrow kernels with exact DuckDB oracles, and every rate/coin is
the portable md5-prefix device (see operators/pipeline.py docstring) so
results reproduce across engines, runs, and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goose_spark.operators.textlib import with_ngrams
from goose_spark.queries.base import register, t

# ---------------------------------------------------------------------------
# sp6 — benchmark decontamination
# ---------------------------------------------------------------------------

#: contamination shingle width. Production decontamination uses 8-13-gram
#: exact overlap (the GPT-3/PaLM recipe); the synthetic corpus' tiny
#: vocabulary makes 4-grams the width with comparable selectivity.
_DECON_N = 4
#: md5-prefix < 0x08 → ~3.1% of docs act as the held-out benchmark set.
_BENCH_LT = "08"

_SP6_ORACLE = f"""
WITH toks AS (SELECT doc_id, lang,
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b,
                     string_split_regex(lower(text), '\\s+') AS tk
              FROM documents),
sh AS (SELECT doc_id, lang, b,
              UNNEST(list_distinct(list_transform(
                  generate_series(1, len(tk) - {_DECON_N - 1}),
                  i -> array_to_string(tk[i:i+{_DECON_N - 1}], ' ')))) AS g
       FROM toks WHERE len(tk) >= {_DECON_N}),
bench AS (SELECT DISTINCT g FROM sh WHERE b < '{_BENCH_LT}')
SELECT doc_id, lang, COUNT(*) AS n_hit_grams
FROM sh WHERE b >= '{_BENCH_LT}' AND g IN (SELECT g FROM bench)
GROUP BY doc_id, lang ORDER BY doc_id"""


@register(
    "sp6_decontaminate",
    _SP6_ORACLE,
    doc=f"Benchmark decontamination: flag training documents sharing any "
        f"exact {_DECON_N}-token shingle with a held-out benchmark set "
        f"(here the ~3% md5-bucket of docs; in production, MMLU/GSM8K "
        f"etc.). Plan: one Arrow n-gram kernel pass + explode, benchmark "
        f"grams distinct then BROADCAST to the corpus-side semi-join — "
        f"benchmark suites are MBs while the corpus is TBs, so the join "
        f"ships no corpus bytes and the only shuffle is the per-doc "
        f"hit-count agg.",
    tags=("llm", "curation"),
)
def sp6(spark: SparkSession, sf: str) -> DataFrame:
    # the bench/train split depends only on doc_id, so it is applied
    # BELOW the n-gram kernel: Catalyst cannot push a filter through a
    # MapInPandas node, and with the filter above it each branch
    # tokenized the FULL corpus (2x the dominant cost). Filtering first
    # tokenizes each doc exactly once across the two branches
    # (optimization r14, guide §2.2 shuffle/compute fewer bytes).
    d = (
        t(spark, sf, "documents")
        .select("doc_id", "lang", "text")
        .withColumn("b", F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2))
    )

    def sh(side: DataFrame) -> DataFrame:
        return with_ngrams(side, _DECON_N).select(
            "doc_id", "lang", "b", F.explode("grams").alias("g")
        )

    bench = sh(d.filter(F.col("b") < _BENCH_LT)).select("g").distinct()
    return (
        sh(d.filter(F.col("b") >= _BENCH_LT))
        .join(F.broadcast(bench), "g", "left_semi")
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("n_hit_grams"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# sp7 — temperature-weighted mixture resampling
# ---------------------------------------------------------------------------

_SP7_ORACLE = """
WITH counts AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
tot AS (SELECT SUM(n_docs) AS t, MIN(n_docs) AS n_min FROM counts),
rates AS (SELECT lang, n_docs,
                 CAST(n_docs AS DOUBLE) / t AS share,
                 sqrt(CAST(n_min AS DOUBLE) / n_docs) AS rate
          FROM counts, tot),
thr AS (SELECT lang, n_docs, share, rate,
               -- LEAST(…,255) keeps rate_hex two chars for rate >= 1.0
               -- (to_hex(256) is '100'; lpad would TRUNCATE it to '10'),
               -- so the hex coin matches the Spark side even if the
               -- rate >= 1.0 short-circuit below is ever refactored away
               lpad(lower(to_hex(LEAST(CAST(FLOOR(rate * 256) AS INT), 255))), 2, '0')
                 AS rate_hex
        FROM rates),
s AS (SELECT d.lang,
             CASE WHEN r.rate >= 1.0
                       OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2)
                          < r.rate_hex
                  THEN 1 ELSE 0 END AS keep
      FROM documents d JOIN thr r ON d.lang = r.lang),
agg AS (SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(keep) AS BIGINT) AS sampled
        FROM s GROUP BY lang)
SELECT a.lang, a.n_docs, ROUND(r.share, 4) AS share,
       ROUND(r.rate, 4) AS rate, a.sampled,
       ROUND(CAST(a.sampled AS DOUBLE)
             / (SELECT SUM(sampled) FROM agg), 4) AS sampled_share
FROM agg a JOIN thr r ON a.lang = r.lang ORDER BY a.lang"""


@register(
    "sp7_mixture_sample",
    _SP7_ORACLE,
    doc="Temperature-flattened language mixture (alpha=0.5, the "
        "multilingual-LM resampling recipe): per-language acceptance "
        "rate sqrt(p_min/p_lang) keeps the rarest language whole and "
        "downsamples dominant ones toward the flattened target; the "
        "deterministic md5-prefix coin (256-level threshold, identical "
        "hex comparison in both engines) decides membership. Plan: one "
        "tiny per-lang count agg, the 5-row rate table broadcast back "
        "onto the scan, one more tiny agg — document bodies never "
        "shuffle, and the rate math runs once, not per row.",
    tags=("llm", "curation"),
)
def sp7(spark: SparkSession, sf: str) -> DataFrame:
    import math

    d = t(spark, sf, "documents").select("doc_id", "lang")
    # O(langs) driver round-trip (the q49-offsets pattern): expressing the
    # rate table as nested DataFrame branches made Catalyst re-scan the
    # source once per branch (8 scans, 9 shuffles measured); collecting the
    # per-lang counts and literal-broadcasting the 5-row rate table leaves
    # ONE scan + ONE (lang,keep) partial-agg shuffle in the plan.
    counts = {
        r["lang"]: int(r["n"])
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    out_schema = (
        "lang string, n_docs long, share double, rate double, "
        "sampled long, sampled_share double"
    )
    if not counts:
        return spark.createDataFrame([], out_schema)
    total = sum(counts.values())
    n_min = min(counts.values())
    rows = [
        (
            lang,
            n,
            n / total,
            math.sqrt(n_min / n),
            format(min(int(math.sqrt(n_min / n) * 256), 255), "02x"),
        )
        for lang, n in counts.items()
    ]
    thr = spark.createDataFrame(
        rows, "lang string, n_docs long, share double, rate double, rate_hex string"
    )
    b = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    keep = (
        F.when((F.col("rate") >= 1.0) | (b < F.col("rate_hex")), 1).otherwise(0)
    )
    agg = (
        d.join(F.broadcast(thr), "lang")
        .select("lang", "n_docs", "share", "rate", keep.alias("keep"))
        .groupBy("lang", "n_docs", "share", "rate")
        .agg(F.sum("keep").alias("sampled"))
    ).collect()
    total_sampled = sum(int(r["sampled"]) for r in agg)
    out = [
        (
            r["lang"],
            int(r["n_docs"]),
            round(r["share"], 4),
            round(r["rate"], 4),
            int(r["sampled"]),
            round(int(r["sampled"]) / total_sampled, 4),
        )
        for r in agg
    ]
    return spark.createDataFrame(out, out_schema).orderBy("lang")


# ---------------------------------------------------------------------------
# tx8 — PII scrubbing
# ---------------------------------------------------------------------------

#: RE2/Java-portable patterns: character classes + bounded reps only, no
#: lookaround or backreferences (those diverge between engines).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
#: No whitespace in the separator class and a bounded width: an
#: unbounded class with \s greedily swallowed unrelated digit runs
#: across spaces ("555-1234 2024" masked the year too), and since
#: scrub_text runs BEFORE fingerprinting on the ingest path, that
#: over-masking could merge genuinely distinct documents in dedup.
#: Trade: space-separated phones ("415 555 1234") stay unmasked.
_PHONE_RE = r"\+?[0-9][0-9()\-]{5,16}[0-9]"


def scrub_text(col: F.Column) -> F.Column:
    """The tx8 masking chain as a reusable column expression (emails
    then phones), for any pipeline stage that stores text — e.g. the
    ingest path scrubs BEFORE fingerprinting so docs differing only in
    PII dedupe together."""
    return F.regexp_replace(
        F.regexp_replace(col, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )

#: The synthetic corpus carries no PII, so the query derives a
#: deterministic PII-bearing "raw" text from each row (same expression in
#: both engines); the operator under test is the scrub kernel, and the
#: per-group digest proves the exact scrubbed bytes match.
_RAW_SQL = ("text || ' Contact: user' || CAST(doc_id AS VARCHAR)"
            " || '@mail.example.com or +1-415-555-'"
            " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'")

_TX8_ORACLE = f"""
WITH raw AS (SELECT doc_id, lang, {_RAW_SQL} AS raw FROM documents),
s AS (SELECT doc_id, lang,
             len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS n_email,
             len(regexp_extract_all(raw, '{_PHONE_RE}')) AS n_phone,
             regexp_replace(
                 regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed
      FROM raw)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
       CAST(SUM(n_phone) AS BIGINT) AS phones_redacted,
       md5(string_agg(scrubbed, chr(30) ORDER BY doc_id)) AS scrub_digest
FROM s GROUP BY lang ORDER BY lang"""


@register(
    "tx8_pii_scrub",
    _TX8_ORACLE,
    doc="PII scrubbing: mask emails and phone numbers with typed "
        "placeholders before training. Pure codegen regexp_replace chain "
        "(JVM-side, no Python anywhere) over RE2/Java-portable patterns; "
        "redaction counts come from regexp_extract_all on the same "
        "expressions, and the per-language md5 digest pins the exact "
        "scrubbed bytes against the oracle. At 100 TB this is a "
        "map-only stage — the single shuffle here is the audit agg, and "
        "a production run writes scrubbed docs straight back to parquet "
        "from the executors.",
    tags=("llm", "curation"),
)
def tx8(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" Contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-415-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("."),
    )
    s = d.select(
        "doc_id",
        "lang",
        F.size(F.regexp_extract_all(raw, F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_email"),
        F.size(F.regexp_extract_all(raw, F.lit(_PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phone"),
        scrub_text(raw).alias("scrubbed"),
    )
    digest = F.md5(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "scrubbed"))),
                lambda r: r["scrubbed"],
            ),
            "\x1e",
        )
    )
    return (
        s.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_email").alias("emails_redacted"),
            F.sum("n_phone").alias("phones_redacted"),
            digest.alias("scrub_digest"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# sp8 — deterministic epoch shuffle (global training order)
# ---------------------------------------------------------------------------

_EPOCH_SEED = "ep1"
#: first hex char of the salted hash → 16 output shards.
_N_SHARD_HEX = 1

_SP8_ORACLE = f"""
WITH h AS (SELECT doc_id,
                  md5('{_EPOCH_SEED}|' || CAST(doc_id AS VARCHAR)) AS hk
           FROM documents)
SELECT substr(hk, 1, {_N_SHARD_HEX}) AS shard, COUNT(*) AS n_docs,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY hk)) AS order_digest
FROM h GROUP BY 1 ORDER BY shard"""


@register(
    "sp8_epoch_shuffle",
    _SP8_ORACLE,
    doc=f"Deterministic global shuffle for one training epoch: every doc "
        f"keyed by md5(seed|doc_id), sharded on the key's first hex char "
        f"and ordered by the full key within each shard — a reproducible "
        f"uniform permutation with NO global sort (change the seed, get "
        f"a fresh epoch order). The digest pins the exact per-shard "
        f"sequence. At 100 TB this is repartitionByRange(hash) + "
        f"sortWithinPartitions — uniform by construction (hash keys "
        f"cannot skew), each shard writes independently, and only "
        f"O(shards) digest rows leave the executors.",
    tags=("llm", "pipeline"),
)
def sp8(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents").select("doc_id")
    hk = F.md5(
        F.concat(F.lit(f"{_EPOCH_SEED}|"), F.col("doc_id").cast("string"))
    )
    digest = F.md5(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("hk", "doc_id"))),
                lambda r: r["doc_id"].cast("string"),
            ),
            ",",
        )
    )
    return (
        d.select("doc_id", hk.alias("hk"))
        .groupBy(F.substring("hk", 1, _N_SHARD_HEX).alias("shard"))
        .agg(F.count("*").alias("n_docs"), digest.alias("order_digest"))
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# tx9 — unigram-LM surprisal scoring
# ---------------------------------------------------------------------------

_TX9_ORACLE = """
WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
              FROM documents),
 tk AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
 freq AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok),
 tot AS (SELECT SUM(cnt) AS n FROM freq)
SELECT doc_id, COUNT(*) AS n_toks,
       ROUND(AVG(ln(CAST(n AS DOUBLE) / cnt)), 6) AS surprisal
FROM tk JOIN freq USING (tok) CROSS JOIN tot
GROUP BY doc_id ORDER BY doc_id LIMIT 500"""


@register(
    "tx9_lm_surprisal",
    _TX9_ORACLE,
    doc="Unigram language-model surprisal per document (mean -ln "
        "p(token) under corpus unigram frequencies) — the CCNet-style "
        "'LM quality filter' signal: word-salad and boilerplate score "
        "away from the corpus norm. Plan: one (token) partial-agg "
        "shuffle builds the O(vocab) frequency table, the corpus total "
        "is a 1-row broadcast, and the score join is tokens⋈vocab — at "
        "100 TB the vocab side is a broadcast of the top-K table with "
        "an OOV floor, or a shuffle join if the tail must stay exact. "
        "No Python anywhere; ln parity with DuckDB follows tx5's "
        "round-6 convention.",
    tags=("llm", "text"),
)
def tx9(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.textlib import words

    d = t(spark, sf, "documents")
    tk = (
        d.select("doc_id", F.explode(words(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
    )
    freq = tk.groupBy("tok").agg(F.count("*").alias("cnt"))
    tot = freq.agg(F.sum("cnt").alias("n"))
    return (
        tk.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.round(
                F.avg(F.log(F.col("n").cast("double") / F.col("cnt"))), 6
            ).alias("surprisal"),
        )
        .orderBy("doc_id")
        .limit(500)
    )


# ---------------------------------------------------------------------------
# sp9 — overlapping chunk windows (RAG-prep)
# ---------------------------------------------------------------------------

_CHUNK_W = 32   # tokens per chunk
_CHUNK_S = 24   # stride (8-token overlap)

_SP9_ORACLE = f"""
WITH toks AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk
              FROM documents),
n AS (SELECT doc_id, tk, len(tk) AS n_tok FROM toks),
c AS (SELECT doc_id, n_tok,
             UNNEST(generate_series(0,
                 CASE WHEN n_tok <= {_CHUNK_W} THEN 0
                      ELSE CAST(CEIL(CAST(n_tok - {_CHUNK_W} AS DOUBLE)
                                     / {_CHUNK_S}) AS INT) END)) AS ci,
             tk
      FROM n)
SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
       CAST(ci * {_CHUNK_S} + 1 AS BIGINT) AS start_tok,
       CAST(len(tk[ci * {_CHUNK_S} + 1 : LEAST(ci * {_CHUNK_S} + {_CHUNK_W}, len(tk))])
            AS BIGINT) AS chunk_tokens,
       md5(array_to_string(
           tk[ci * {_CHUNK_S} + 1 : LEAST(ci * {_CHUNK_S} + {_CHUNK_W}, len(tk))],
           ' ')) AS chunk_digest
FROM c ORDER BY doc_id, chunk_idx LIMIT 300"""


@register(
    "sp9_overlapping_chunks",
    _SP9_ORACLE,
    doc=f"Overlapping chunk windows ({_CHUNK_W}-token windows, stride "
        f"{_CHUNK_S} — the RAG/retrieval indexing prep, distinct from "
        f"sp3/sp4's concat-and-pack): each document fans out to its "
        f"chunk rows with a digest pinning the exact chunk tokens. Pure "
        f"JVM higher-order functions (sequence/transform/slice) — the "
        f"per-doc chunk count is small so the HOF interpreter cost is "
        f"negligible, and the op is map-only: no shuffle except the "
        f"final ordered LIMIT.",
    tags=("llm", "pipeline"),
)
def sp9(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.textlib import words

    d = t(spark, sf, "documents")
    tk = words(F.col("text"))
    toks = d.select("doc_id", tk.alias("tk"), F.size(tk).alias("n_tok"))
    n_chunks = F.when(F.col("n_tok") <= _CHUNK_W, F.lit(0)).otherwise(
        F.ceil((F.col("n_tok") - _CHUNK_W).cast("double") / _CHUNK_S).cast("int")
    )
    chunk = F.explode(F.sequence(F.lit(0), n_chunks)).alias("ci")
    start = F.col("ci") * _CHUNK_S + 1
    # slice length: min(start + W - 1, n_tok) - start + 1
    length = F.least(start + F.lit(_CHUNK_W - 1), F.col("n_tok")) - start + 1
    piece = F.slice(F.col("tk"), start, length)
    return (
        toks.select("doc_id", "tk", "n_tok", chunk)
        .select(
            "doc_id",
            F.col("ci").cast("long").alias("chunk_idx"),
            start.cast("long").alias("start_tok"),
            F.size(piece).cast("long").alias("chunk_tokens"),
            F.md5(F.array_join(piece, " ")).alias("chunk_digest"),
        )
        .orderBy("doc_id", "chunk_idx")
        .limit(300)
    )


# ---------------------------------------------------------------------------
# tx15 — bigram-LM cross-entropy scoring
# ---------------------------------------------------------------------------

#: Add-α smoothing mass for unseen bigrams.
LM_ALPHA = 0.5

_TX15_ORACLE = f"""
WITH toks AS (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\\s+')) AS tok,
                     generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS pos
              FROM documents),
 bg0 AS (SELECT doc_id, tok AS a,
                LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
         FROM toks),
 bg AS (SELECT doc_id, a, b FROM bg0
        WHERE a <> '' AND b IS NOT NULL AND b <> ''),
 cb AS (SELECT a, b, COUNT(*) AS cab FROM bg GROUP BY a, b),
 ca AS (SELECT a, COUNT(*) AS can FROM bg GROUP BY a),
 v  AS (SELECT COUNT(DISTINCT tok) AS vsz FROM toks WHERE tok <> '')
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(AVG(-ln((cab + {LM_ALPHA}) / (can + {LM_ALPHA} * vsz))), 6)
         AS cross_entropy
FROM bg JOIN cb USING (a, b) JOIN ca USING (a) CROSS JOIN v
GROUP BY doc_id ORDER BY doc_id LIMIT 500"""


@register(
    "tx15_bigram_lm",
    _TX15_ORACLE,
    doc="Bigram language-model cross-entropy per document (add-α "
        "smoothed, context counts from the bigram table so the model "
        "normalizes) — the CCNet/KenLM-style quality signal one order "
        "up from tx9's unigram: word-salad with plausible unigrams "
        "scores high here. Plan: bigrams formed by ONE doc_id-keyed "
        "lead() window (no self-join), count tables are O(observed "
        "bigrams), the score join is tokens⋈counts — at 100 TB the "
        "count tables broadcast as top-K with an OOV floor, or stay "
        "exact via shuffle join (same trade as tx9).",
    tags=("llm", "text"),
)
def tx15(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.textlib import words
    from pyspark.sql.window import Window

    d = t(spark, sf, "documents")
    tk = d.select(
        "doc_id", F.posexplode(words(F.col("text"))).alias("pos", "tok")
    )
    lead = F.lead("tok").over(Window.partitionBy("doc_id").orderBy("pos"))
    bg = (
        tk.select("doc_id", F.col("tok").alias("a"), lead.alias("b"))
        .filter((F.col("a") != "") & F.col("b").isNotNull() & (F.col("b") != ""))
    )
    cb = bg.groupBy("a", "b").agg(F.count("*").alias("cab"))
    ca = bg.groupBy("a").agg(F.count("*").alias("can"))
    v = (
        tk.filter(F.col("tok") != "")
        .agg(F.countDistinct("tok").alias("vsz"))
    )
    p = (F.col("cab") + LM_ALPHA) / (F.col("can") + LM_ALPHA * F.col("vsz"))
    return (
        bg.join(cb, ["a", "b"])
        .join(ca, "a")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(-F.log(p)), 6).alias("cross_entropy"),
        )
        .orderBy("doc_id")
        .limit(500)
    )


# ---------------------------------------------------------------------------
# tx16 — per-source distribution drift (PSI)
# ---------------------------------------------------------------------------

#: Fixed n_chars bucket edges (log-ish widths) and Laplace smoothing.
PSI_EDGES = (100, 200, 400, 800, 1600)
PSI_SMOOTH = 0.5
_N_BUCKETS = len(PSI_EDGES) + 1


def _bucket_case_sql(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} < {e} THEN {i}" for i, e in enumerate(PSI_EDGES)
    )
    return f"CASE {whens} ELSE {len(PSI_EDGES)} END"


_TX16_ORACLE = f"""
WITH d AS (SELECT source, {_bucket_case_sql('n_chars')} AS b FROM documents),
 csb AS (SELECT source, b, COUNT(*) AS c FROM d GROUP BY source, b),
 cb  AS (SELECT b, COUNT(*) AS cb FROM d GROUP BY b),
 ts  AS (SELECT source, COUNT(*) AS t FROM d GROUP BY source),
 tot AS (SELECT COUNT(*) AS n FROM d),
 grid AS (SELECT s.source, g.b FROM (SELECT DISTINCT source FROM d) s
          CROSS JOIN (SELECT unnest(generate_series(0, {_N_BUCKETS - 1})) AS b) g),
 terms AS (
   SELECT grid.source,
          (COALESCE(csb.c, 0) + {PSI_SMOOTH})
            / (ts.t + {PSI_SMOOTH} * {_N_BUCKETS}) AS p,
          (cb.cb - COALESCE(csb.c, 0) + {PSI_SMOOTH})
            / (tot.n - ts.t + {PSI_SMOOTH} * {_N_BUCKETS}) AS q
   FROM grid
   LEFT JOIN csb ON csb.source = grid.source AND csb.b = grid.b
   JOIN cb ON cb.b = grid.b
   JOIN ts ON ts.source = grid.source
   CROSS JOIN tot)
SELECT source, ROUND(SUM((p - q) * ln(p / q)), 6) AS psi
FROM terms GROUP BY source ORDER BY source"""


@register(
    "tx16_distribution_drift",
    _TX16_ORACLE,
    doc="Per-source distribution drift: population stability index of "
        "the n_chars distribution, each source vs the rest of the "
        "corpus (fixed log-width buckets, Laplace-smoothed so empty "
        "buckets stay defined). The mix-monitoring signal a corpus "
        "pipeline alarms on when one feed's length profile shifts. All "
        "shares derive from exact BIGINT counts over a (source × 6) "
        "grid, so both engines evaluate identical doubles; the corpus "
        "scan reduces to O(sources × buckets) rows before any math.",
    tags=("llm", "text"),
)
def tx16(spark: SparkSession, sf: str) -> DataFrame:
    d = t(spark, sf, "documents")
    b = F.when(F.col("n_chars") < PSI_EDGES[0], 0)
    for i, e in enumerate(PSI_EDGES[1:], start=1):
        b = b.when(F.col("n_chars") < e, i)
    b = b.otherwise(len(PSI_EDGES))
    d = d.select("source", b.alias("b"))
    csb = d.groupBy("source", "b").agg(F.count("*").alias("c"))
    cb = d.groupBy("b").agg(F.count("*").alias("cb"))
    ts = d.groupBy("source").agg(F.count("*").alias("t"))
    tot = d.agg(F.count("*").alias("n"))
    buckets = spark.range(_N_BUCKETS).select(F.col("id").cast("int").alias("b"))
    grid = ts.select("source").crossJoin(F.broadcast(buckets))
    k = float(_N_BUCKETS)
    p = (F.coalesce("c", F.lit(0)) + PSI_SMOOTH) / (F.col("t") + PSI_SMOOTH * k)
    q = (F.col("cb") - F.coalesce("c", F.lit(0)) + PSI_SMOOTH) / (
        F.col("n") - F.col("t") + PSI_SMOOTH * k
    )
    return (
        grid.join(csb, ["source", "b"], "left")
        .join(F.broadcast(cb), "b")
        .join(F.broadcast(ts), "source")
        .crossJoin(F.broadcast(tot))
        .select("source", ((p - q) * F.log(p / q)).alias("term"))
        .groupBy("source")
        .agg(F.round(F.sum("term"), 6).alias("psi"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# sp11 — sequence-packing efficiency curve
# ---------------------------------------------------------------------------

#: candidate context lengths for the packing report. The real decision
#: this query feeds: which max_seq_len wastes the least compute given
#: the corpus' length distribution.
_PACK_LENS = (128, 256, 512, 1024)

_SP11_ORACLE = f"""
WITH tk AS (SELECT len(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents),
per AS (SELECT seq_len, tok
        FROM tk CROSS JOIN (VALUES {", ".join(f"({l})" for l in _PACK_LENS)})
             AS l(seq_len))
SELECT seq_len,
       COUNT(*) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS total_tokens,
       CAST(SUM((tok + seq_len - 1) // seq_len) AS BIGINT) AS n_seqs,
       CAST(seq_len * SUM((tok + seq_len - 1) // seq_len) - SUM(tok) AS BIGINT)
           AS pad_tokens,
       ROUND(SUM(tok) * 1.0 /
             (seq_len * SUM((tok + seq_len - 1) // seq_len)), 6) AS utilization
FROM per GROUP BY seq_len ORDER BY seq_len"""


@register(
    "sp11_packing_efficiency",
    _SP11_ORACLE,
    doc="Sequence-packing efficiency curve: for each candidate context "
        "length, how many sequences the corpus needs under one-doc-per-"
        "sequence packing (each doc occupies ceil(tokens/L) windows) and "
        "what fraction of slots is padding — exact integer ceil "
        "arithmetic, one ratio at the end (identical doubles both "
        "engines). This is the report that picks max_seq_len before a "
        "training run. Plan: one corpus scan computes token counts, a "
        "4-row literal explode fans each doc into the candidate lengths, "
        "one O(lengths) aggregate — scan-bound at any corpus size, no "
        "join, no per-doc state.",
    tags=("llm", "packing"),
)
def sp11(spark: SparkSession, sf: str) -> DataFrame:
    from goose_spark.operators.textlib import token_count_ws

    d = t(spark, sf, "documents")
    per = d.select(
        token_count_ws(F.col("text")).alias("tok"),
        F.explode(F.array(*[F.lit(l) for l in _PACK_LENS])).alias("seq_len"),
    )
    seqs = F.sum(F.expr("(tok + seq_len - 1) div seq_len"))
    return (
        per.groupBy("seq_len")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").cast("long").alias("total_tokens"),
            seqs.cast("long").alias("n_seqs"),
            (F.first("seq_len") * seqs - F.sum("tok")).cast("long").alias("pad_tokens"),
            F.round(
                F.sum("tok") * 1.0 / (F.first("seq_len") * seqs), 6
            ).alias("utilization"),
        )
        .orderBy("seq_len")
    )


# ---------------------------------------------------------------------------
# sp12 — contamination matrix (which eval slices leak into which sources)
# ---------------------------------------------------------------------------

_SP12_ORACLE = f"""
WITH toks AS (SELECT doc_id, lang, source,
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b,
                     string_split_regex(lower(text), '\\s+') AS tk
              FROM documents),
sh AS (SELECT doc_id, lang, source, b,
              UNNEST(list_distinct(list_transform(
                  generate_series(1, len(tk) - {_DECON_N - 1}),
                  i -> array_to_string(tk[i:i+{_DECON_N - 1}], ' ')))) AS g
       FROM toks WHERE len(tk) >= {_DECON_N}),
bench AS (SELECT DISTINCT g, lang AS bench_lang FROM sh WHERE b < '{_BENCH_LT}'),
hits AS (SELECT DISTINCT s.source AS train_source, bench.bench_lang, s.doc_id
         FROM sh s JOIN bench ON s.g = bench.g
         WHERE s.b >= '{_BENCH_LT}')
SELECT train_source, bench_lang, COUNT(*) AS n_contaminated_docs
FROM hits GROUP BY 1, 2 ORDER BY train_source, bench_lang"""


@register(
    "sp12_contamination_matrix",
    _SP12_ORACLE,
    doc=f"Contamination matrix — sp6's flag list pivoted into the audit "
        f"actually reviewed before a training run: for every (training "
        f"source × benchmark slice) cell, how many training docs share "
        f"an exact {_DECON_N}-gram with that slice (bench slice = lang "
        f"of the held-out ~3% md5 bucket). Plan mirrors sp6: the "
        f"benchmark gram→slice table stays broadcast (benchmarks are "
        f"MBs), the corpus side semi-joins map-side, and the only "
        f"shuffles are the distinct over (doc, slice) hits and the "
        f"O(sources×slices) count — no corpus bytes move.",
    tags=("llm", "curation"),
)
def sp12(spark: SparkSession, sf: str) -> DataFrame:
    # same below-the-kernel bucket split as sp6: each doc tokenized
    # once, not once per branch (optimization r14, guide §2.2)
    d = (
        t(spark, sf, "documents")
        .select("doc_id", "lang", "source", "text")
        .withColumn(
            "b",
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2),
        )
    )

    def sh(side: DataFrame) -> DataFrame:
        return with_ngrams(side, _DECON_N).select(
            "doc_id", "lang", "source", "b", F.explode("grams").alias("g")
        )

    bench = (
        sh(d.filter(F.col("b") < _BENCH_LT))
        .select("g", F.col("lang").alias("bench_lang"))
        .distinct()
    )
    return (
        sh(d.filter(F.col("b") >= _BENCH_LT))
        .join(F.broadcast(bench), "g")
        .select(F.col("source").alias("train_source"), "bench_lang", "doc_id")
        .distinct()
        .groupBy("train_source", "bench_lang")
        .agg(F.count("*").alias("n_contaminated_docs"))
        .orderBy("train_source", "bench_lang")
    )
