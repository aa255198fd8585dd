"""Shared text-analysis column expressions.

Every helper has an exact DuckDB-SQL twin (documented inline) so the
dedup/text operators can be oracle-checked value-for-value. All
expressions are built-in Spark functions — JVM-side, whole-stage
codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: whitespace tokenization — DuckDB: string_split_regex(lower(text), '\s+')
def words(col: Column) -> Column:
    return F.split(F.lower(col), r"\s+")


#: BPE-ish token regex — alpha runs, digit runs, single punctuation
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_count_ws(col: Column) -> Column:
    return F.size(words(col)).cast("long")


def token_count_bpe(col: Column) -> Column:
    # DuckDB: len(regexp_extract_all(text, TOKEN_RE))
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), F.lit(0))).cast("long")


def shingles3_from_words(w: Column) -> Column:
    """Distinct word 3-gram shingles from a *materialized* words-array
    column. Pass an attribute (projected column), NOT the ``words(...)``
    expression inline — Catalyst re-inlines expressions per reference, so
    an inline split would re-run the regex for every element_at call
    (measured: ~10× slowdown on the shingle operators).

    DuckDB twin::

        list_distinct(case when len(w) >= 3 then
          list_transform(generate_series(1, len(w)-2),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
        else [] end)   -- w := string_split_regex(lower(text), '\\s+')
    """
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)
        ),
    )
    return F.array_distinct(
        F.when(F.size(w) >= 3, grams).otherwise(F.array().cast("array<string>"))
    )


def with_shingles(df, text_col: str = "text", out: str = "sh", barrier: bool = True):
    """documents → + distinct 3-gram shingle column (first-occurrence
    order, matching array_distinct / DuckDB list_distinct semantics).

    Implemented as an Arrow-batched ``mapInPandas`` stage, NOT the
    DataFrame higher-order ``transform``: Spark evaluates HOF lambdas
    interpreted (outside whole-stage codegen) at ~33µs per shingle —
    measured ~4s per evaluation at sf0.1, re-paid for every plan branch
    that references the column. The Python batch builds the same arrays
    in ~0.3s and gives downstream operators a materialized column.

    ``barrier=True`` round-robins batches to one partition per core so
    shingling and the downstream pairwise/explode work are
    load-balanced; measured at sf0.1, over-splitting (e.g. 2× cores)
    costs ~2× in task scheduling + Python worker round-trips.
    """
    from pyspark.sql import types as T

    import re as _re

    schema = T.StructType(df.schema.fields + [T.StructField(out, T.ArrayType(T.StringType()))])

    def gen(batches):
        ws = _re.compile(r"\s+")
        for pdf in batches:
            def sh(text):
                if text is None:  # null text = no shingles, not a task kill
                    return []
                w = ws.split(text.lower())
                if len(w) < 3:
                    return []
                return list(dict.fromkeys(
                    " ".join(w[i : i + 3]) for i in range(len(w) - 2)
                ))

            pdf[out] = pdf[text_col].map(sh)
            yield pdf

    if barrier:
        base = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else:
        base = df
    return base.mapInPandas(gen, schema)


def with_ngrams(df, n: int, text_col: str = "text", out: str = "grams",
                barrier: bool = True):
    """documents → + distinct word n-gram column (first-occurrence order,
    matching DuckDB ``list_distinct(list_transform(...))`` semantics).

    Same Arrow ``mapInPandas`` rationale as :func:`with_shingles` — Spark
    HOF lambdas run interpreted (~33µs/gram), the Python batch builds the
    arrays in bulk and gives downstream joins a materialized column.
    Docs shorter than ``n`` tokens get an empty list (DuckDB's
    ``generate_series(1, len-n+1)`` is empty there; Spark's ``sequence``
    would count DOWN, so the kernel guards explicitly).
    """
    from pyspark.sql import types as T

    import re as _re

    schema = T.StructType(df.schema.fields + [T.StructField(out, T.ArrayType(T.StringType()))])

    def gen(batches):
        ws = _re.compile(r"\s+")
        for pdf in batches:
            def grams(text):
                if text is None:  # null text = no grams, not a task kill
                    return []
                w = ws.split(text.lower())
                if len(w) < n:
                    return []
                return list(dict.fromkeys(
                    " ".join(w[i : i + n]) for i in range(len(w) - n + 1)
                ))

            pdf[out] = pdf[text_col].map(grams)
            yield pdf

    if barrier:
        base = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    else:
        base = df
    return base.mapInPandas(gen, schema)


def normalized_fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of lowercased, whitespace-collapsed text.
    DuckDB: md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))"""
    return F.md5(F.regexp_replace(F.lower(col), r"\s+", " "))


# language-ID marker patterns (n-gram/stopword heuristic). The CASE
# precedence on ties is en > es > de > fr > zh in both engines.
LANG_MARKERS = {
    "en": r"\b(the|a|of|and|to)\b",
    "es": r"\b(el|la|de|los|y)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|les|et|est|une)\b",
    "zh": r"[\x{4e00}-\x{9fff}]",
}


def marker_count(col: Column, lang: str) -> Column:
    # DuckDB: len(regexp_extract_all(lower(text), pattern))
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(LANG_MARKERS[lang]), F.lit(0))).cast("long")
