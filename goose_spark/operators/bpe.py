"""Distributed BPE merge induction — tokenizer FITTING over a corpus,
not just token counting (tx2 counts with a fixed BPE-ish regex; this
learns the merge table itself).

The scalable decomposition is the one every production tokenizer
trainer uses (and the reason this is feasible at 100 TB): BPE's merge
statistics depend only on the WORD-FREQUENCY table, not on raw text.
So the corpus-sized work is exactly one distributed scan —
explode(words) → groupBy → count → top-V by frequency (TakeOrdered,
O(V) driver traffic) — and the merge loop itself runs over that
bounded V-row table (Zipf: the head carries essentially all pair
mass), same driver-side-bounded shape as IVF k-means (k×dim/iter) or
the two-pass prefix-sum offsets (O(buckets)).

Ties break deterministically (pair frequency desc, then pair
lexicographic), so the learned table is reproducible across cluster
sizes — a hard requirement for a tokenizer you'll ship.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goose_spark.queries.base import register, t

EOW = "</w>"  # end-of-word sentinel, classic Sennrich-style BPE


def word_freqs(docs: DataFrame, top_words: int) -> DataFrame:
    """THE distributed step: one corpus scan to the top-V word-frequency
    table. Lowercased, split on non-letters (the same normalization
    either engine can reproduce)."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "w")
        .limit(top_words)
    )


def learn_merges_from_freqs(wf: list[tuple[str, int]],
                            n_merges: int) -> list[tuple[int, str, str, int]]:
    """Classic BPE over a word-frequency dict: count adjacent symbol
    pairs weighted by word frequency, merge the most frequent pair,
    repeat. Pure function of the frequency table (unit-testable without
    Spark). Returns [(rank, left, right, pair_freq)]."""
    vocab = {tuple(w) + (EOW,): f for w, f in wf}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (a, b), top = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, top))
        ab = a + b
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def learn_bpe(spark: SparkSession, docs: DataFrame, n_merges: int = 30,
              top_words: int = 10_000) -> DataFrame:
    wf = [(r["w"], int(r["freq"])) for r in word_freqs(docs, top_words).collect()]
    return spark.createDataFrame(
        learn_merges_from_freqs(wf, n_merges),
        "rank int, left string, right string, pair_freq long",
    )


def encode_word(word: str, ranks: dict) -> list[str]:
    """Classic BPE encode: repeatedly merge the lowest-rank adjacent
    pair until none applies. Pure function shared by the Arrow kernel
    and the tests."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best, bi = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            break
        syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
    return syms


def apply_bpe(docs: DataFrame, merges: list[tuple[int, str, str, int]],
              text_col: str = "text", carry: list[str] = ()) -> DataFrame:
    """Distributed tokenization with a learned merge table — the HOT
    path of the tokenizer story (train once on word freqs, encode the
    whole 100 TB corpus). The merge table is O(merges) and ships in the
    kernel closure (broadcast-by-serialization); the kernel is an
    Arrow-batched map — zero shuffles, pure corpus scan. Returns
    (doc_id, n_words, n_tokens)."""
    import re

    import pandas as pd

    ranks = {(a, b): r for r, a, b, _ in merges}
    split = re.compile(r"[^a-z]+")

    def kernel(batches):
        # Zipf memo: the encode is a pure function of the word, and a
        # corpus partition repeats its vocabulary constantly — caching
        # per-word token counts turns O(words) encodes into O(distinct
        # words) per task
        memo: dict = {}

        def toks(w: str) -> int:
            v = memo.get(w)
            if v is None:
                v = len(encode_word(w, ranks))
                memo[w] = v
            return v

        for pdf in batches:
            n_words, n_tokens = [], []
            for txt in pdf[text_col]:
                words = [w for w in split.split((txt or "").lower()) if w]
                n_words.append(len(words))
                n_tokens.append(sum(toks(w) for w in words))
            out = {"doc_id": pdf["doc_id"]}
            for c in carry:
                out[c] = pdf[c]
            out["n_words"] = n_words
            out["n_tokens"] = n_tokens
            yield pd.DataFrame(out)

    carry_schema = "".join(f"{c} string, " for c in carry)
    return docs.select("doc_id", *carry, text_col).mapInPandas(
        kernel, schema=f"doc_id long, {carry_schema}n_words long, n_tokens long"
    )


@register(
    "q80_bpe_encode",
    None,  # deterministic but iterative-merge-derived — rows-only;
    # kernel cross-checked against the pure encode_word in tests
    doc="Corpus tokenization with the q79-learned merge table, reported "
        "per language: total/avg BPE tokens and the compression ratio "
        "vs raw symbols. Train-once-encode-everywhere: the merge table "
        "(O(merges)) ships in an Arrow kernel closure, the encode pass "
        "is a zero-shuffle corpus map (the 100 TB hot path), and one "
        "O(langs) agg reports. Deterministic because the q79 trainer's "
        "tie-breaks are.",
)
def q80(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    wf = [(r["w"], int(r["freq"])) for r in word_freqs(docs, 10_000).collect()]
    merges = learn_merges_from_freqs(wf, 30)
    enc = apply_bpe(docs, merges, carry=["lang"])
    return (
        enc.groupBy("lang")
        .agg(
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
            F.round(F.sum("n_tokens") / F.sum("n_words"), 4).alias(
                "tokens_per_word"
            ),
        )
        .orderBy("lang")
    )


@register(
    "q79_bpe_merges",
    None,  # iterative merge induction — not SQL-expressible; rows-only,
    # cross-checked in tests/test_bpe.py against an independent naive
    # raw-corpus implementation and a determinism re-run
    doc="BPE tokenizer fitting: learn the first 30 merge rules from the "
        "documents corpus. Corpus-scale work is ONE distributed scan to "
        "a top-V word-frequency table (explode → count → TakeOrdered, "
        "O(V) driver traffic — BPE statistics are a pure function of "
        "word frequencies, the decomposition every production trainer "
        "uses); the merge loop runs over that bounded table with "
        "deterministic tie-breaks, so the learned table is reproducible "
        "on any cluster size.",
)
def q79(spark: SparkSession, sf: str) -> DataFrame:
    return learn_bpe(spark, t(spark, sf, "documents")).orderBy("rank")
