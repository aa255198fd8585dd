"""operators/bpe.py — the word-frequency decomposition must reproduce
classic raw-corpus BPE exactly, deterministically."""

from __future__ import annotations

from collections import Counter

from goose_spark.operators.bpe import (
    EOW,
    learn_bpe,
    learn_merges_from_freqs,
    word_freqs,
)
from goose_spark.queries.base import t
from tests.conftest import SF_CORRECT


def _naive_bpe(texts: list[str], n_merges: int):
    """Independent reference: operates on the RAW token stream (no
    word-frequency table), merging greedily with the same tie-break."""
    import re

    words = []
    for txt in texts:
        words += [w for w in re.split(r"[^a-z]+", txt.lower()) if w]
    seqs = [tuple(w) + (EOW,) for w in words]
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms in seqs:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += 1
        if not pairs:
            break
        (a, b), top = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, top))
        ab = a + b
        out_seqs = []
        for syms in seqs:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            out_seqs.append(tuple(out))
        seqs = out_seqs
    return merges


def test_freq_decomposition_matches_raw_corpus():
    texts = [
        "the lower the newer the wider",
        "low lower lowest new newer newest",
        "wide wider widest low low low",
    ]
    words = Counter()
    import re

    for txt in texts:
        words.update(w for w in re.split(r"[^a-z]+", txt.lower()) if w)
    via_freqs = learn_merges_from_freqs(sorted(words.items()), 12)
    via_raw = _naive_bpe(texts, 12)
    assert via_freqs == via_raw
    assert via_freqs[0][1:3] == ("e", EOW) or via_freqs[0][3] >= 2


def test_learned_merges_compose():
    """Merged symbols participate in later merges (l+o → lo, lo+w →
    low): the table is a real merge hierarchy, not just bigram stats."""
    merges = learn_merges_from_freqs([("lowlow", 50), ("low", 30)], 6)
    symbols = {m[1] + m[2] for m in merges}
    assert any(len(s.replace(EOW, "")) >= 3 for s in symbols), merges


def test_spark_corpus_deterministic_and_useful(spark):
    docs = t(spark, SF_CORRECT, "documents")
    a = [tuple(r) for r in learn_bpe(spark, docs, n_merges=15).collect()]
    b = [tuple(r) for r in learn_bpe(spark, docs, n_merges=15).collect()]
    assert a == b and len(a) == 15
    ranks = [r[0] for r in sorted(a)]
    assert ranks == list(range(15))
    freqs = [r[3] for r in sorted(a)]
    assert all(f > 0 for f in freqs)
    # corpus text is English-ish: the very first merge should involve a
    # high-frequency pattern, far above the floor
    assert freqs[0] == max(freqs)


def test_word_freq_scan_prunes_columns(spark):
    """The corpus pass must read ONLY the text column."""
    docs = t(spark, SF_CORRECT, "documents")
    plan = (
        word_freqs(docs, 1000)._jdf.queryExecution().executedPlan().toString()
    )
    import re

    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "text" in m.group(1) and "doc_id" not in m.group(1), plan


def test_encode_word_applies_merges_in_rank_order():
    from goose_spark.operators.bpe import encode_word

    merges = [(0, "l", "o"), (1, "lo", "w"), (2, "e", EOW)]
    ranks = {(a, b): r for r, a, b in merges}
    assert encode_word("low", ranks) == ["low", EOW]
    assert encode_word("lowe", ranks) == ["low", "e" + EOW]
    assert encode_word("xyz", ranks) == ["x", "y", "z", EOW]


def test_apply_bpe_compresses_and_matches_pure_encoder(spark):
    """The Arrow kernel must agree with the pure encode_word on every
    sampled doc, and more merges must never produce MORE tokens."""
    import re

    from goose_spark.operators.bpe import (
        apply_bpe,
        encode_word,
        learn_merges_from_freqs,
        word_freqs,
    )

    docs = t(spark, SF_CORRECT, "documents").limit(500)
    wf = [(r["w"], int(r["freq"])) for r in word_freqs(docs, 5_000).collect()]
    merges = learn_merges_from_freqs(wf, 20)
    enc = {r["doc_id"]: r for r in apply_bpe(docs, merges).collect()}
    ranks = {(a, b): r for r, a, b, _ in merges}
    split = re.compile(r"[^a-z]+")
    for row in docs.select("doc_id", "text").limit(20).collect():
        words = [w for w in split.split((row["text"] or "").lower()) if w]
        want = sum(len(encode_word(w, ranks)) for w in words)
        assert enc[row["doc_id"]]["n_tokens"] == want
        assert enc[row["doc_id"]]["n_words"] == len(words)

    none = apply_bpe(docs, []).agg({"n_tokens": "sum"}).collect()[0][0]
    some = apply_bpe(docs, merges).agg({"n_tokens": "sum"}).collect()[0][0]
    assert some < none  # merges strictly compress this corpus
