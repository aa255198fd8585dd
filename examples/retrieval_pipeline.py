"""End-to-end retrieval-indexing pipeline: the RAG-prep counterpart of
examples/data_pipeline.py, composed from engine primitives:

    documents
      → overlapping chunk windows   (sp9 kernel: 32-token windows,
                                     stride 24 — each chunk a retrieval
                                     unit with a digest)
      → chunk embeddings            (deterministic hashed bag-of-words
                                     projection — honest stand-in for a
                                     model encoder, same Arrow batch
                                     path; dims/norms are real)
      → IVF index                   (k-means quantizer from the ss3
                                     kernel family: centroid assignment
                                     via broadcast, per-cell postings)
      → query top-k                 (probe nearest cells only, exact
                                     cosine within the probed subset,
                                     text joined back for the answer
                                     context)

Every stage is DataFrame algebra or an Arrow kernel; the index tables
(chunks, embeddings, cells) are written to parquet between stages the
way a production pipeline checkpoints. At 100 TB the probe step reads
only the queried cells' postings — partition the postings table by
cell id and the scan partition-prunes.

Run:  python examples/retrieval_pipeline.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

_DIM = 32
_K_CELLS = 8
_PROBE = 2
_TOP_K = 3


def _make_embed(dim):
    """Factory for the ONE hashed bag-of-words projection (crc32 ±1,
    L2-normalized) used for both corpus chunks and queries — a single
    code path so index and query vectors can never drift apart. Built
    via a factory so cloudpickle ships it BY VALUE into mapInPandas
    closures (examples/ is not importable on executor workers)."""

    def _embed_text(text):
        import zlib

        import numpy as np

        v = np.zeros(dim)
        for tok in text.split():
            h = zlib.crc32(tok.encode())  # deterministic across processes
            v[h % dim] += 1.0 if (h >> 16) % 2 else -1.0
        n = np.linalg.norm(v)
        return v / n if n else v

    return _embed_text


_embed_text = _make_embed(_DIM)


def _embed_chunks(chunks_df):
    """Deterministic hashed bag-of-words embedding (Arrow-batched):
    token t adds ±1 to dimension hash(t) % DIM; vector L2-normalized.
    A model encoder slots into this exact kernel signature."""
    import pandas as pd

    embed = _embed_text  # local capture → pickled by value into the kernel

    def gen(batches):
        for pdf in batches:
            vecs = [embed(text).tolist() for text in pdf["chunk_text"]]
            out = pd.DataFrame(
                {"chunk_id": pdf["chunk_id"], "doc_id": pdf["doc_id"],
                 "chunk_text": pdf["chunk_text"], "emb": vecs}
            )
            yield out

    return chunks_df.mapInPandas(
        gen, schema="chunk_id string, doc_id long, chunk_text string, emb array<double>"
    )


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> dict:
    from goose_spark.operators.curation import _CHUNK_S, _CHUNK_W
    from goose_spark.operators.textlib import words
    from goose_spark.queries.base import t
    from goose_spark.session import get_spark

    own = spark is None
    if own:
        spark = get_spark("gosling-retrieval")
        spark.sparkContext.setLogLevel("ERROR")
    stats: dict = {}
    stage = tempfile.mkdtemp(prefix="gosling-retrieval-")
    try:
        # 1. chunk (sp9 shape, carrying the chunk text)
        d = t(spark, sf_dir, "documents")
        tk = words(F.col("text"))
        toks = d.select("doc_id", tk.alias("tk"), F.size(tk).alias("n_tok"))
        n_chunks = F.when(F.col("n_tok") <= _CHUNK_W, F.lit(0)).otherwise(
            F.ceil((F.col("n_tok") - _CHUNK_W).cast("double") / _CHUNK_S).cast("int")
        )
        start = F.col("ci") * _CHUNK_S + 1
        length = F.least(start + F.lit(_CHUNK_W - 1), F.col("n_tok")) - start + 1
        chunks = (
            toks.select("doc_id", "tk", "n_tok",
                        F.explode(F.sequence(F.lit(0), n_chunks)).alias("ci"))
            .select(
                F.concat_ws("#", "doc_id", "ci").alias("chunk_id"),
                "doc_id",
                F.array_join(F.slice(F.col("tk"), start, length), " ").alias("chunk_text"),
            )
        )
        chunks.write.parquet(os.path.join(stage, "chunks.parquet"))
        chunks = spark.read.parquet(os.path.join(stage, "chunks.parquet"))
        stats["chunks"] = chunks.count()

        # 2. embed (Arrow kernel)
        emb = _embed_chunks(chunks)
        emb.write.parquet(os.path.join(stage, "embeddings.parquet"))
        emb = spark.read.parquet(os.path.join(stage, "embeddings.parquet"))

        # 3. IVF quantizer: k deterministic seeds (first k chunk
        #    vectors by chunk_id) refined by 2 Lloyd passes of the ss3
        #    fused assign+partial-sum shape
        import numpy as np

        seeds = [
            np.array(r["emb"])
            for r in emb.orderBy("chunk_id").limit(_K_CELLS).collect()
        ]
        cent = seeds
        for _ in range(2):
            bc = spark.sparkContext.broadcast([c.tolist() for c in cent])

            def assign_partial(batches):
                import numpy as np
                import pandas as pd

                C = np.array(bc.value)
                sums = np.zeros_like(C)
                counts = np.zeros(len(C))
                for pdf in batches:
                    V = np.array(list(pdf["emb"]))
                    if len(V) == 0:
                        continue
                    cells = np.argmax(V @ C.T, axis=1)
                    for c in range(len(C)):
                        m = cells == c
                        sums[c] += V[m].sum(axis=0)
                        counts[c] += m.sum()
                yield pd.DataFrame(
                    {"cell": range(len(C)), "s": [s.tolist() for s in sums],
                     "n": counts}
                )

            parts = emb.mapInPandas(
                assign_partial, schema="cell int, s array<double>, n double"
            ).collect()
            sums = {}
            counts = {}
            for r in parts:
                sums[r["cell"]] = sums.get(r["cell"], np.zeros(_DIM)) + np.array(r["s"])
                counts[r["cell"]] = counts.get(r["cell"], 0) + r["n"]
            cent = [
                (sums[c] / counts[c]) if counts.get(c) else cent[c]
                for c in range(_K_CELLS)
            ]
            cent = [c / (np.linalg.norm(c) or 1.0) for c in cent]
        stats["cells"] = _K_CELLS

        # 4. persist the index through the REAL lifecycle API
        #    (annindex.build_ivf_index_from): cluster-partitioned
        #    assignments + centroids + manifest — the same on-disk
        #    layout the delete/compact/streaming-append paths maintain.
        #    Chunk ids are hashed to the index's numeric key space; the
        #    (vec_id → chunk) mapping stays a parquet side table.
        from goose_spark.operators.annindex import (
            build_ivf_index_from,
            ivf_index_query,
        )
        from goose_spark.operators.mmr import mmr_rerank_indexed

        keyed = emb.select(
            F.xxhash64("chunk_id").alias("vec_id"),
            "chunk_id", "doc_id", "chunk_text", "emb",
        )
        keyed.drop("emb").write.parquet(os.path.join(stage, "chunkmap.parquet"))
        chunkmap = spark.read.parquet(os.path.join(stage, "chunkmap.parquet"))
        idx_dir = os.path.join(stage, "ivf_index")
        manifest = build_ivf_index_from(
            spark, keyed.select("vec_id", "emb"),
            [c.tolist() for c in cent], idx_dir,
        )
        stats["index_rows"] = manifest["n"]

        # 5. query: embed the query string the same way, serve top-k
        #    off the index (partition-pruned probe of _PROBE cells),
        #    then MMR-diversify the SAME served candidates — both
        #    stages read only the probed cells' files.
        query = "table scan filter join"
        qv = _embed_text(query)
        qdf = spark.createDataFrame(
            [(0, [float(x) for x in qv])], "query_id long, qe array<double>"
        )
        top = (
            ivf_index_query(spark, idx_dir, qdf, nprobe=_PROBE, topk=_TOP_K)
            .join(chunkmap, F.col("neighbor_id") == F.col("vec_id"))
            .orderBy("rank")
            .collect()
        )
        stats["probed_cells"] = _PROBE
        stats["top"] = [(r["chunk_id"], round(r["score"], 4)) for r in top]
        stats["top_texts"] = [r["chunk_text"][:40] for r in top]

        # 6. diversified answer context: the ss9 MMR kernel over the
        #    index-served candidate pool (3× top-k), λ=0.7
        diverse = (
            mmr_rerank_indexed(
                spark, idx_dir, qdf,
                top_k=_TOP_K, cand_k=3 * _TOP_K, nprobe=_PROBE,
            )
            .join(chunkmap, F.col("neighbor_id") == F.col("vec_id"))
            .orderBy("rank")
            .collect()
        )
        stats["mmr_top"] = [(r["chunk_id"], round(r["mmr_score"], 4)) for r in diverse]

        # 7. near-duplicate chunk sweep (the ss11 radius form over the
        #    SAME index): everything within cosine ≥ τ of the query —
        #    answer-bound, so a dense boilerplate neighborhood returns
        #    all of itself instead of being truncated at top-k; the
        #    shape an index-time chunk-dedup pass uses
        from goose_spark.operators.annindex import ivf_range_search

        radius = ivf_range_search(
            spark, idx_dir, qdf, tau=0.5, nprobe=_PROBE
        ).collect()
        stats["in_radius"] = len(radius)
        return stats
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        if own:
            spark.stop()


if __name__ == "__main__":
    out = main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
    for k, v in out.items():
        print(f"{k}: {v}")
