"""Cells-proportional-to-corpus IVF serve at 64x (round-14 scale
evidence for ss19/ss20's label-propagation family).

The measured failure this answers: ss20's session index keeps the
registry default of 16 cells at every corpus size, so at 64x the
nprobe-6 serve admits 6/16 = 37.5% of a 115k-vector support set PER
QUERY — 12.8k queries x 43k candidates x 64-double embeddings ≈ a
553M-row windowed shuffle whose spill exhausts this host's disk
(recorded in SCALE.md). The dial a real deployment turns is CELL
COUNT: k grows with the corpus so nprobe/k — the per-query scanned
fraction — FALLS as the corpus grows.

This script measures exactly that: same scaled corpus, same queries,
same vote stages, but the index is trained with k = 128 cells (8x the
registry default for 64x the corpus; ~sqrt-corpus scaling), nprobe 6 →
4.7% scanned per query. Everything runs through the public operator
surface (_train_ivf(k), build_ivf_index_from, ivf_index_query) — no
private forks of the serve path.

Usage: python3 tools/scale_cells64.py [N_COPIES] [K_CELLS]
Defaults: 64 copies, 128 cells. Run on an idle host.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_smoke import build_scaled  # noqa: E402


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    k_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    from pyspark.sql import functions as F

    from goose_spark.operators.annindex import (
        build_ivf_index_from,
        ivf_index_query,
    )
    from goose_spark.operators.similarity import (
        _SS19_K,
        _SS19_QUERY_MOD,
        _SS20_NPROBE,
        _embeddings,
        _train_ivf,
    )
    from goose_spark.queries.base import t
    from goose_spark.session import get_spark

    spark = get_spark("gosling-scale-cells")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    scaled = build_scaled(spark, n_copies)
    print(f"built {n_copies}x dataset in {time.perf_counter() - t0:.0f}s",
          flush=True)

    v = _embeddings(spark, scaled)
    n_corpus = v.count()

    t0 = time.perf_counter()
    centroids = _train_ivf(v, k=k_cells)
    train_s = time.perf_counter() - t0

    idx = tempfile.mkdtemp(prefix="goose-cells-")
    t0 = time.perf_counter()
    build_ivf_index_from(spark, v, centroids, idx)
    build_s = time.perf_counter() - t0

    lab = t(spark, scaled, "embeddings").select("vec_id", "label")
    q = v.filter(F.col("vec_id") % _SS19_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    allowed = lab.filter(F.col("vec_id") % _SS19_QUERY_MOD != 0).select("vec_id")

    t0 = time.perf_counter()
    knn = ivf_index_query(spark, idx, q, nprobe=_SS20_NPROBE, topk=_SS19_K,
                          allowed=allowed)
    votes = (
        knn.join(lab.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count("*").alias("votes"))
    )
    from pyspark.sql.window import Window

    vw = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("label"))
    n_pred = votes.withColumn("vr", F.row_number().over(vw)) \
        .filter(F.col("vr") == 1).count()
    serve_s = time.perf_counter() - t0

    frac = _SS20_NPROBE / k_cells
    print(f"| serve ({n_copies}x, {k_cells} cells) | corpus {n_corpus} | "
          f"train {train_s:.1f}s | build {build_s:.1f}s | "
          f"serve+vote {serve_s:.1f}s / {n_pred} predictions | "
          f"{100 * frac:.1f}% scanned/query |", flush=True)


if __name__ == "__main__":
    main()
