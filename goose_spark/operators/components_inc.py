"""Incremental connected-components maintenance for the dedup graph —
the streaming twin of dd6 (round-9 directive #2).

dd6 answers "what are the near-dup clusters of THIS corpus" with a
corpus-wide recompute; a production ingest runs daily and must instead
FOLD each new batch's near-dup edges into a persisted component
assignment. The per-batch cost here is O(batch + touched components),
never O(corpus):

    new docs ──► minhash bands  (dd2's exact kernel, per-doc ⇒ batch-local)
             ──► NEW edges      (within-batch band self-join + batch-vs-
                                 history band probe, exact-Jaccard verified
                                 — the same two joins CorpusIngest runs)
             ──► CONTRACTED CC  (endpoints mapped to their current labels;
                                 components_of runs on the label graph —
                                 O(new edges) nodes, i.e. only the touched
                                 components, never the whole corpus graph)
             ──► label deltas   (new docs + members of merged components)
                 appended under ONE commit manifest with the corpus/band
                 appends (the CorpusIngest _AtomicPublisher protocol)

Label storage is append-only (doc_id, cluster_id, seq): the current
assignment is the max-seq row per doc, so a batch writes O(delta) rows —
no corpus-wide rewrite. ``compact`` folds the history to one row per doc
(crash-safe delete-set manifest, same as CorpusIngest.compact). At
100 TB the labels table is bucketed by cluster_id so the merged-label
membership scan prunes; here the filter is a broadcast semi-join, which
is the same map-side shape.

Correctness contract (pinned in tests/test_components_inc.py): after
ingesting a corpus in ANY batch split, ``components()`` equals dd6 run
once over the whole corpus — same minhash/band/Jaccard parameters, and
contraction preserves connectivity (each existing component is already
labeled by its min id, so the label graph's min-CC is the full graph's
min-CC). The streaming form wraps ``add_batch`` in an effect-once
marker (label/band appends are not idempotent under micro-batch
replay) — the ``annindex.attach_index_stream`` pattern.

No reference analog (nilenso/goose is a job library); this extends the
LLM-pipeline operator family (SURVEY §2.5 north star).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from goose_spark.operators.clusters import components_of
from goose_spark.plans.guards import bounded_broadcast
from goose_spark.operators.dedup import _band_keys, _minhash_sig
from goose_spark.operators.ingest import _AtomicPublisher
from goose_spark.operators.textlib import with_shingles

#: Near-dup verify threshold — MUST match dd2/dd6 (the equality contract).
JACCARD_T = 0.5


def _jaccard(sa, sb):
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(sa) + F.size(sb) - F.size(F.array_intersect(sa, sb))
    return inter / union


class IncrementalComponents:
    """Persisted near-dup component assignment under ``root``:

    corpus/  (doc_id, text)            shingle source for edge verify
    bands/   (band, bkey, doc_id)      LSH index over all seen docs
    labels/  (doc_id, cluster_id, seq) append-only label deltas

    ``doc_id`` is the unique key; batches must carry previously-unseen
    ids (replayed micro-batches are suppressed by the stream wrapper's
    effect-once marker, not tolerated here).
    """

    def __init__(self, root: str):
        self.root = root
        for d in ("corpus", "bands", "labels"):
            os.makedirs(os.path.join(root, d), exist_ok=True)
        self._publisher = _AtomicPublisher(root)
        self._publisher.recover()

    def _read(self, spark: SparkSession, name: str) -> DataFrame | None:
        import glob

        if not glob.glob(os.path.join(self.root, name, "*.parquet")):
            return None
        return spark.read.parquet(os.path.join(self.root, name))

    # ------------------------------------------------------------------

    def components(self, spark: SparkSession) -> DataFrame:
        """Current assignment — (doc_id, cluster_id, is_keeper), the
        dd6 output shape: max-seq row per doc, keeper = cluster_id ==
        doc_id (min member id, every caller's shared keep rule)."""
        lab = self._read(spark, "labels")
        if lab is None:
            return spark.createDataFrame(
                [], "doc_id long, cluster_id long, is_keeper boolean"
            )
        w = Window.partitionBy("doc_id").orderBy(F.col("seq").desc())
        return (
            lab.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "doc_id",
                "cluster_id",
                (F.col("cluster_id") == F.col("doc_id")).alias("is_keeper"),
            )
            .orderBy("doc_id")
        )

    @staticmethod
    def _latest_for(lab_raw: DataFrame | None, docs: DataFrame,
                    n_docs: int | None = None) -> DataFrame:
        """Current (doc_id, cluster_id) for the given doc set ONLY:
        broadcast semi-join prunes the scan first, the latest-row window
        runs over that bounded subset — never over the whole table.
        ``n_docs`` (an upper bound is fine) skips the guard's count job
        when the caller already sized the doc set."""
        if lab_raw is None:
            return docs.sparkSession.createDataFrame(
                [], "doc_id long, cluster_id long"
            )
        w = Window.partitionBy("doc_id").orderBy(F.col("seq").desc())
        return (
            lab_raw.join(
                bounded_broadcast(docs.select("doc_id"), n_rows=n_docs,
                                  label="inc-cc batch ids"),
                "doc_id",
                "left_semi",
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("doc_id", "cluster_id")
        )

    def _next_seq(self, spark: SparkSession) -> int:
        lab = self._read(spark, "labels")
        if lab is None:
            return 1
        return int(lab.agg(F.max("seq")).collect()[0][0] or 0) + 1

    # ------------------------------------------------------------------

    def add_batch(self, spark: SparkSession, new_docs: DataFrame) -> dict:
        """Fold one batch of (doc_id, text) into the persisted
        assignment; returns {'docs', 'edges', 'merged_labels',
        'relabeled'} stats. Only the label graph induced by the NEW
        edges is re-solved (contracted CC); only members of components
        whose label changed are rewritten."""
        new_docs = new_docs.select("doc_id", "text").persist()
        pinned = [new_docs]
        try:
            n_docs = new_docs.count()
            seq = self._next_seq(spark)

            # 1. batch bands + shingles — dd2's exact kernels, per-doc
            #    computations so batch-local results equal corpus-wide
            new_sh = with_shingles(new_docs).select("doc_id", "sh").persist()
            pinned.append(new_sh)
            new_bands = _band_keys(
                _minhash_sig(new_docs, shingled=new_sh)
            ).persist()
            pinned.append(new_bands)

            # 2a. within-batch candidate pairs (band self-join)
            self_cand = (
                new_bands.alias("a")
                .join(new_bands.alias("b"), ["band", "bkey"])
                .filter(F.col("a.doc_id") < F.col("b.doc_id"))
                .select(
                    F.col("a.doc_id").alias("a_id"),
                    F.col("b.doc_id").alias("b_id"),
                )
                .distinct()
            )
            a_sh = new_sh.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("sa"))
            b_sh = new_sh.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("sb"))
            edges = (
                self_cand.join(a_sh, "a_id")
                .join(b_sh, "b_id")
                .filter(_jaccard(F.col("sa"), F.col("sb")) >= JACCARD_T)
                .select("a_id", "b_id")
            )

            # 2b. batch-vs-history: broadcast the batch's bands so the
            #     band index (rows ∝ corpus) is scanned map-side, never
            #     shuffled — the CorpusIngest inversion
            bands_idx = self._read(spark, "bands")
            if bands_idx is not None:
                cand = (
                    bands_idx.join(
                        bounded_broadcast(new_bands, label="inc-cc new_bands"),
                        ["band", "bkey"],
                    )
                    .select(
                        bands_idx.doc_id.alias("a_id"),
                        new_bands.doc_id.alias("b_id"),
                    )
                    .distinct()
                    .persist()  # reused: old-id probe + the verify join
                )
                pinned.append(cand)
                old_sh = with_shingles(
                    self._read(spark, "corpus")
                    .join(
                        bounded_broadcast(
                            cand.select(F.col("a_id").alias("doc_id")).distinct(),
                            label="inc-cc touched-history ids",
                        ),
                        "doc_id",
                        "left_semi",
                    )
                ).select(F.col("doc_id").alias("a_id"), F.col("sh").alias("sa"))
                hist_edges = (
                    cand.join(old_sh, "a_id")
                    .join(b_sh, "b_id")
                    .filter(_jaccard(F.col("sa"), F.col("sb")) >= JACCARD_T)
                    .select("a_id", "b_id")
                )
                edges = edges.unionByName(hist_edges)
            edges = edges.distinct().persist()
            pinned.append(edges)
            n_edges = edges.count()

            lab_raw = self._read(spark, "labels")
            merge_map = None
            new_labels = new_docs.select(
                "doc_id", F.col("doc_id").alias("cluster_id")
            )
            n_merged = n_relabel = 0
            if n_edges:
                # 3. contract: endpoints → current labels (new docs have
                #    none → themselves). Endpoint set is O(edges), so the
                #    label lookup is a broadcast semi-join + window over
                #    that bounded subset only.
                endpoints = (
                    edges.select(F.col("a_id").alias("doc_id"))
                    .union(edges.select(F.col("b_id").alias("doc_id")))
                    .distinct()
                )
                # endpoint set ≤ 2·edges — a known upper bound, no count
                ep_lab = self._latest_for(
                    lab_raw, endpoints, n_docs=2 * n_edges
                ).persist()
                pinned.append(ep_lab)
                la = ep_lab.select(
                    F.col("doc_id").alias("a_id"), F.col("cluster_id").alias("_la")
                )
                lb = ep_lab.select(
                    F.col("doc_id").alias("b_id"), F.col("cluster_id").alias("_lb")
                )
                cont = (
                    edges.join(la, "a_id", "left")
                    .join(lb, "b_id", "left")
                    .select(
                        F.coalesce("_la", "a_id").alias("a_id"),
                        F.coalesce("_lb", "b_id").alias("b_id"),
                    )
                    .filter(F.col("a_id") != F.col("b_id"))
                    .distinct()
                )
                # 4. CC over the CONTRACTED graph — O(new edges) nodes
                cc = components_of(cont).persist()
                pinned.append(cc)

                # old labels that changed → merge map (bounded by edges)
                old_label_ids = ep_lab.select(
                    F.col("cluster_id").alias("doc_id")
                ).distinct()
                merge_map = (
                    cc.join(old_label_ids, "doc_id", "left_semi")
                    .filter(F.col("doc_id") != F.col("cluster_id"))
                    .select(
                        F.col("doc_id").alias("_old"),
                        F.col("cluster_id").alias("_new"),
                    )
                    .persist()
                )
                pinned.append(merge_map)
                n_merged = merge_map.count()

                # new docs: CC label when in the graph, else self
                new_labels = (
                    new_docs.select("doc_id")
                    .join(cc.withColumnRenamed("cluster_id", "_cc"), "doc_id", "left")
                    .select(
                        "doc_id", F.coalesce("_cc", "doc_id").alias("cluster_id")
                    )
                )

            deltas = new_labels
            if merge_map is not None and n_merged:
                # 5. relabel members of merged components: one map-side
                #    column-pruned scan of the labels table, broadcast-
                #    filtered to the touched cluster ids, picks candidate
                #    docs (at scale: bucket pruning on cluster_id); the
                #    latest-label window then runs over THAT bounded
                #    subset only — a stale row naming a merged label
                #    must not relabel a doc whose current label moved on
                touched_docs = (
                    lab_raw.join(
                        bounded_broadcast(
                            merge_map.select(F.col("_old").alias("cluster_id")),
                            n_rows=n_merged,
                            label="inc-cc merge ids",
                        ),
                        "cluster_id",
                        "left_semi",
                    )
                    .select("doc_id")
                    .distinct()
                    .persist()  # labels-table scan — share it between
                )               # the guard's count and the semi-join
                pinned.append(touched_docs)
                relabel = (
                    self._latest_for(lab_raw, touched_docs)
                    .join(
                        bounded_broadcast(merge_map, n_rows=n_merged,
                                          label="inc-cc merge_map"),
                        F.col("cluster_id") == F.col("_old"),
                    )
                    .select("doc_id", F.col("_new").alias("cluster_id"))
                )
                n_relabel = relabel.count()
                deltas = deltas.unionByName(relabel)

            # 6. one commit: corpus rows + bands + label deltas land
            #    together or not at all
            self._publisher.publish(
                [
                    (new_docs, "corpus"),
                    (new_bands, "bands"),
                    (deltas.withColumn("seq", F.lit(seq)), "labels"),
                ]
            )
            return {
                "docs": n_docs,
                "edges": n_edges,
                "merged_labels": n_merged,
                "relabeled": n_relabel,
            }
        finally:
            for df_ in pinned:
                df_.unpersist()

    # ------------------------------------------------------------------

    def compact(self, spark: SparkSession, target_files: int = 4) -> dict:
        """Fold the labels history to the current assignment (one row
        per doc, seq preserved as the table max) and coalesce all three
        directories — delete-set manifest, crash-safe like
        CorpusIngest.compact. Read results are identical before/after."""
        import glob as _glob

        stats: dict = {}
        items: list = []
        removes: list = []
        lab_files = sorted(_glob.glob(os.path.join(self.root, "labels", "*.parquet")))
        stats["labels"] = {"before": len(lab_files)}
        if lab_files:
            lab = spark.read.parquet(*lab_files)
            w = Window.partitionBy("doc_id").orderBy(F.col("seq").desc())
            top_seq = int(lab.agg(F.max("seq")).collect()[0][0] or 0)
            folded = (
                lab.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select("doc_id", "cluster_id", F.lit(top_seq).alias("seq"))
                .coalesce(target_files)
            )
            items.append((folded, "labels"))
            removes.extend(
                {"dest": "labels", "file": os.path.basename(f)} for f in lab_files
            )
        for name in ("corpus", "bands"):
            files = sorted(_glob.glob(os.path.join(self.root, name, "*.parquet")))
            stats[name] = {"before": len(files)}
            if len(files) <= target_files:
                continue
            items.append((spark.read.parquet(*files).coalesce(target_files), name))
            removes.extend(
                {"dest": name, "file": os.path.basename(f)} for f in files
            )
        if items:
            self._publisher.publish(items, removes=removes)
        for name in stats:
            stats[name]["after"] = len(
                _glob.glob(os.path.join(self.root, name, "*.parquet"))
            )
        return stats

    def attach_stream(self, docs_stream: DataFrame, checkpoint: str,
                      effects_dir: str | None = None):
        """Continuous maintenance: each micro-batch of (doc_id, text)
        folds into the assignment under an effect-once marker — label
        and band appends are NOT idempotent, so a crash-replayed batch
        must short-circuit (the ``annindex.attach_index_stream``
        contract; ``effects_dir`` shares the checkpoint's lifecycle)."""
        from goose_spark.streaming.effects import EffectOnceTable

        effects = EffectOnceTable(
            effects_dir or checkpoint.rstrip("/") + "_effects"
        )

        def fold(bdf: DataFrame, bid: int) -> None:
            if bdf.isEmpty():
                return
            effects.run_once(
                f"cc-fold:{bid}",
                lambda: self.add_batch(bdf.sparkSession, bdf),
            )

        return (
            docs_stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
