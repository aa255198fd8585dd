"""Materialized job-state view — the MERGE-target twin of
``Ledger.state()`` (round-9 directive #3).

``Ledger.state()`` derives latest-row-per-id with a window over the
whole log: correct at any scale, but every read re-pays the full-log
shuffle. SCALE.md promises the 100 TB alternative — "a materialized
MERGE target updated per micro-batch". This module is that target,
backed by plain parquet plus the repo's own transaction-log machinery
(the Delta shape without requiring delta-spark, exactly like
``Ledger``'s commit manifests):

    files/<bucket>-<uuid>.parquet   one file per hash bucket of id
    manifest.json                   {buckets: {b: filename}, last_batch,
                                     retired: [prev version's files]}

An upsert batch touches ONLY the buckets its ids hash into: merge
(stored bucket rows ∪ batch rows) → max-seq per id → write those
buckets' replacement files → atomically swap the manifest (temp +
``os.replace``, the ledger's commit idiom). Readers always see a
consistent view: the manifest names complete files only; a crash
mid-upsert leaves orphan files (``vacuum()``), never a torn view.
Replaced files are retained for one commit (the manifest's ``retired``
list — Delta-style retention) so a reader holding the previous
version's manifest finishes its scan; see ``read()`` for the lag
contract. At
100 TB the bucket count scales with the table so a micro-batch rewrites
O(batch) buckets, not the corpus — the same file-level pruning a Delta
MERGE gets from its add/remove actions.

Exactly-once under replay WITHOUT a side marker table: the manifest
records ``last_batch``, so applying the commit and recording the batch
id is ONE atomic rename — a replayed foreachBatch id ≤ last_batch
no-ops. (The effect-once marker table covers sinks that can't carry
the batch id; a self-describing manifest is the stronger form.)
Single-writer contract: one maintaining stream per view, same as a
Delta table's optimistic-concurrency writer assumption.

Reference analog: goose's Redis broker holds current job state as the
mutable value and derives nothing (``src/goose/brokers/redis/api/
enqueued_jobs.clj``); the ledger keeps history and this view restores
O(1)-read current state.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Default hash-bucket count. Sized so a micro-batch rewrite stays a
#: few files at test scale; at 100 TB this scales with the id space
#: (e.g. 4096) so each batch touches O(batch) buckets.
N_BUCKETS = 16


class MaterializedState:
    def __init__(self, root: str, n_buckets: int = N_BUCKETS):
        self.root = root
        self.files_dir = os.path.join(root, "files")
        self.manifest_path = os.path.join(root, "manifest.json")
        os.makedirs(self.files_dir, exist_ok=True)
        self._n_buckets = n_buckets

    # ---- manifest ----------------------------------------------------

    def _manifest(self) -> dict:
        try:
            with open(self.manifest_path) as fh:
                return json.load(fh)
        except OSError:
            return {
                "version": 0,
                "last_batch": -1,
                "n_buckets": self._n_buckets,
                "buckets": {},
                "retired": [],
            }

    def _commit(self, manifest: dict) -> None:
        tmp = self.manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.manifest_path)  # ← the commit point

    # ---- reads --------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame:
        """The current state view: one scan of the manifest's files, no
        window, no shuffle — the O(1)-read form of ``Ledger.state()``.

        Reader contract: the manifest is resolved PER CALL — build a
        fresh ``read()`` for each query rather than holding one
        DataFrame across maintenance commits. A held view stays
        readable for exactly one subsequent commit (its files are
        ``retired``, not deleted, until the commit after that); beyond
        one version of lag its files may be removed underneath it.
        """
        from goose_spark.streaming.ledger import Ledger

        manifest = self._manifest()
        files = [
            os.path.join(self.files_dir, f)
            for f in sorted(manifest["buckets"].values())
        ]
        schema = Ledger._spark_log_schema()
        if not files:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*files)

    # ---- writes -------------------------------------------------------

    def upsert(self, spark: SparkSession, batch: DataFrame,
               batch_id: int | None = None) -> dict:
        """Fold one micro-batch of log rows into the view. Touches only
        the hash buckets the batch's ids map to; commit = one manifest
        rename carrying both the new file set AND ``last_batch``, so a
        replayed ``batch_id`` ≤ last_batch is a no-op (exactly-once
        without a side marker). Returns {'applied', 'buckets'}."""
        manifest = self._manifest()
        if batch_id is not None and batch_id <= manifest["last_batch"]:
            return {"applied": False, "buckets": 0}
        nb = manifest["n_buckets"]
        bucket = F.pmod(F.xxhash64("id"), F.lit(nb)).cast("int")

        # latest per id WITHIN the batch first (a batch can carry
        # several transitions of one job)
        w = Window.partitionBy("id").orderBy(F.col("seq").desc())
        b_latest = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("_bucket", bucket)
            .persist()
        )
        try:
            affected = sorted(
                r["_bucket"]
                for r in b_latest.select("_bucket").distinct().collect()
            )
            if not affected:
                return {"applied": False, "buckets": 0}

            # merge with the stored rows of ONLY the affected buckets
            stored_files = [
                os.path.join(self.files_dir, manifest["buckets"][str(b)])
                for b in affected
                if str(b) in manifest["buckets"]
            ]
            merged = b_latest
            if stored_files:
                from goose_spark.streaming.ledger import Ledger

                stored = (
                    spark.read.schema(Ledger._spark_log_schema())
                    .parquet(*stored_files)
                    .withColumn("_bucket", bucket)
                )
                merged = stored.unionByName(b_latest)
            merged = (
                merged.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )

            # one job writes every affected bucket's replacement file
            staging = os.path.join(self.root, f".staging-{uuid.uuid4().hex}")
            try:
                (
                    merged.repartition("_bucket")
                    .write.partitionBy("_bucket")
                    .mode("overwrite")
                    .parquet(staging)
                )
                new_buckets = dict(manifest["buckets"])
                for b in affected:
                    part_dir = os.path.join(staging, f"_bucket={b}")
                    parts = (
                        sorted(
                            f for f in os.listdir(part_dir)
                            if f.endswith(".parquet")
                        )
                        if os.path.isdir(part_dir)
                        else []
                    )
                    if not parts:
                        # every row of this bucket was superseded away —
                        # cannot happen on append-only logs, but keep the
                        # manifest honest
                        new_buckets.pop(str(b), None)
                        continue
                    assert len(parts) == 1, parts  # repartition("_bucket")
                    dst = f"{b}-{uuid.uuid4().hex}.parquet"
                    os.replace(
                        os.path.join(part_dir, parts[0]),
                        os.path.join(self.files_dir, dst),
                    )
                    new_buckets[str(b)] = dst
            finally:
                shutil.rmtree(staging, ignore_errors=True)

            old_files = [
                manifest["buckets"][str(b)]
                for b in affected
                if str(b) in manifest["buckets"]
            ]
            # Delta-style retention: files replaced by THIS commit stay
            # on disk (listed as `retired`) until the NEXT commit, so a
            # reader that resolved the previous manifest version can
            # still finish its scan — the immediate-delete form races
            # with lagging readers (FileNotFound on an already-planned
            # read). One version of lag is the contract; see read().
            prev_retired = manifest.get("retired", [])
            manifest = {
                "version": manifest["version"] + 1,
                "last_batch": max(
                    manifest["last_batch"],
                    batch_id if batch_id is not None else manifest["last_batch"],
                ),
                "n_buckets": nb,
                "buckets": new_buckets,
                "retired": old_files,
            }
            self._commit(manifest)
            # post-commit cleanup of the PREVIOUS generation's retired
            # files (replaced two commits ago — no reader within the
            # one-version retention window references them). Best-effort;
            # a crash here leaves orphans for vacuum(), never a torn view.
            for f in prev_retired:
                try:
                    os.remove(os.path.join(self.files_dir, f))
                except OSError:
                    pass
            return {"applied": True, "buckets": len(affected)}
        finally:
            b_latest.unpersist()

    def vacuum(self) -> int:
        """Remove files the manifest no longer references (crash debris
        between commit and cleanup). Safe any time for readers within
        the one-version retention window: files in ``retired`` (the
        previous version's, possibly still being scanned) are kept;
        anything else unreferenced was either never committed (staging
        debris — no reader ever saw it) or replaced ≥2 commits ago."""
        manifest = self._manifest()
        live = set(manifest["buckets"].values()) | set(manifest.get("retired", []))
        removed = 0
        for f in os.listdir(self.files_dir):
            if f.endswith(".parquet") and f not in live:
                os.remove(os.path.join(self.files_dir, f))
                removed += 1
        return removed

    # ---- streaming maintenance -----------------------------------------

    def attach_stream(self, log_stream: DataFrame, checkpoint: str):
        """Maintain the view from ``Ledger.log_stream``: one upsert per
        micro-batch, exactly-once via the manifest's ``last_batch`` (a
        crash-replayed batch id no-ops — no separate effects dir to
        lifecycle-manage). Returns the started query."""

        def fold(bdf: DataFrame, bid: int) -> None:
            if bdf.isEmpty():
                return
            self.upsert(bdf.sparkSession, bdf, batch_id=bid)

        return (
            log_stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
