"""Console data layer — goose's web console re-expressed as JSON page
assemblies over the ledger.

The reference console is Ring handlers + bidi routes + hiccup HTML
(``src/goose/console.clj:273-291``, ``src/goose/brokers/redis/console.clj``);
its *data* layer (``console/data.clj``) validates params, dispatches
filters, paginates, and returns job seqs. This module is that data
layer: each ``page_*`` function mirrors a console route and returns a
JSON-able dict (attach any HTTP framework on top — the engine keeps the
same handler/data split the reference has).

Param validation mirrors ``console/specs.clj``: page → positive long
(default 1), filter-type ∈ {id, execute-fn, type}, limit ≤ 10000.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from goose_spark.api import PAGE_SIZE, LedgerAPI

MAX_LIMIT = 10_000  # src/goose/brokers/redis/console/specs.clj
FILTER_TYPES = ("id", "execute-fn", "type")
JOB_TYPES = ("failed", "unexecuted", "scheduled")  # console/specs.clj:9-13


def _validate_page(page) -> int:
    try:
        p = int(page)
        return p if p >= 1 else 1
    except (TypeError, ValueError):
        return 1


def _validate_limit(limit) -> int:
    try:
        return max(1, min(int(limit), MAX_LIMIT))
    except (TypeError, ValueError):
        return PAGE_SIZE


class Console:
    def __init__(self, api: LedgerAPI):
        self.api = api

    # -- GET / (home dashboard, console/pages/home.clj:7-25) ---------------

    def page_home(self) -> dict:
        counts = self.api.dashboard_counts()
        return {
            "enqueued": counts.get("enqueued", 0) + counts.get("in_progress", 0),
            "scheduled": counts.get("scheduled", 0) + counts.get("retrying", 0),
            "dead": counts.get("dead", 0),
            "cron": self.api.cron_size(),
            # W9 process-set view (heartbeat.clj:16-20; the reference's
            # home header shows the live worker fleet)
            "workers": self.api.workers_count(),
            "by_status": counts,
        }

    # -- GET /enqueued/queue/:queue (console/pages/enqueued.clj:90-114) ----

    def page_enqueued(self, queue: str, page=1, filter_type=None,
                      filter_value=None, limit=PAGE_SIZE) -> dict:
        page = _validate_page(page)
        limit = _validate_limit(limit)
        base = self.api.state().filter(
            (F.col("status") == "enqueued") & (F.col("queue") == queue)
        )
        if filter_type is not None:
            jobs = self._filtered(base, filter_type, filter_value, limit)
            return {"queue": queue, "jobs": jobs, "total": len(jobs), "filtered": True}
        total = base.count()
        jobs = self.api.page(queue, page=page)
        return {
            "queue": queue,
            "page": page,
            "total": total,
            "jobs": jobs,
            "filtered": False,
        }

    def _filtered(self, df, filter_type, value, limit) -> list[dict]:
        # dispatch parity: console/data.clj:30-48
        if filter_type not in FILTER_TYPES:
            raise ValueError(f"filter-type must be one of {FILTER_TYPES}")
        if filter_type == "id":
            pred = F.col("id") == value
        elif filter_type == "execute-fn":
            pred = F.col("execute_fn") == value
        else:
            if value not in JOB_TYPES:
                raise ValueError(f"type must be one of {JOB_TYPES}")
            pred = {
                "failed": F.col("error").isNotNull(),  # job.clj:18-19
                "unexecuted": F.col("error").isNull(),
                "scheduled": F.col("run_at").isNotNull(),
            }[value]
        return [r.asDict() for r in df.filter(pred).limit(limit).collect()]

    # -- GET /scheduled, /dead (same shapes over other states) -------------

    def page_scheduled(self, page=1) -> dict:
        page = _validate_page(page)
        df = (
            self.api.state()
            .filter(F.col("status").isin("scheduled", "retrying"))
            .orderBy("run_at", "id")
        )
        total = df.count()
        rows = df.limit(page * PAGE_SIZE).offset((page - 1) * PAGE_SIZE).collect()
        return {"page": page, "total": total, "jobs": [r.asDict() for r in rows]}

    def page_dead(self, page=1) -> dict:
        page = _validate_page(page)
        df = (
            self.api.state()
            .filter(F.col("status") == "dead")
            .orderBy(F.col("died_at").desc(), "id")  # newest-first (ZREVRANGE)
        )
        total = df.count()
        rows = df.limit(page * PAGE_SIZE).offset((page - 1) * PAGE_SIZE).collect()
        return {"page": page, "total": total, "jobs": [r.asDict() for r in rows]}

    # -- GET /cron (registry listing) ---------------------------------------

    def page_cron(self) -> dict:
        entries = self.api.cron_entries()
        return {"total": len(entries), "entries": entries}

    # -- GET /batch/:id (api/batch.clj:8-16 shape) ---------------------------

    def page_batch(self, batch_id: str) -> dict | None:
        rows = (
            self.api.state()
            .filter(F.col("batch_id") == batch_id)
            .groupBy("status")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        if not rows:
            return None
        counts = {r["status"]: r["n"] for r in rows}
        from goose_spark.schema import batch_status

        enq = sum(counts.get(s, 0) for s in ("enqueued", "in_progress", "scheduled"))
        return {
            "batch_id": batch_id,
            "counts": counts,
            "status": batch_status(
                enq, counts.get("retrying", 0), counts.get("success", 0), counts.get("dead", 0)
            ),
        }
