"""Physical-plan inspection — codifies the perf-pass checks ("is the
filter pushed down? did the dim broadcast? is the top-k group-limited?")
as assertable properties, so plan regressions fail tests instead of
silently shipping slow plans to the 100 TB cluster."""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class TreeCounts:
    """Operator counts from a WALK of the physical-plan tree — what
    actually executes. ``SparkPlan.toString`` (and PLANS.md's former
    text counts) re-prints a cached frame's ENTIRE build plan at every
    InMemoryTableScan site, and prints BOTH the final and initial AQE
    plans of executed cached subtrees, so a query scanning one persisted
    frame N times appeared to contain ~2N copies of the build's
    exchanges — execution builds the cache once and every further scan
    reads blocks. The walk descends into each distinct cached plan
    exactly once and into AQE's current plan only."""

    shuffles: int = 0
    broadcast_joins: int = 0
    sort_merge_joins: int = 0
    single_partition_exchanges: int = 0


def tree_counts(df: DataFrame) -> TreeCounts:
    plan = df._jdf.queryExecution().executedPlan()
    counts = TreeCounts()
    seen_caches: set[int] = set()
    stack = [plan]
    while stack:
        p = stack.pop()
        cls = p.getClass().getSimpleName()
        if cls == "ShuffleExchangeExec":
            part = p.outputPartitioning().toString()
            if "SinglePartition" in part:
                counts.single_partition_exchanges += 1
            elif "hashpartitioning" in part or "rangepartitioning" in part:
                counts.shuffles += 1
        elif cls == "BroadcastHashJoinExec":
            counts.broadcast_joins += 1
        elif cls == "SortMergeJoinExec":
            counts.sort_merge_joins += 1
        elif cls == "InMemoryTableScanExec":
            cached = p.relation().cachedPlan()
            key = cached.hashCode()
            if key not in seen_caches:
                seen_caches.add(key)
                stack.append(cached)
            continue
        elif cls == "AdaptiveSparkPlanExec":
            stack.append(p.executedPlan())
            continue
        elif cls == "ReusedExchangeExec":
            # references an exchange counted at its original site
            continue
        elif cls.endswith("QueryStageExec"):
            stack.append(p.plan())
            continue
        ch = p.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return counts


@dataclass
class PlanReport:
    text: str

    @property
    def pushed_filters(self) -> list[str]:
        return re.findall(r"PushedFilters: \[([^\]]*)", self.text)

    @property
    def read_schemas(self) -> list[str]:
        return re.findall(r"ReadSchema: (struct<[^>]*>)", self.text)

    @property
    def broadcast_joins(self) -> int:
        return self.text.count("BroadcastHashJoin")

    @property
    def sort_merge_joins(self) -> int:
        return self.text.count("SortMergeJoin")

    @property
    def shuffles(self) -> int:
        return self.text.count("Exchange hashpartitioning") + self.text.count(
            "Exchange rangepartitioning"
        )

    @property
    def single_partition_exchanges(self) -> int:
        """Count of plan nodes funneling ALL rows into one task — the
        at-scale anti-pattern (global unpartitioned Window/Sort). The
        final TakeOrderedAndProject of an orderBy+limit does not count:
        it merges per-partition top-Ks, it never materializes the full
        order."""
        return self.text.count("Exchange SinglePartition")

    @property
    def has_window_group_limit(self) -> bool:
        return "WindowGroupLimit" in self.text

    @property
    def has_take_ordered(self) -> bool:
        return "TakeOrderedAndProject" in self.text

    def scanned_columns(self, table_hint: str) -> list[str]:
        """Columns read from the scan whose path contains table_hint."""
        for line in self.text.splitlines():
            if "FileScan" in line and table_hint in line:
                m = re.search(r"ReadSchema: struct<([^>]*)>", line)
                if m:
                    return [c.split(":")[0] for c in m.group(1).split(",") if c]
        return []


def report(df: DataFrame) -> PlanReport:
    return PlanReport(physical_plan(df))
