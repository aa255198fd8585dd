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
