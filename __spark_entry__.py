"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship multi-way join; ``queries()`` /
``oracle_sql()`` expose the full declared inventory (SURVEY.md §2.6 plus
the LLM-pipeline operator extensions) for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q5-shaped multi-way join + revenue aggregate
    (broadcast dims, single large shuffle) on sf0.001."""
    from goose_spark.queries import load_all

    return load_all()["q06_multiway_join_agg"].builder(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from goose_spark.queries import load_all

    return {name: spec.builder for name, spec in sorted(load_all().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-matchable query.

    Queries absent here (streaming / iterative ops) get the driver's
    weaker rows-only check by design.
    """
    from goose_spark.queries import load_all

    return {
        name: spec.oracle
        for name, spec in sorted(load_all().items())
        if spec.oracle is not None
    }
