"""q90 cross-check via Spark's native recursive CTE (VERDICT r13
directive #6). This Spark build (4.1.2) executes WITH RECURSIVE
(SPARK-24497's UnionLoop) but enforces the ANSI restriction that the
recursive member may not AGGREGATE over the recursive reference
([INVALID_RECURSIVE_REFERENCE.PLACE]) — so the native formulation puts
the recursion where ANSI allows it: the recursive CTE performs the
hierarchy WALK (each level-k row joins one dim to find its level-k+1
parent, pure inner joins), and the per-level aggregation happens once
OUTSIDE the loop. Equality with the chained-aggregation q90 checks
both the walk and the aggregation algebra (sum-per-level over the
flattened closure == sum-of-sums through the levels; distinct-child
counts == per-level membership).
"""

from __future__ import annotations

import pytest

from goose_spark.queries import load_all
from tests.conftest import SF_CORRECT

REG = load_all()

_NATIVE = """
WITH RECURSIVE walk(lvl, node, parent, child, l0_members, tot) AS (
    SELECT 0, c.c_name, CAST(c.c_nationkey AS BIGINT), c.c_name,
           CAST(COUNT(*) AS BIGINT),
           SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
    FROM rcte_orders o JOIN rcte_customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_name, c.c_nationkey
    UNION ALL
    SELECT lvl + 1,
           CASE lvl WHEN 0 THEN n.n_name ELSE r.r_name END,
           CASE lvl WHEN 0 THEN CAST(n.n_regionkey AS BIGINT)
                    ELSE CAST(-1 AS BIGINT) END,
           walk.node, walk.l0_members, walk.tot
    FROM walk
    LEFT JOIN rcte_nation n ON lvl = 0 AND n.n_nationkey = walk.parent
    LEFT JOIN rcte_region r ON lvl = 1 AND r.r_regionkey = walk.parent
    WHERE lvl < 2
      AND ((lvl = 0 AND n.n_nationkey IS NOT NULL)
           OR (lvl = 1 AND r.r_regionkey IS NOT NULL))
)
SELECT lvl, node,
       CASE WHEN lvl = 0 THEN CAST(SUM(l0_members) AS BIGINT)
            ELSE COUNT(DISTINCT child) END AS members,
       ROUND(CAST(SUM(tot) AS DOUBLE), 2) AS total
FROM walk GROUP BY lvl, node ORDER BY lvl, node
"""


def test_q90_equals_native_recursive_cte(spark):
    import os

    for tbl in ("orders", "customer", "nation", "region"):
        spark.read.parquet(os.path.join(SF_CORRECT, f"{tbl}.parquet")) \
            .createOrReplaceTempView(f"rcte_{tbl}")
    try:
        native = [tuple(r) for r in spark.sql(_NATIVE).collect()]
    except Exception as exc:
        # version gate only: unsupported WITH RECURSIVE must skip with
        # the reason pinned; a wrong RESULT must still fail below
        from pyspark.errors import AnalysisException, ParseException

        if isinstance(exc, (AnalysisException, ParseException)):
            pytest.skip(
                "this Spark build rejects the native recursive "
                f"formulation: {type(exc).__name__}: "
                f"{str(exc).splitlines()[0][:200]}"
            )
        raise
    chained = [
        tuple(r)
        for r in REG["q90_hierarchy_rollup_walk"].builder(spark, SF_CORRECT).collect()
    ]
    assert native == chained


def test_walk_join_shape_is_legal_recursion(spark):
    """Pin the capability finding itself: plain WITH RECURSIVE executes
    on this build (so the q90 test above is live, not permanently
    skipped), and an AGGREGATING recursive member is rejected with the
    documented error class — if a future Spark lifts the restriction,
    this fails and the native form can be simplified."""
    got = spark.sql(
        """WITH RECURSIVE r(n) AS (
             SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 4)
           SELECT CAST(SUM(n) AS BIGINT) AS s FROM r"""
    ).collect()[0]["s"]
    assert got == 10
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException, match="INVALID_RECURSIVE_REFERENCE"):
        spark.sql(
            """WITH RECURSIVE a(lvl, k) AS (
                 SELECT 0, id FROM RANGE(3)
                 UNION ALL
                 SELECT lvl + 1, CAST(COUNT(*) AS BIGINT) FROM a
                 WHERE lvl < 1 GROUP BY lvl)
               SELECT * FROM a"""
        ).collect()
