"""Driver-gate rehearsal: every registered query with an oracle must
hash-match DuckDB at sf0.01 (the exact scale the driver checks)."""

from __future__ import annotations

import pytest

from goose_spark.queries import load_all
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare

# excluded from the DEFAULT pytest run (pytest.ini deselects
# 'slowsuite' so 'python -m pytest tests/ -x -q' completes inside
# the grading driver's window — r15 directive 5); tools/partest.py
# and 'pytest -m ""' still run it
pytestmark = pytest.mark.slowsuite

REGISTRY = load_all()
NAMES = sorted(REGISTRY)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, oracle):
    spec = REGISTRY[name]
    df = spec.builder(spark, SF_CORRECT)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    problems = compare(df, oracle, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)
