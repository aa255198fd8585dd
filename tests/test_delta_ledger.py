"""Delta ledger backend — wire tests for everything non-environmental
(the env gate itself, the backend flag, the session configs, the as-of
cursor mapping), mirroring the Kafka connector's honest-gate pattern
(tests/test_kafka_wire.py)."""

from __future__ import annotations

import pytest

from goose_spark.streaming.delta_ledger import (
    DELTA_SPARK_CONFIGS,
    DeltaLedger,
    as_of_read_option,
    delta_available,
    open_ledger,
)
from goose_spark.streaming.ledger import Ledger


def test_delta_gate_raises_without_delta_spark(tmp_path):
    if delta_available():  # pragma: no cover — not this container
        pytest.skip("delta-spark installed; gate not applicable")
    with pytest.raises(NotImplementedError, match="delta-spark"):
        DeltaLedger(str(tmp_path / "ledger"))
    with pytest.raises(NotImplementedError, match="delta-spark"):
        open_ledger(str(tmp_path / "ledger"), backend="delta")


def test_backend_flag(tmp_path):
    led = open_ledger(str(tmp_path / "ledger"))
    assert type(led) is Ledger
    with pytest.raises(ValueError, match="unknown ledger backend"):
        open_ledger(str(tmp_path / "l2"), backend="redis")


def test_required_session_configs():
    # the two configs every Delta deployment must set (delta.io docs)
    assert DELTA_SPARK_CONFIGS["spark.sql.extensions"] == (
        "io.delta.sql.DeltaSparkSessionExtension"
    )
    assert "DeltaCatalog" in DELTA_SPARK_CONFIGS["spark.sql.catalog.spark_catalog"]


def test_as_of_cursor_mapping():
    # ns-epoch seq cursor → timestampAsOf at µs precision
    opt = as_of_read_option(seq=1_700_000_000_123_456_789)
    assert opt == {"timestampAsOf": "2023-11-14 22:13:20.123457"}
    # int ts → versionAsOf; str/datetime ts → timestampAsOf
    assert as_of_read_option(ts=42) == {"versionAsOf": "42"}
    assert as_of_read_option(ts="2024-01-01") == {"timestampAsOf": "2024-01-01"}
    with pytest.raises(ValueError):
        as_of_read_option()
    with pytest.raises(ValueError):
        as_of_read_option(seq=1, ts=2)
