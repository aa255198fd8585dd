"""Kafka transport transforms (sources/io.py) — the broker-side wire
format is testable without a broker: batch DataFrames in the exact
KAFKA_WIRE_SCHEMA the connector produces.

Parity target: the reference's queue transport contract — one topic per
queue (src/goose/defaults.clj:24-26), whole-job blob as the message
value (src/goose/utils.clj:13-17), per-queue FIFO via the partition key
(src/goose/brokers/redis/commands.clj:128-132).
"""

from __future__ import annotations

import datetime as dt
import json

import pytest

from goose_spark.schema import DEFAULT_MAX_RETRIES, JOB_SCHEMA
from goose_spark.sources.io import (
    KAFKA_WIRE_SCHEMA,
    TOPIC_PREFIX,
    jobs_to_kafka_records,
    kafka_records_to_jobs,
)

TS = dt.datetime(2026, 3, 1, 12, 0, 0)


def _record(value: bytes | None, topic: str = f"{TOPIC_PREFIX}default",
            offset: int = 0) -> tuple:
    return (b"default", value, topic, 0, offset, TS, 0)


def _records_df(spark, rows):
    return spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)


def test_roundtrip_preserves_full_job_row(spark):
    full = {
        "id": "job-1", "queue": "default", "execute_fn": "noop",
        "args": json.dumps([1, "x"]), "status": "enqueued", "priority": 0,
        "enqueued_at": TS, "run_at": TS + dt.timedelta(seconds=30),
        "cron_name": None, "batch_id": "b-1", "retry_count": 2,
        "max_retries": 5, "retry_queue": None, "error": "boom",
        "first_failed_at": TS, "last_retried_at": None, "died_at": None,
        "worker_id": "w-0",
    }
    jobs = spark.createDataFrame([tuple(full[f.name] for f in JOB_SCHEMA.fields)], JOB_SCHEMA)
    wire = jobs_to_kafka_records(jobs)
    [w] = wire.collect()
    assert w["topic"] == f"{TOPIC_PREFIX}default"
    assert bytes(w["key"]) == b"default"

    # feed the produced value back through the consumer transform
    back = kafka_records_to_jobs(
        _records_df(spark, [_record(bytes(w["value"]))])
    )
    assert back.schema == JOB_SCHEMA or [f.name for f in back.schema.fields] == [
        f.name for f in JOB_SCHEMA.fields
    ]
    [row] = back.collect()
    for f in JOB_SCHEMA.fields:
        assert row[f.name] == full[f.name], f.name


def test_sparse_producer_payload_gets_goose_defaults(spark):
    value = json.dumps({"id": "job-2", "execute_fn": "noop"}).encode()
    [row] = kafka_records_to_jobs(
        _records_df(spark, [_record(value, topic=f"{TOPIC_PREFIX}billing")])
    ).collect()
    assert row["queue"] == "billing"  # from the topic suffix
    assert row["status"] == "enqueued"
    assert row["priority"] == 0
    assert row["max_retries"] == DEFAULT_MAX_RETRIES
    assert row["retry_count"] == 0
    assert row["enqueued_at"] == TS  # broker append time


def test_malformed_payloads_drop_or_flag(spark):
    rows = [
        _record(json.dumps({"id": "ok", "execute_fn": "noop"}).encode(), offset=0),
        _record(b"not json at all", offset=1),
        _record(json.dumps({"queue": "q"}).encode(), offset=2),  # no id/fn
        _record(None, offset=3),
    ]
    good = kafka_records_to_jobs(_records_df(spark, rows))
    assert [r["id"] for r in good.collect()] == ["ok"]

    flagged = kafka_records_to_jobs(_records_df(spark, rows), drop_malformed=False)
    assert flagged.filter("_malformed").count() == 3


def test_partitioning_contract_one_topic_per_queue(spark):
    jobs = spark.createDataFrame(
        [
            ("a", "q1", "noop", None, "enqueued", 0, TS, None, None, None,
             0, 3, None, None, None, None, None, None),
            ("b", "q2", "noop", None, "enqueued", 0, TS, None, None, None,
             0, 3, None, None, None, None, None, None),
        ],
        JOB_SCHEMA,
    )
    wire = jobs_to_kafka_records(jobs).collect()
    assert {w["topic"] for w in wire} == {f"{TOPIC_PREFIX}q1", f"{TOPIC_PREFIX}q2"}
    assert {bytes(w["key"]) for w in wire} == {b"q1", b"q2"}


def test_kafka_stream_gate_raises_without_connector(spark):
    from goose_spark.sources.io import kafka_stream

    with pytest.raises(NotImplementedError):
        kafka_stream(spark, "localhost:9092", "goose.jobs.default")


# --- property-based roundtrip -------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_ident = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789-_", min_size=1, max_size=20
)
_text = st.text(min_size=0, max_size=40).filter(
    lambda s: "\x00" not in s and not any("\ud800" <= c <= "\udfff" for c in s)
)
_ts = st.datetimes(
    min_value=dt.datetime(2020, 1, 1), max_value=dt.datetime(2030, 12, 31)
).map(lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000))

_job = st.fixed_dictionaries(
    {
        "id": _ident,
        "queue": _ident,
        "execute_fn": _ident,
        "args": st.one_of(
            st.none(),
            st.lists(st.one_of(st.integers(-10**6, 10**6), _text), max_size=4).map(
                json.dumps
            ),
        ),
        "status": st.sampled_from(["enqueued", "scheduled", "retrying", "dead"]),
        "priority": st.integers(0, 1),
        "enqueued_at": _ts,
        "run_at": st.one_of(st.none(), _ts),
        "cron_name": st.one_of(st.none(), _ident),
        "batch_id": st.one_of(st.none(), _ident),
        "retry_count": st.integers(0, 27),
        "max_retries": st.integers(0, 27),
        "retry_queue": st.one_of(st.none(), _ident),
        "error": st.one_of(st.none(), _text.filter(lambda s: s != "")),
        "first_failed_at": st.one_of(st.none(), _ts),
        "last_retried_at": st.one_of(st.none(), _ts),
        "died_at": st.one_of(st.none(), _ts),
        "worker_id": st.one_of(st.none(), _ident),
    }
)


@given(st.lists(_job, min_size=1, max_size=6, unique_by=lambda j: j["id"]))
@settings(max_examples=10, deadline=None)
def test_wire_roundtrip_property(spark_prop, jobs_data):
    """produce→consume is the identity on arbitrary well-formed job rows
    (the nippy freeze/thaw roundtrip contract, utils.clj:13-28)."""
    from pyspark.sql import functions as F

    spark = spark_prop
    rows = [tuple(j[f.name] for f in JOB_SCHEMA.fields) for j in jobs_data]
    jobs = spark.createDataFrame(rows, JOB_SCHEMA)
    back = kafka_records_to_jobs(
        jobs_to_kafka_records(jobs)
        .withColumn("partition", F.lit(0))
        .withColumn("offset", F.lit(0).cast("long"))
        .withColumn("timestamp", F.lit(TS).cast("timestamp"))
        .withColumn("timestampType", F.lit(0))
    )
    got = {r["id"]: r.asDict() for r in back.collect()}
    assert set(got) == {j["id"] for j in jobs_data}
    for j in jobs_data:
        for f in JOB_SCHEMA.fields:
            assert got[j["id"]][f.name] == j[f.name], (j["id"], f.name)
