"""Source/sink connectors (SURVEY §2.1 S10/S11 analog surface).

The reference's "sources" are broker queues (Redis lists / RMQ queues);
the engine's sources are storage formats + streams. This module gives
the uniform load/save surface: batch formats (parquet/csv/json/orc),
streaming file sources, and gated connectors for systems absent from
this environment (Kafka, Delta) — the call sites are real, the drivers
load lazily.

Scale defaults: writers partition by the supplied columns (partition
pruning on read), `maxFilesPerTrigger` bounds streaming admission, CSV/
JSON readers take explicit schemas (schema inference is a full extra
scan at 100 TB — never in production paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BATCH_FORMATS = ("parquet", "csv", "json", "orc")


def load(spark: SparkSession, path: str, fmt: str = "parquet",
         schema: T.StructType | str | None = None, **options) -> DataFrame:
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported format {fmt!r} (supported: {BATCH_FORMATS})")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        # inference = an extra full scan; allow it but make it explicit
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def save(df: DataFrame, path: str, fmt: str = "parquet",
         mode: str = "error", partition_by: list[str] | None = None,
         **options) -> None:
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported format {fmt!r} (supported: {BATCH_FORMATS})")
    if fmt == "csv":
        options.setdefault("header", "true")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def load_stream(spark: SparkSession, path: str, schema: T.StructType | str,
                fmt: str = "parquet", max_files_per_trigger: int = 512,
                **options) -> DataFrame:
    """Streaming file source — explicit schema required (streaming scans
    cannot infer), admission-controlled per trigger."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .options(**options)
        .load(path)
    )


def kafka_stream(spark: SparkSession, bootstrap: str, topic: str, **options) -> DataFrame:
    """Kafka source — the production ledger transport (SCALE.md). The
    connector jar is not present in this environment; the call site is
    the real API shape."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("subscribe", topic)
            .options(**options)
            .load()
        )
    except Exception as exc:  # pragma: no cover — absent connector
        raise NotImplementedError(
            "kafka connector not available in this environment"
        ) from exc


# ---------------------------------------------------------------------------
# Kafka wire format (transport for the job ledger at scale — SCALE.md).
#
# The connector binding above is environmental; everything else about the
# Kafka path — the wire schema, the record<->job-row transforms, and the
# per-queue partitioning contract — is plain DataFrame code, testable
# without a broker by constructing batch DataFrames in KAFKA_WIRE_SCHEMA.
# ---------------------------------------------------------------------------

#: Exact schema the Spark Kafka source produces (and the sink consumes:
#: key/value/topic). Mirrors spark-sql-kafka's fixed output columns.
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)

#: Topic naming contract: one topic per goose queue (the analog of the
#: reference's one-Redis-list-per-queue, src/goose/defaults.clj:24-26).
TOPIC_PREFIX = "goose.jobs."


def jobs_to_kafka_records(jobs):
    """Producer-side transform: ledger rows → Kafka records.

    key = job queue (all rows of a queue land on one topic-partition,
    preserving goose's per-queue FIFO within a partition — the same
    ordering contract as the Redis list, src/goose/brokers/redis/
    commands.clj:128-132); value = the whole job row as JSON (the
    engine's analog of the nippy blob, src/goose/utils.clj:13-17).
    """
    from pyspark.sql import functions as F

    cols = [f.name for f in jobs.schema.fields]
    return jobs.select(
        F.col("queue").cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*cols)).cast("binary").alias("value"),
        F.concat(F.lit(TOPIC_PREFIX), F.col("queue")).alias("topic"),
    )


def kafka_records_to_jobs(records, drop_malformed: bool = True):
    """Consumer-side transform: Kafka records → ledger-schema rows.

    Parses ``value`` against JOB_SCHEMA, then normalizes the fields a
    sparse producer may omit: status defaults to 'enqueued', priority to
    back-of-queue, max_retries to the goose default
    (src/goose/retry.clj:61), enqueued_at to the broker append time
    (Kafka record timestamp), and queue to the topic suffix. Malformed
    payloads (unparseable JSON / missing id or execute_fn) are dropped
    by default — pass drop_malformed=False to keep them with a
    ``_malformed`` flag for a dead-letter sink.
    """
    from pyspark.sql import functions as F

    from goose_spark.schema import (
        DEFAULT_MAX_RETRIES,
        JOB_SCHEMA,
        PRIORITY_BACK,
        STATUS_ENQUEUED,
    )

    j = records.select(
        F.from_json(F.col("value").cast("string"), JOB_SCHEMA).alias("j"),
        F.col("topic"),
        F.col("timestamp").alias("_kafka_ts"),
    )
    topic_queue = F.regexp_replace("topic", f"^{TOPIC_PREFIX.replace('.', chr(92) + '.')}", "")
    fixed = {
        "queue": F.coalesce(F.col("j.queue"), topic_queue),
        "status": F.coalesce(F.col("j.status"), F.lit(STATUS_ENQUEUED)),
        "priority": F.coalesce(F.col("j.priority"), F.lit(PRIORITY_BACK)),
        "enqueued_at": F.coalesce(F.col("j.enqueued_at"), F.col("_kafka_ts")),
        "max_retries": F.coalesce(F.col("j.max_retries"), F.lit(DEFAULT_MAX_RETRIES)),
        "retry_count": F.coalesce(F.col("j.retry_count"), F.lit(0)),
    }
    out = j.select(
        *[fixed.get(f.name, F.col(f"j.{f.name}")).alias(f.name) for f in JOB_SCHEMA.fields]
    )
    malformed = F.col("id").isNull() | F.col("execute_fn").isNull()
    if drop_malformed:
        return out.filter(~malformed)
    return out.withColumn("_malformed", malformed)


def load_jsonl_quarantined(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    required: tuple = ("doc_id", "text"),
):
    """JSONL ingestion front door: returns ``(good, quarantined)``.

    At corpus scale raw feeds ALWAYS contain garbage — truncated
    lines, wrong types, missing fields. The contract a production
    ingest needs is: never fail the job on a bad record, never
    silently drop one. Lines are read as TEXT and parsed with
    ``from_json``, so every quarantine row carries the ORIGINAL line
    verbatim — including fields outside ``schema`` — and is replayable
    after a parser/contract fix. (Re-serializing a schema projection
    would silently lose extra fields; the corrupt-record reader path
    would need a session-lifetime persist to dodge SPARK-21610.)

    Quarantine reasons: ``unparseable`` (from_json yields NULL — bad
    syntax / non-object) or ``missing:<field>`` per violated
    ``required`` field. ``good`` and ``quarantined`` share one text
    scan per action; persist the inputs upstream if both sides are
    consumed repeatedly.
    """
    lines = (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)  # blank lines aren't data
        .select(F.col("value").alias("raw"))
    )
    # from_json PERMISSIVE yields an all-null struct for bad syntax, so
    # a parse-failure sentinel column is the only reliable signal
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt", T.StringType())]
    )
    parsed = lines.select(
        "raw",
        F.from_json(
            "raw", parse_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("j"),
    )
    bad_parse = F.col("j").isNull() | F.col("j._corrupt").isNotNull()
    unparseable = parsed.filter(bad_parse).select(
        "raw", F.lit("unparseable").alias("reason")
    )
    rows = parsed.filter(~bad_parse)
    good_all = rows.select("raw", *[F.col(f"j.{f.name}").alias(f.name) for f in schema.fields])
    contract_ok = None
    for field in required:
        cond = F.col(field).isNotNull()
        contract_ok = cond if contract_ok is None else (contract_ok & cond)
    if contract_ok is None:
        return good_all.drop("raw"), unparseable
    reason = F.concat_ws(
        ",",
        *[
            F.when(F.col(f).isNull(), F.lit(f"missing:{f}"))
            for f in required
        ],
    )
    violations = good_all.filter(~contract_ok).select(
        "raw", reason.alias("reason")
    )
    good = good_all.filter(contract_ok).drop("raw")
    return good, unparseable.unionByName(violations)
