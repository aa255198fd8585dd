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
