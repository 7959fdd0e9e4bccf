"""Kafka-shaped streaming source.

The reference consumes fluentd event streams; the real-world analog at
scale is Kafka. This module provides ONE source surface with the exact
Kafka source schema (key/value/topic/partition/offset/timestamp), so
every downstream stage (decode -> reform -> route -> sink) is written
once and is broker-agnostic:

- ``kafka_stream`` — the real ``format("kafka")`` DataSourceV2 source,
  env-gated: needs a reachable broker + the spark-sql-kafka package,
  neither of which exists in this sandbox. The call SHAPE (options,
  offsets, schema) is exercised by unit tests via an intercepted
  reader.
- ``kafka_shaped_file_stream`` — a file-source stream presenting the
  SAME schema from parquet files (the deterministic local stand-in;
  this is what CI drives end-to-end).
- ``decode_json_events`` — the standard decode stage: ``value`` bytes
  as JSON -> typed columns via ``from_json`` (JVM-side, codegen;
  PERMISSIVE — a corrupt payload yields null fields, never an error,
  matching the engine's core.rb:315-319 containment semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# The exact schema the Kafka source produces (public Spark contract).
KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def kafka_stream(
    spark: SparkSession,
    *,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream.format("kafka")`` with the standard options. The
    checkpoint owns consumed offsets (exactly-once with an idempotent/
    transactional sink) — Kafka group commits are not the source of
    truth. Env-gated: requires a broker + spark-sql-kafka jars."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader.load()


def kafka_shaped_file_stream(
    spark: SparkSession,
    input_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream with the Kafka source schema — the sandbox
    stand-in; swap for :func:`kafka_stream` with zero downstream
    changes."""
    reader = spark.readStream.schema(KAFKA_SOURCE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def decode_json_events(
    kafka_df: DataFrame,
    value_schema: str | StructType,
    *,
    keep_meta: tuple[str, ...] = ("topic", "partition", "offset", "timestamp"),
) -> DataFrame:
    """value bytes -> JSON -> typed columns. PERMISSIVE: a corrupt
    payload nulls the parsed struct's fields; the event itself is never
    dropped or errored (parse-error containment, core.rb:315-319)."""
    parsed = kafka_df.select(
        *keep_meta,
        F.from_json(F.col("value").cast("string"), value_schema).alias("_ev"),
    )
    ev_fields = parsed.select("_ev.*").columns
    return parsed.select(*keep_meta, *[F.col(f"_ev.{c}").alias(c) for c in ev_fields])
