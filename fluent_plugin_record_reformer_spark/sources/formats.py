"""Alternative source formats for the transcript table: JSON-lines and
CSV, with the schema declared explicitly (schema inference is a full
extra pass over the data — never acceptable at scale) and lossless
timestamp round-tripping.

The reference consumes fluentd event streams whose payloads are
msgpack/JSON records (v12.rb:27, v14.rb:22); JSON-lines is the batch
equivalent of that wire format. Parquet (sources/tables.py) remains the
primary columnar format; these readers exist for ingest edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..streaming.pipeline import TRANSCRIPT_SCHEMA


# microsecond-precision timestamps survive the text round trip
TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def read_transcripts_json(
    spark: SparkSession, path: str, schema: str | StructType = TRANSCRIPT_SCHEMA
) -> DataFrame:
    """JSON-lines scan with explicit schema; malformed lines null out
    per-column (PERMISSIVE) rather than failing the job — the batch
    analog of the reference's warn-and-continue chunk handling
    (core.rb:113-116)."""
    return (
        spark.read.schema(schema)
        .option("timestampFormat", TS_FORMAT)
        .option("timestampNTZFormat", TS_FORMAT)
        .option("mode", "PERMISSIVE")
        .json(path)
    )


def write_transcripts_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    (
        df.write.mode(mode)
        .option("timestampFormat", TS_FORMAT)
        .option("timestampNTZFormat", TS_FORMAT)
        .json(path)
    )


def read_transcripts_csv(
    spark: SparkSession, path: str, schema: str | StructType = TRANSCRIPT_SCHEMA
) -> DataFrame:
    """CSV scan with explicit schema + header."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", TS_FORMAT)
        .option("timestampNTZFormat", TS_FORMAT)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_transcripts_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").option(
        "timestampFormat", TS_FORMAT
    ).option("timestampNTZFormat", TS_FORMAT).csv(path)
