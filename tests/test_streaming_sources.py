"""Kafka-shaped streaming source: file-source stand-in driven end-to-
end (decode -> reform -> route -> exactly-once sink), real-Kafka call
shape verified via an intercepted reader (no broker in sandbox)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fluent_plugin_record_reformer_spark import ReformContext, TransformSpec, reform  # noqa: E402
from fluent_plugin_record_reformer_spark.operators.route import Route, RouteTable  # noqa: E402
from fluent_plugin_record_reformer_spark.streaming.sources import (  # noqa: E402
    KAFKA_SOURCE_SCHEMA,
    decode_json_events,
    kafka_shaped_file_stream,
    kafka_stream,
)

EV_SCHEMA = "conv_id string, turn_idx int, role string, text string"


def _write_kafka_shaped(spark, path: str) -> None:
    rows = []
    for i in range(20):
        ev = {
            "conv_id": f"c{i % 3}",
            "turn_idx": i,
            "role": "user" if i % 2 else "assistant",
            "text": f"msg {i}",
        }
        rows.append(
            (
                str(i % 3).encode(),
                json.dumps(ev).encode(),
                "transcripts",
                i % 2,
                i,
            )
        )
    # one corrupt payload: fields null, event not dropped
    rows.append((b"k", b"{not json", "transcripts", 0, 99))
    df = spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long"
    ).select(
        "*",
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    df.write.mode("overwrite").parquet(path)


def test_kafka_shaped_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "kafka")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_kafka_shaped(spark, src)

    stream = kafka_shaped_file_stream(spark, src)
    assert stream.isStreaming
    decoded = decode_json_events(stream, EV_SCHEMA).withColumn(
        "tag", F.concat_ws(".", F.lit("transcripts"), F.coalesce("role", F.lit("unknown")))
    ).withColumn("ts", F.col("timestamp"))
    spec = TransformSpec(tag="reformed.${tag_parts[-1]}", record={"src_offset": "${record['offset']}"})
    reformed = reform(decoded, spec, ReformContext(hostname="h"))
    routes = RouteTable([Route("users", "reformed.user"), Route("rest", "**")])
    routed = routes.assign(reformed)
    q = (
        routed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .partitionBy("route")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    got = {r["route"]: r["n"] for r in back.groupBy("route").agg(F.count("*").alias("n")).collect()}
    assert got == {"users": 10, "rest": 11}  # corrupt payload contained, not dropped
    corrupt = back.filter(F.col("offset") == 99).collect()
    assert len(corrupt) == 1 and corrupt[0]["conv_id"] is None


def test_kafka_stream_reader_call_shape():
    class FakeReader:
        def __init__(self):
            self.calls = {}

        def format(self, f):
            self.calls["format"] = f
            return self

        def option(self, k, v):
            self.calls[k] = v
            return self

        def load(self):
            self.calls["loaded"] = True
            return "DF"

    class FakeSpark:
        readStream = FakeReader()

    fs = FakeSpark()
    got = kafka_stream(
        fs,
        bootstrap_servers="broker:9092",
        topics="transcripts",
        max_offsets_per_trigger=1000,
    )
    c = fs.readStream.calls
    assert got == "DF" and c["format"] == "kafka"
    assert c["kafka.bootstrap.servers"] == "broker:9092"
    assert c["subscribe"] == "transcripts"
    assert c["startingOffsets"] == "earliest"
    assert c["maxOffsetsPerTrigger"] == 1000
    assert c["loaded"]


def test_dedup_stream_first_occurrence_wins(spark, tmp_path):
    from fluent_plugin_record_reformer_spark.streaming.pipeline import dedup_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    rows = [
        (i, ["dup text A", "dup text B", f"unique {i}"][i % 3], f"2024-01-01 00:0{i % 6}:00")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts_s string").select(
        "doc_id", "text", F.col("ts_s").cast("timestamp").alias("ts")
    )
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(src)
    q = (
        dedup_stream(stream, key_cols=("text",), watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    texts = [r["text"] for r in back.collect()]
    assert len(texts) == len(set(texts))  # no duplicate keys emitted
    assert set(t for t in texts if t.startswith("dup")) == {"dup text A", "dup text B"}
    assert sum(1 for t in texts if t.startswith("unique")) == 10
