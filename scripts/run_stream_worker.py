"""spark-submit worker for the hard-kill streaming exactly-once test.

Runs the stateful sessionizer over a transcript file-source stream
with an IDEMPOTENT foreachBatch sink (one deterministic parquet dir
per micro-batch id, overwrite mode — a replayed batch rewrites the
same dir with the same deterministic content instead of appending
duplicates). Two modes:

- ``run``: continuous trigger with an optional per-batch sleep so the
  parent test can SIGKILL this JVM while a micro-batch is IN FLIGHT
  (offsets WAL written, commit marker not) — the crash the graceful
  ``query.stop()`` tests can never produce.
- ``drain``: restart from the same checkpoint with availableNow and
  process whatever the killed run left behind.

Exactly-once is then asserted by the parent: the final per-conv
session stats must equal the batch ground truth — any input file
double-applied to state after the replay would inflate n_turns.
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--mode", choices=["run", "drain"], required=True)
    ap.add_argument("--sleep", type=float, default=0.0)
    a = ap.parse_args()

    from pyspark.sql import SparkSession

    from fluent_plugin_record_reformer_spark.streaming.pipeline import (
        read_transcript_stream,
    )
    from fluent_plugin_record_reformer_spark.streaming.stateful import (
        conversation_sessions,
    )

    spark = SparkSession.builder.getOrCreate()  # confs come from spark-submit
    spark.sparkContext.setLogLevel("ERROR")
    raw = read_transcript_stream(spark, a.src, max_files_per_trigger=1)
    if a.sleep > 0:

        def sleepy(batches):
            for b in batches:
                time.sleep(a.sleep)
                yield b

        raw = raw.mapInPandas(sleepy, schema=raw.schema)
    sessions = conversation_sessions(raw, gap_ms=None)

    def sink(batch_df, bid: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{a.out}/bid={bid}")

    writer = (
        sessions.writeStream.foreachBatch(sink)
        .option("checkpointLocation", a.ckpt)
        .outputMode("update")
    )
    if a.mode == "drain":
        q = writer.trigger(availableNow=True).start()
        assert q.awaitTermination(300), "drain did not finish"
    else:
        q = writer.trigger(processingTime="0 seconds").start()
        q.awaitTermination(600)  # the parent SIGKILLs us first
    spark.stop()


if __name__ == "__main__":
    main()
