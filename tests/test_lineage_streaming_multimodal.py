"""End-to-end tests for checkpointed lineage resume, the streaming
pipeline, and the multimodal mapInPandas plumbing."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from fluent_plugin_record_reformer_spark import (  # noqa: E402
    ReformContext,
    TransformSpec,
)
from fluent_plugin_record_reformer_spark.operators.multimodal import (  # noqa: E402
    decode_image_features,
    media_metadata_stats,
    sample_video_frames,
)
from fluent_plugin_record_reformer_spark.operators.route import (  # noqa: E402
    Route,
    RouteTable,
)
from fluent_plugin_record_reformer_spark.plans.lineage import (  # noqa: E402
    checkpointed_fanout,
    load_manifest,
    read_all_batches,
)
from fluent_plugin_record_reformer_spark.sources.tables import load_table  # noqa: E402
from fluent_plugin_record_reformer_spark.sources.transcripts import (  # noqa: E402
    transcripts_from_events,
    with_tag,
)
from fluent_plugin_record_reformer_spark.streaming.pipeline import (  # noqa: E402
    read_transcript_stream,
    reform_fanout_stream,
    windowed_counts_stream,
)

SF = "/root/testdata/sf0.001"

ROUTES = RouteTable(
    [
        Route("users", "transcripts.user.**"),
        Route("rest", "**"),
    ]
)


@pytest.fixture(scope="module")
def transcripts(spark):
    return with_tag(transcripts_from_events(load_table(spark, SF, "events")))


@pytest.fixture(scope="module")
def split_inputs(spark, transcripts, tmp_path_factory):
    """The transcript table as two separate parquet inputs."""
    base = tmp_path_factory.mktemp("inputs")
    p1, p2 = str(base / "part1"), str(base / "part2")
    transcripts.filter("turn_idx % 2 = 0").write.parquet(p1)
    transcripts.filter("turn_idx % 2 = 1").write.parquet(p2)
    return [p1, p2]


def test_checkpointed_fanout_resumes_idempotently(spark, transcripts, split_inputs, tmp_path):
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest")
    ident = lambda df: df  # noqa: E731

    r1 = checkpointed_fanout(spark, split_inputs[:1], ident, ROUTES, out, man)
    assert r1["processed"] == 1 and r1["skipped"] == 0
    assert r1["n_rows"] > 0

    # second run over BOTH inputs: only the new one is processed
    r2 = checkpointed_fanout(spark, split_inputs, ident, ROUTES, out, man)
    assert r2["processed"] == 1 and r2["skipped"] == 1

    # third run: full no-op
    r3 = checkpointed_fanout(spark, split_inputs, ident, ROUTES, out, man)
    assert r3["processed"] == 0 and r3["skipped"] == 2

    # data equals the direct batch pipeline exactly (no dup, no loss)
    got = read_all_batches(spark, out)
    assert got.count() == transcripts.count()
    per_route = {r["route"]: r["n"] for r in got.groupBy("route").agg(F.count(F.lit(1)).alias("n")).collect()}
    want_users = transcripts.filter(F.col("tag").rlike("^transcripts\\.user\\.")).count()
    assert per_route["users"] == want_users
    assert per_route["users"] + per_route["rest"] == transcripts.count()

    # manifest carries per-input lineage metrics that add up
    entries = load_manifest(man)
    assert set(entries) == set(split_inputs)
    assert sum(e.n_rows for e in entries.values()) == transcripts.count()
    assert all(sum(e.per_route.values()) == e.n_rows for e in entries.values())


def test_streaming_fanout_matches_batch(spark, transcripts, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    transcripts.drop("tag").write.parquet(src)

    spec = TransformSpec(
        tag="reformed.${tag_prefix[-2]}",
        record={"message": "${record['text']}!"},
        remove_keys=["text"],
    )
    ctx = ReformContext(hostname="stream-host")
    stream = with_tag(read_transcript_stream(spark, src))
    q = reform_fanout_stream(
        stream,
        spec,
        ctx,
        RouteTable([Route("sys", "reformed.transcripts.system"), Route("rest", "**")]),
        out,
        ckpt,
        available_now=True,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == transcripts.count()
    n_sys = transcripts.filter("role = 'system'").count()
    assert got.filter("route = 'sys'").count() == n_sys
    assert "message" in got.columns and "text" not in got.columns

    # exactly-once on restart: re-running the drained stream adds nothing
    q2 = reform_fanout_stream(
        stream,
        spec,
        ctx,
        RouteTable([Route("sys", "reformed.transcripts.system"), Route("rest", "**")]),
        out,
        ckpt,
        available_now=True,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == transcripts.count()


def test_streaming_windowed_counts(spark, transcripts, tmp_path):
    src = str(tmp_path / "src")
    transcripts.drop("tag").write.parquet(src)
    stream = read_transcript_stream(spark, src)
    agg = windowed_counts_stream(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM win_counts")
    want = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("win"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )
    assert got.count() == want.count()
    assert got.agg(F.sum("n_turns")).first()[0] == transcripts.count()


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, "image" if i % 2 == 0 else "video", "fake", 64 + i, 48 + i, 3500 * (i % 3 + 1), bytes([i]) * 32)
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, codec string, width int, height int, duration_ms int, payload binary",
    )


def test_multimodal_decode_stub_raises_without_fake(spark, media):
    with pytest.raises(Exception) as ei:
        decode_image_features(media).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_multimodal_image_features_deterministic(spark, media):
    imgs = media.filter("kind = 'image'")
    out1 = decode_image_features(imgs, fake_decoder=True).orderBy("media_id").collect()
    out2 = decode_image_features(imgs, fake_decoder=True).orderBy("media_id").collect()
    assert out1 == out2
    assert len(out1) == imgs.count()
    assert all(0.0 <= r["mean_r"] <= 1.0 and len(r["phash"]) == 16 for r in out1)


def test_multimodal_frame_sampling_expands(spark, media):
    vids = media.filter("kind = 'video'")
    frames = sample_video_frames(vids, every_ms=1000, fake_decoder=True)
    per_vid = {r["media_id"]: r["n"] for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    want = {r["media_id"]: max(r["duration_ms"] // 1000, 1) for r in vids.collect()}
    assert per_vid == want


def test_multimodal_metadata_scan_prunes_payload(spark, media, tmp_path):
    path = str(tmp_path / "media")
    media.write.parquet(path)
    stats = media_metadata_stats(spark.read.parquet(path))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan  # blob column pruned from the scan
    assert stats.count() == 2


def test_streaming_crash_midbatch_exactly_once(spark, transcripts, tmp_path):
    """Kill the fan-out query MID-micro-batch (slow batches injected via
    mapInPandas + stop() right after the first commit), restart from the
    checkpoint, and assert the final output equals the input exactly —
    no duplicates, no loss. The parquet sink's _spark_metadata commit
    log must hide any uncommitted in-flight files from readers."""
    import os
    import time

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    # 6 single-file slices => 6 micro-batches at maxFilesPerTrigger=1
    # (written by Spark so parquet physical types match the stream schema)
    import glob as globmod
    import shutil

    for i in range(6):
        staging = str(tmp_path / f"stage{i}")
        transcripts.drop("tag").filter(F.col("turn_idx") % 6 == i).coalesce(
            1
        ).write.parquet(staging)
        part = globmod.glob(f"{staging}/part-*.parquet")[0]
        shutil.move(part, f"{src}/slice{i}.parquet")

    spec = TransformSpec(
        tag="reformed.${tag_prefix[-2]}",
        record={"message": "${record['text']}!"},
        remove_keys=["text"],
    )
    ctx = ReformContext(hostname="crash-host")
    routes = RouteTable([Route("sys", "reformed.transcripts.system"), Route("rest", "**")])

    raw = read_transcript_stream(spark, src, max_files_per_trigger=1)

    def sleepy(batches):
        for b in batches:
            time.sleep(1.5)
            yield b

    slow = with_tag(raw.mapInPandas(sleepy, schema=raw.schema))
    q = reform_fanout_stream(slow, spec, ctx, routes, out, ckpt)
    commits = os.path.join(ckpt, "commits")
    deadline = time.time() + 120
    while time.time() < deadline:
        done = [
            f for f in (os.listdir(commits) if os.path.isdir(commits) else [])
            if not f.endswith(".tmp")
        ]
        if len(done) >= 1:
            break
        time.sleep(0.1)
    else:
        raise AssertionError("no micro-batch committed within deadline")
    q.stop()  # batch 2+ is mid-sleep: an in-flight, uncommitted batch

    # restart from the checkpoint (no injected slowness) and drain
    q2 = reform_fanout_stream(
        with_tag(raw), spec, ctx, routes, out, ckpt, available_now=True
    )
    q2.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == transcripts.count()  # no loss, no duplicates
    keys = got.select("conv_id", "turn_idx")
    assert keys.distinct().count() == keys.count()
    n_sys = transcripts.filter("role = 'system'").count()
    assert got.filter("route = 'sys'").count() == n_sys


def test_streaming_windowed_counts_crash_recovery(spark, transcripts, tmp_path):
    """Stateful counterpart of the fan-out crash test: kill a windowed
    aggregation mid-micro-batch and restart — the state store must
    recover window counts that SPAN the crash (rows for one window
    arriving both before and after), and append mode must emit each
    finalized window exactly once."""
    import os
    import time

    import glob as globmod
    import shutil

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    # slices are TIME-ORDERED ranges (arrival order ~ event order, the
    # realistic log-stream shape): the watermark advances progressively
    # and boundary windows receive rows from adjacent slices, so window
    # state accumulates across batches and across the crash. (Slicing
    # by turn parity instead would let batch 1 advance the watermark to
    # the global max and correctly drop everything else as late.)
    from pyspark.sql import Window as W

    sliced = transcripts.drop("tag").withColumn(
        "_slice", F.ntile(6).over(W.orderBy("ts")) - 1
    )
    for i in range(6):
        staging = str(tmp_path / f"stage{i}")
        sliced.filter(F.col("_slice") == i).drop("_slice").coalesce(
            1
        ).write.parquet(staging)
        shutil.move(globmod.glob(f"{staging}/part-*.parquet")[0], f"{src}/s{i}.parquet")

    raw = read_transcript_stream(spark, src, max_files_per_trigger=1)

    def sleepy(batches):
        for b in batches:
            time.sleep(1.5)
            yield b

    agg = windowed_counts_stream(
        raw.mapInPandas(sleepy, schema=raw.schema), window="6 hours", watermark="1 hour"
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    commits = os.path.join(ckpt, "commits")
    deadline = time.time() + 120
    while time.time() < deadline:
        done = [
            f for f in (os.listdir(commits) if os.path.isdir(commits) else [])
            if not f.endswith(".tmp")
        ]
        if len(done) >= 1:
            break
        time.sleep(0.1)
    else:
        raise AssertionError("no micro-batch committed within deadline")
    q.stop()  # mid-batch: some windows have partial, uncommitted state

    q2 = (
        windowed_counts_stream(raw, window="6 hours", watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)

    got = spark.read.parquet(out)
    # exactly-once per finalized window
    keys = got.select("window_start", "role")
    assert keys.distinct().count() == keys.count(), "window emitted twice"
    # append mode emits every window whose end the final watermark
    # passed; counts must equal the batch ground truth exactly (state
    # spanning the crash recovered, nothing lost or double-counted)
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "6 hours").alias("win"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("win.start").alias("window_start"), "role",
            F.col("n_turns").alias("want_n"),
        )
    )
    joined = got.join(batch, ["window_start", "role"], "left")
    assert joined.filter(F.col("n_turns") != F.col("want_n")).count() == 0
    # and the emitted set is exactly the finalized prefix of windows
    max_ts = spark.read.parquet(src).agg(F.max("ts")).first()[0]
    import datetime as dt

    final_wm = max_ts - dt.timedelta(hours=1)
    want_final = batch.filter(
        (F.col("window_start") + F.expr("INTERVAL 6 HOURS")) <= F.lit(final_wm)
    )
    assert got.count() == want_final.count()


def test_streaming_template_counts_match_batch(spark, transcripts, tmp_path):
    from fluent_plugin_record_reformer_spark.operators.templates import (
        template_col,
    )
    from fluent_plugin_record_reformer_spark.streaming.pipeline import (
        template_counts_stream,
    )

    src = str(tmp_path / "tsrc")
    transcripts.drop("tag").write.parquet(src)
    stream = read_transcript_stream(spark, src)
    agg = template_counts_stream(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("tpl_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["template"]): r["n_lines"]
        for r in spark.sql("SELECT * FROM tpl_counts").collect()
    }
    want = {
        (r["ws"], r["template"]): r["n_lines"]
        for r in (
            spark.read.parquet(src)
            .select(
                F.window("ts", "1 hour").alias("win"),
                template_col("text").alias("template"),
            )
            .groupBy(F.col("win.start").alias("ws"), "template")
            .agg(F.count(F.lit(1)).alias("n_lines"))
            .collect()
        )
    }
    assert got == want
    assert sum(got.values()) == transcripts.count()


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Drained stream-stream tolerance join == the equivalent batch
    join: matches inside [req_ts, req_ts + 60s] survive, both-side
    watermarks bound state, late/out-of-window rows never pair."""
    import datetime as dt

    from fluent_plugin_record_reformer_spark.streaming.pipeline import (
        stream_interval_join,
    )

    base = dt.datetime(2024, 1, 1)
    reqs = [
        ("c1", base, "req-a"),
        ("c1", base + dt.timedelta(seconds=300), "req-b"),
        ("c2", base, "req-c"),
        ("c3", base, "req-d"),  # no response at all
    ]
    resps = [
        ("c1", base + dt.timedelta(seconds=30), "ok-a"),      # inside
        ("c1", base + dt.timedelta(seconds=320), "ok-b"),     # inside (req-b)
        ("c1", base + dt.timedelta(seconds=200), "late-a"),   # outside both
        ("c2", base - dt.timedelta(seconds=5), "early-c"),    # before req
    ]
    lsrc, rsrc = str(tmp_path / "reqs"), str(tmp_path / "resps")
    spark.createDataFrame(
        reqs, "conv_id string, req_ts timestamp, req string"
    ).write.parquet(lsrc)
    spark.createDataFrame(
        resps, "conv_id string, res_ts timestamp, res string"
    ).write.parquet(rsrc)

    lstream = spark.readStream.schema(
        "conv_id string, req_ts timestamp, req string"
    ).parquet(lsrc)
    rstream = spark.readStream.schema(
        "conv_id string, res_ts timestamp, res string"
    ).parquet(rsrc)
    joined = stream_interval_join(
        lstream,
        rstream,
        key="conv_id",
        left_ts="req_ts",
        right_ts="res_ts",
        tolerance_seconds=60,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream join did not drain"
    got = sorted(
        (r["conv_id"], r["req"], r["res"])
        for r in spark.sql("SELECT * FROM sj_out").collect()
    )
    lb = spark.read.parquet(lsrc)
    rb = spark.read.parquet(rsrc)
    want = sorted(
        (r["conv_id"], r["req"], r["res"])
        for r in lb.join(
            rb,
            (lb["conv_id"] == rb["conv_id"])
            & (rb["res_ts"] >= lb["req_ts"])
            & (rb["res_ts"] <= lb["req_ts"] + F.expr("INTERVAL 60 SECONDS")),
            "inner",
        ).collect()
    )
    assert got == want
    assert got == [("c1", "req-a", "ok-a"), ("c1", "req-b", "ok-b")]


def test_stream_interval_join_rejects_same_ts_name(spark, tmp_path):
    from fluent_plugin_record_reformer_spark.streaming.pipeline import (
        stream_interval_join,
    )

    src = str(tmp_path / "one")
    spark.createDataFrame(
        [("k1", None)], "k string, ts timestamp"
    ).write.parquet(src)
    s = spark.readStream.schema("k string, ts timestamp").parquet(src)
    with pytest.raises(ValueError, match="distinct column names"):
        stream_interval_join(
            s, s, key="k", left_ts="ts", right_ts="ts", tolerance_seconds=5
        )


def test_stream_interval_join_rejects_shared_columns(spark, tmp_path):
    from fluent_plugin_record_reformer_spark.streaming.pipeline import (
        stream_interval_join,
    )

    src = str(tmp_path / "shared")
    spark.createDataFrame(
        [("k1", None, "x")], "k string, a_ts timestamp, payload string"
    ).write.parquet(src)
    s = spark.readStream.schema(
        "k string, a_ts timestamp, payload string"
    ).parquet(src)
    s2 = (
        spark.readStream.schema("k string, a_ts timestamp, payload string")
        .parquet(src)
        .withColumnRenamed("a_ts", "b_ts")
    )
    with pytest.raises(ValueError, match="payload"):
        stream_interval_join(
            s, s2, key="k", left_ts="a_ts", right_ts="b_ts",
            tolerance_seconds=5,
        )
