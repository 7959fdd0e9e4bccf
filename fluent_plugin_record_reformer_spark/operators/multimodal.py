"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing — schemas, batch shapes, partition sizing,
iterator-of-DataFrames UDF signatures — is real and tested; the actual
codec calls are STUBBED (this container ships no image/audio libs):
``decode_image`` raises ``NotImplementedError`` unless
``fake_decoder=True``, which substitutes a deterministic md5-derived
fake so pipelines and tests exercise the full data path.

Scale design notes:
- media bytes stay in ONE binary column; metadata (width/height/codec/
  duration) lives in plain columns so Catalyst can filter/prune WITHOUT
  touching payloads (parquet column pruning skips the blob pages
  entirely for metadata-only queries).
- mapInPandas streams Arrow batches through Python — bound memory by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (payloads are MBs,
  so batches of ~64 are saner than the 10k default; set via conf).
- repartition before decode: blob tables are few-files/large-rows, the
  same single-split trap as any CPU-heavy stage.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import ensure_compute_parallelism

MEDIA_SCHEMA = (
    "media_id long, kind string, codec string, width int, height int, "
    "duration_ms int, payload binary"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, mean_r double, mean_g double, "
    "mean_b double, phash string"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_ms int, frame_phash string"


def _fake_pixels(payload: bytes) -> tuple[float, float, float, str]:
    """Deterministic stand-in for a decoded image: channel means and a
    perceptual-hash-shaped digest derived from the payload bytes.
    Hashes the payload's lowercase-hex rendering (not raw bytes) so a
    SQL oracle can reproduce it: ``md5(lower(hex(payload)))``."""
    d = hashlib.md5((payload or b"").hex().encode()).digest()
    return (d[0] / 255.0, d[1] / 255.0, d[2] / 255.0, d.hex()[:16])


def decode_image_features(
    df: DataFrame, *, fake_decoder: bool = False, batch_size_hint: int = 64
) -> DataFrame:
    """payload -> per-image features via mapInPandas (iterator API: one
    Arrow batch in, one out; constant memory w.r.t. table size)."""

    def eval_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decoder:
                raise NotImplementedError(
                    "real image decoding requires an image codec library "
                    "(not available in this environment); pass "
                    "fake_decoder=True for the deterministic stand-in"
                )
            feats = pdf["payload"].map(_fake_pixels)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "mean_r": feats.map(lambda t: t[0]),
                    "mean_g": feats.map(lambda t: t[1]),
                    "mean_b": feats.map(lambda t: t[2]),
                    "phash": feats.map(lambda t: t[3]),
                }
            )

    pruned = ensure_compute_parallelism(
        df.select("media_id", "width", "height", "payload")
    )
    return pruned.mapInPandas(eval_batches, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(
    df: DataFrame, *, every_ms: int = 1000, fake_decoder: bool = False
) -> DataFrame:
    """video payload -> one row per sampled frame (1-in-N-out mapInPandas
    expansion; frame timestamps from metadata, decode stubbed)."""

    def eval_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decoder:
                raise NotImplementedError(
                    "real frame extraction requires a video codec library; "
                    "pass fake_decoder=True for the deterministic stand-in"
                )
            rows: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "frame_ms": [],
                "frame_phash": [],
            }
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                n = max(int(dur or 0) // every_ms, 1)
                for i in range(n):
                    d = hashlib.md5((payload or b"") + i.to_bytes(4, "big")).hexdigest()
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ms"].append(i * every_ms)
                    rows["frame_phash"].append(d[:16])
            yield pd.DataFrame(rows)

    pruned = ensure_compute_parallelism(
        df.select("media_id", "duration_ms", "payload")
    )
    return pruned.mapInPandas(eval_batches, FRAME_SAMPLE_SCHEMA)


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Metadata-only rollup — MUST NOT read payload bytes: the parquet
    scan's ReadSchema should exclude the binary column entirely."""
    return df.groupBy("kind", "codec").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.avg(F.col("width") * F.col("height")).alias("avg_pixels"),
        F.sum("duration_ms").alias("total_duration_ms"),
    )
