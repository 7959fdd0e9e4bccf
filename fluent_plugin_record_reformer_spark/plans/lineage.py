"""Checkpointed, idempotently-resumable fan-out runs with
per-input lineage + metrics.

North-rule requirement: "the job checkpoints per-partition lineage +
metrics so reruns resume idempotently". The resume unit here is the
INPUT FILE (the natural split of a parquet/Iceberg table):

- A *manifest directory* holds one JSON file per fully-committed input
  (name = md5 of the input path) recording rows read, rows routed per
  sink, and the output batch it landed in. Manifest files are written
  atomically (tmp + rename) AFTER the batch's data is committed, so a
  crash between data-write and manifest-write re-processes that batch
  — and because each batch stages into its own directory that is
  renamed into place, the retry first discards the orphaned staging
  dir: no duplicates, no loss.
- ``checkpointed_fanout`` processes only inputs with no manifest entry.
  Running it twice is a no-op the second time.

Scale notes: on a real cluster this maps onto Iceberg transactional
appends (commit = snapshot, manifest = snapshot summary properties);
the local implementation uses the same commit ordering with directory
renames. Per-sink row metrics ride the SAME pass as the write via
``DataFrame.observe`` (AggregateMetrics, no extra scan); the per-input
row counts are a separate cheap aggregation-only scan (columns pruned
to the lineage key) — at 100 TB you would instead keep the lineage
column in the sink or read it from Iceberg's per-file metadata.

Reference anchor: the reference has no persistence at all (fluentd
owns buffering/retry; whole-chunk rescue at core.rb:113-116 simply
drops a failed chunk after logging). Checkpointed resume is part of
the engine's scale contract, not a ported feature.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict, dataclass, field
from typing import Callable, Sequence

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..operators.route import UNMATCHED, RouteTable

LINEAGE_COL = "__lineage_input"


@dataclass
class ManifestEntry:
    input_path: str
    batch_id: str
    n_rows: int
    per_route: dict[str, int] = field(default_factory=dict)
    wall_s: float = 0.0
    committed_at: float = 0.0


def _entry_name(input_path: str) -> str:
    return hashlib.md5(input_path.encode()).hexdigest() + ".json"


def load_manifest(manifest_dir: str) -> dict[str, ManifestEntry]:
    """All committed inputs (path -> entry)."""
    out: dict[str, ManifestEntry] = {}
    if not os.path.isdir(manifest_dir):
        return out
    for name in os.listdir(manifest_dir):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(manifest_dir, name)) as f:
            d = json.load(f)
        out[d["input_path"]] = ManifestEntry(**d)
    return out


def _write_manifest_atomic(manifest_dir: str, entry: ManifestEntry) -> None:
    os.makedirs(manifest_dir, exist_ok=True)
    final = os.path.join(manifest_dir, _entry_name(entry.input_path))
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(entry), f)
    os.replace(tmp, final)  # atomic on POSIX


def checkpointed_fanout(
    spark: SparkSession,
    inputs: Sequence[str],
    transform: Callable[[DataFrame], DataFrame],
    routes: RouteTable,
    out_dir: str,
    manifest_dir: str,
    *,
    tag_col: str = "tag",
    drop_unmatched: bool = True,
) -> dict:
    """Run transform+route+write over exactly the not-yet-committed
    inputs; returns a summary {processed, skipped, per_route, batch_id}.

    Commit order per batch: stage data -> rename into place -> write
    manifest entries. Readers see ``{out_dir}/batch=*/route=*/...``.
    """
    done = load_manifest(manifest_dir)
    todo = [p for p in inputs if p not in done]
    skipped = len(inputs) - len(todo)
    if not todo:
        return {"processed": 0, "skipped": skipped, "per_route": {}, "batch_id": None}

    batch_id = hashlib.md5("|".join(sorted(todo)).encode()).hexdigest()[:16]
    staging = os.path.join(out_dir, f"_staging_{batch_id}")
    final_dir = os.path.join(out_dir, f"batch={batch_id}")
    # a crashed earlier attempt of this same batch leaves an orphaned
    # staging dir (no manifest entries) — discard and redo
    if os.path.isdir(staging):
        shutil.rmtree(staging)
    if os.path.isdir(final_dir):
        shutil.rmtree(final_dir)

    t0 = time.time()
    df = spark.read.parquet(*todo).withColumn(LINEAGE_COL, F.input_file_name())
    routed = routes.assign(transform(df), tag_col)
    if drop_unmatched:
        routed = routed.filter(F.col("route") != UNMATCHED)

    obs = Observation("lineage_metrics")
    observed = routed.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.when(F.col("route") == r.name, 1).otherwise(0)).alias(r.name)
            for r in routes.routes
        ],
    )
    (
        observed.drop(LINEAGE_COL)
        .write.mode("overwrite")
        .partitionBy("route")
        .parquet(staging)
    )
    totals = obs.get  # blocks until the write action finished

    # per-input lineage counts: aggregation-only scan, pruned to the key
    per_input = {
        row[0]: (row[1], dict(zip([r.name for r in routes.routes], row[2:])))
        for row in routed.groupBy(LINEAGE_COL)
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.when(F.col("route") == r.name, 1).otherwise(0)).alias(r.name)
                for r in routes.routes
            ],
        )
        .collect()
    }

    os.makedirs(out_dir, exist_ok=True)
    os.replace(staging, final_dir)  # data commit point
    wall = time.time() - t0
    route_names = [r.name for r in routes.routes]
    for p in todo:
        # input_file_name() yields per-FILE URIs (file:///...); an input
        # may be a directory of part files — aggregate every file under it
        ap = os.path.abspath(p)
        n, pr = 0, dict.fromkeys(route_names, 0)
        for k, (kn, kpr) in per_input.items():
            path_part = k.split("://", 1)[-1]
            if path_part == ap or path_part.startswith(ap + "/"):
                n += kn
                for name in route_names:
                    pr[name] += kpr.get(name, 0)
        _write_manifest_atomic(
            manifest_dir,
            ManifestEntry(
                input_path=p,
                batch_id=batch_id,
                n_rows=n,
                per_route={k: int(v) for k, v in pr.items()},
                wall_s=round(wall, 3),
                committed_at=time.time(),
            ),
        )
    per_route = {
        r.name: int(totals[r.name] or 0) for r in routes.routes
    }
    return {
        "processed": len(todo),
        "skipped": skipped,
        "n_rows": int(totals["n_rows"]),
        "per_route": per_route,
        "batch_id": batch_id,
    }


def read_all_batches(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read every committed batch back (staging dirs excluded by the
    ``batch=`` partition-dir naming)."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch=*")
    )
