"""Parquet/Iceberg table loading.

At 100 TB the scan is the single most important operator: we always go
through ``spark.read.parquet`` (or ``format("iceberg")`` when a
catalog is configured) so Catalyst gets pushdown + pruning, and we
never infer schemas row-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Column pruning/predicate pushdown is
    Catalyst's job — callers express filters declaratively and the
    parquet scan shows PushedFilters/ReadSchema in explain()."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def ensure_compute_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan has fewer partitions than the
    cluster has cores.

    CPU-heavy per-row stages (MinHash signatures, SimHash folds — any
    higher-order-function expression, which Catalyst evaluates
    interpreted, outside whole-stage codegen) are bottlenecked by input
    split count, not data volume: a small parquet file arrives as ONE
    partition and one task hashes every row (measured 110s -> 4s at
    sf0.1). At 100 TB inputs naturally split; this guard only fires on
    small/skewed-split inputs, costing one narrow shuffle of the raw
    rows."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    est = _estimated_scan_splits(df)
    if est is None:
        # derived frame / remote files: fall back to real partition
        # count (forces plan->RDD conversion — acceptable off the
        # repeatedly-called scan path)
        est = df.rdd.getNumPartitions()
    if est < target:
        return df.repartition(target)
    return df


def _estimated_scan_splits(df: DataFrame) -> int | None:
    """Split-count estimate from the scan's input files — pure driver
    metadata, no plan->RDD conversion. None when the frame has no
    file inputs or sizes aren't locally stattable."""
    import math

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    raw = df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    digits = "".join(ch for ch in str(raw) if ch.isdigit())
    max_bytes = int(digits) if digits else 134217728
    est = 0
    for f in files:
        path = f[len("file:"):] if f.startswith("file:") else f
        if "://" in path:
            return None  # remote FS: don't guess
        try:
            est += max(1, math.ceil(os.path.getsize(path) / max_bytes))
        except OSError:
            return None
    return est
