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


# Scans below this size skip the fan-out repartition in load_table:
# tiny dimension tables (region/nation/supplier) are broadcast-join
# fodder where an extra exchange is pure overhead. Anything bigger is
# worth one narrow shuffle when its split count is under the core
# count (see ensure_compute_parallelism).
FANOUT_MIN_BYTES = int(os.environ.get("SPARK_GRAFT_FANOUT_MIN_BYTES", str(256 << 10)))


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, fanout: bool = True
) -> DataFrame:
    """Load one testdata table. Column pruning/predicate pushdown is
    Catalyst's job — callers express filters declaratively and the
    parquet scan shows PushedFilters/ReadSchema in explain(); both
    survive the conditional fan-out repartition (Catalyst pushes
    Filter/Project through Repartition).

    The fan-out (guide §2.2/§6): a parquet file is only splittable at
    row-group granularity, and the testdata generator writes ONE row
    group per table — so without intervention every scan arrives as a
    single partition and ALL pre-exchange compute (regex parse,
    shingle explodes, partial aggregation) runs on one core while 31
    idle. One round-robin repartition of the (column-pruned) raw rows
    moves that work onto every core for the price of shuffling a few
    MB. Scale-adaptive, not local-tuned: the guard fires only when the
    estimated split count is below the core count, so at cluster scale
    (thousands of 128 MB-a-piece splits) it is a no-op by
    construction.

    ``fanout=False`` opts a call site out. The measured rule (A/B'd
    per query, OPTIMIZATION_r06.md): keep the fan-out wherever heavy
    per-row work (regex parse, shingle/gram building, vector math)
    sits BEFORE the query's first natural exchange; skip it where the
    first operation is itself an aggregation/join/window whose
    map-side partial agg or key exchange already collapses or
    redistributes the rows — there the extra shuffle is pure tax."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if not fanout:
        return df
    return ensure_compute_parallelism(df, min_bytes=FANOUT_MIN_BYTES)


def ensure_compute_parallelism(
    df: DataFrame, min_partitions: int | None = None, *, min_bytes: int = 0
) -> DataFrame:
    """Round-robin repartition iff the plan has fewer partitions than the
    cluster has cores.

    CPU-heavy per-row stages (MinHash signatures, SimHash folds — any
    higher-order-function expression, which Catalyst evaluates
    interpreted, outside whole-stage codegen) are bottlenecked by input
    split count, not data volume: a small parquet file arrives as ONE
    partition and one task hashes every row (measured 110s -> 4s at
    sf0.1). At 100 TB inputs naturally split; this guard only fires on
    small/skewed-split inputs, costing one narrow shuffle of the raw
    rows.

    ``min_bytes`` (when the input size is locally stattable) skips the
    repartition for inputs smaller than the threshold — tiny dimension
    tables gain nothing from 32 partitions and would pay a pointless
    exchange in front of their broadcast."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    stats = _estimated_scan_stats(df)
    if stats is None:
        # derived frame / remote files: fall back to real partition
        # count (forces plan->RDD conversion — acceptable off the
        # repeatedly-called scan path)
        est = df.rdd.getNumPartitions()
    else:
        est, total_bytes = stats
        if total_bytes < min_bytes:
            return df
    if est < target:
        return df.repartition(target)
    return df


_BYTE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "p": 1 << 50, "pb": 1 << 50,
}


def _parse_byte_string(raw: str, default: int = 134217728) -> int:
    """Spark byte-string format (JavaUtils.byteStringAsBytes): integer +
    optional b/k/kb/m/mb/g/gb/t/tb/p/pb suffix, case-insensitive.
    Scraping digits alone would read ``128m`` as 128 *bytes* and inflate
    the split estimate ~10^6x, silently disabling the small-input
    repartition this estimate feeds."""
    import re

    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]*)\s*", raw)
    if not m:
        return default
    mult = _BYTE_SUFFIX.get(m.group(2).lower())
    if mult is None:
        return default
    return int(m.group(1)) * mult


def _estimated_scan_stats(df: DataFrame) -> tuple[int, int] | None:
    """(split-count estimate, total bytes) from the scan's input files
    — pure driver metadata, no plan->RDD conversion. None when the
    frame has no file inputs or sizes aren't locally stattable."""
    import math

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    raw = df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    max_bytes = _parse_byte_string(str(raw))
    est = 0
    total = 0
    for f in files:
        path = f[len("file:"):] if f.startswith("file:") else f
        if "://" in path:
            return None  # remote FS: don't guess
        try:
            size = os.path.getsize(path)
        except OSError:
            return None
        est += max(1, math.ceil(size / max_bytes))
        total += size
    return est, total


def _estimated_scan_splits(df: DataFrame) -> int | None:
    """Back-compat shim over :func:`_estimated_scan_stats`."""
    stats = _estimated_scan_stats(df)
    return None if stats is None else stats[0]


def write_bucketed(
    df: DataFrame,
    *,
    table: str,
    path: str,
    bucket_col: str,
    buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Bucketed + sorted parquet write: pays ONE hash shuffle at write
    time so every future join / aggregation on ``bucket_col`` reads
    already-hash-partitioned (and per-bucket sorted) data and skips
    its Exchange entirely.

    This is the batch-table answer to "co-locate the join" at 100 TB:
    two tables bucketed by the same key into the same bucket count
    sort-merge-join with ZERO shuffle on either side (pinned by
    tests/test_bucketed.py against the physical plan) — the dominant
    cost of a fact-fact join simply disappears for every subsequent
    run. Bucket files also bound task input size deterministically
    (|table| / buckets), independent of data skew in row order.

    Spark only exposes bucket metadata through the catalog, so this
    writes an EXTERNAL table (data at ``path``, definition under
    ``table``) via ``saveAsTable`` and returns the catalog-backed
    frame; a plain ``.parquet(path)`` read of the same files would
    NOT know about the bucketing and would shuffle again.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1: {buckets}")
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(buckets, bucket_col)
        .sortBy(*(sort_cols or [bucket_col]))
    )
    writer.saveAsTable(table)
    return df.sparkSession.table(table)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    *,
    target_file_bytes: int = 128 << 20,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Small-file compaction: rewrite a parquet directory into files
    sized near ``target_file_bytes``, optionally range-clustered by
    ``sort_cols``.

    Why it's a first-class operator: streaming sinks and per-route
    fan-outs accrete thousands of KB-sized files per partition; at
    100 TB a scan then pays one task + one footer-read per tiny file
    and the NameNode/manifest pays the metadata. Compaction sizes the
    output from the ACTUAL input bytes (not a guessed partition
    count), so the result holds as data grows. With ``sort_cols`` the
    rewrite doubles as a clustering pass (repartitionByRange + sorted
    files → tight min/max stats, same machinery as zorder_layout's
    write).

    Writes to a NEW directory (``dst_dir``) — swapping it in is the
    caller's atomic-publish step (at scale: a catalog/manifest commit,
    e.g. Iceberg rewrite_data_files; locally: a rename). Local
    filesystem paths only for the size probe (the sandbox case);
    remote stores should take file sizes from their listing API.
    """
    import glob as globmod
    import math

    # recursive: partitioned / per-route fan-out layouts (the
    # docstring's own motivating case) nest part files under
    # key=value or batch subdirectories — a top-level-only glob would
    # refuse directories spark.read.parquet(src_dir) reads fine
    # (ADVICE r5).
    files = globmod.glob(os.path.join(src_dir, "**", "*.parquet"), recursive=True)
    if not files:
        raise ValueError(f"compact_parquet: no parquet files in {src_dir}")
    total = sum(os.path.getsize(f) for f in files)
    n = max(1, math.ceil(total / int(target_file_bytes)))
    df = spark.read.parquet(src_dir)
    if sort_cols:
        arranged = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        arranged = df.repartition(n)
    arranged.write.mode("errorifexists").parquet(dst_dir)
    return spark.read.parquet(dst_dir)
