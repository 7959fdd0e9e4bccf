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
