"""Bucketed-table writes: the one-shuffle-now, zero-shuffle-forever
contract, pinned against the physical plan and against result
equality with the plain join."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from fluent_plugin_record_reformer_spark.sources.tables import write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_skips_both_exchanges(spark, tmp_path, no_broadcast):
    facts = spark.range(10_000).select(
        (F.col("id") % 257).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(257).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("attr")
    )
    bf = write_bucketed(
        facts, table="t_bfacts", path=str(tmp_path / "bf"),
        bucket_col="k", buckets=8,
    )
    bd = write_bucketed(
        dim, table="t_bdim", path=str(tmp_path / "bd"),
        bucket_col="k", buckets=8,
    )
    try:
        j = bf.join(bd, "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and the results are exactly the plain join's
        want = sorted(
            (r["k"], r["v"], r["attr"]) for r in facts.join(dim, "k").collect()
        )
        got = sorted((r["k"], r["v"], r["attr"]) for r in j.collect())
        assert got == want
        # aggregation on the bucket key also skips its exchange
        agg_plan = (
            bf.groupBy("k").agg(F.sum("v"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in agg_plan, agg_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bfacts")
        spark.sql("DROP TABLE IF EXISTS t_bdim")


def test_write_bucketed_rejects_bad_buckets(spark, tmp_path):
    df = spark.range(4)
    with pytest.raises(ValueError, match="buckets"):
        write_bucketed(
            df, table="t_bad", path=str(tmp_path / "x"),
            bucket_col="id", buckets=0,
        )
