"""Catalog seam tests: the fan-out and lineage shapes must run through
the Catalog abstraction BOTH ways — parquet paths for real (sandbox),
Iceberg via identifier/call verification (no jars here)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fluent_plugin_record_reformer_spark.operators.route import (  # noqa: E402
    Route,
    RouteTable,
    write_fanout_catalog,
    write_fanout_tables,
)
from fluent_plugin_record_reformer_spark.sources.catalog import (  # noqa: E402
    IcebergCatalog,
    PathCatalog,
    resolve_catalog,
)

TABLE = RouteTable(
    [Route("a_sink", "t.a.**"), Route("b_sink", "t.b"), Route("rest", "**")]
)


def _events(spark):
    rows = [
        Row(tag="t.a.x", v=1),
        Row(tag="t.a.y", v=2),
        Row(tag="t.b", v=3),
        Row(tag="other", v=4),
    ]
    return spark.createDataFrame(rows)


def test_path_catalog_single_pass_fanout(spark, tmp_path):
    cat = PathCatalog(str(tmp_path))
    write_fanout_catalog(_events(spark), TABLE, cat, "events", mode="overwrite")
    back = cat.read(spark, "events")
    got = {r["route"]: r["cnt"] for r in back.groupBy("route").agg(F.count("*").alias("cnt")).collect()}
    assert got == {"a_sink": 2, "b_sink": 1, "rest": 1}
    # partition pruning works on the route column
    assert back.filter(F.col("route") == "a_sink").count() == 2


def test_path_catalog_per_route_tables(spark, tmp_path):
    cat = PathCatalog(str(tmp_path))
    written = write_fanout_tables(_events(spark), TABLE, cat, mode="overwrite")
    assert written == {"a_sink": "sink_a_sink", "b_sink": "sink_b_sink", "rest": "sink_rest"}
    assert cat.read(spark, "sink_a_sink").count() == 2
    assert set(cat.read(spark, "sink_b_sink").columns) == {"tag", "v"}  # route dropped


class _FakeWriter:
    def __init__(self, log, ident):
        self.log, self.ident = log, ident
        self.partitioning = None

    def partitionedBy(self, *cols):
        self.partitioning = len(cols)
        return self

    def append(self):
        self.log.append(("append", self.ident, self.partitioning))

    def create(self):
        self.log.append(("create", self.ident, self.partitioning))

    def createOrReplace(self):
        self.log.append(("createOrReplace", self.ident, self.partitioning))


def test_iceberg_catalog_writeTo_calls(spark, monkeypatch):
    """Identifier construction + DataSourceV2 call sequence, without
    the (absent) Iceberg runtime: writeTo is intercepted."""
    log = []
    df = _events(spark)
    # patch the CONCRETE class (pyspark.sql.DataFrame is a dispatch
    # facade in Spark 4; instances are pyspark.sql.classic.DataFrame)
    monkeypatch.setattr(type(df), "writeTo", lambda self, ident: _FakeWriter(log, ident))
    cat = IcebergCatalog("lake", "pipeline")
    cat.write(df, "events", mode="append", partition_by=("route",))
    cat.write(df, "events", mode="overwrite", partition_by=("route", "hour"))
    assert log[0] == ("append", "lake.pipeline.events", None)
    assert log[1] == ("createOrReplace", "lake.pipeline.events", 2)


def test_iceberg_catalog_creates_on_first_append(spark, monkeypatch):
    log = []

    class _FailingAppend(_FakeWriter):
        def append(self):
            raise RuntimeError("Table or view not found")

    df = _events(spark)
    monkeypatch.setattr(
        type(df), "writeTo", lambda self, ident: _FailingAppend(log, ident)
    )
    IcebergCatalog("lake").write(df, "t", partition_by=("route",))
    assert log == [("create", "lake.default.t", 1)]


def test_iceberg_catalog_append_failure_propagates(spark, monkeypatch):
    """A genuine append failure (schema mismatch, auth, connectivity) on
    an EXISTING table must re-raise unchanged — not be masked as a
    'table already exists' error from a bogus create() retry."""
    log = []

    class _SchemaMismatchAppend(_FakeWriter):
        def append(self):
            raise RuntimeError("Cannot write incompatible data: schema mismatch on col x")

    df = _events(spark)
    monkeypatch.setattr(
        type(df), "writeTo", lambda self, ident: _SchemaMismatchAppend(log, ident)
    )
    with pytest.raises(RuntimeError, match="incompatible data"):
        IcebergCatalog("lake").write(df, "t")
    assert log == []  # no create attempted


def test_iceberg_catalog_create_race_falls_back_to_append(spark, monkeypatch):
    """Two first-writers: the loser of the create race appends instead."""
    log = []

    class _RaceWriter(_FakeWriter):
        def append(self):
            if not any(op == "create" for op, *_ in self.log):
                raise RuntimeError("Table or view not found")
            self.log.append(("append", self.ident, self.partitioning))

        def create(self):
            self.log.append(("create", self.ident, self.partitioning))
            raise RuntimeError("Table lake.default.t already exists")

    df = _events(spark)
    monkeypatch.setattr(type(df), "writeTo", lambda self, ident: _RaceWriter(log, ident))
    IcebergCatalog("lake").write(df, "t")
    assert log == [("create", "lake.default.t", None), ("append", "lake.default.t", None)]


def test_resolve_catalog(spark, monkeypatch, tmp_path):
    monkeypatch.delenv("SPARK_GRAFT_CATALOG", raising=False)
    got = resolve_catalog(spark, root=str(tmp_path))
    assert isinstance(got, PathCatalog) and got.root == str(tmp_path)
    monkeypatch.setenv("SPARK_GRAFT_CATALOG", "lake.prod")
    got = resolve_catalog(spark)
    assert got == IcebergCatalog("lake", "prod")
