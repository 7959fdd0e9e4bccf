"""Z-order layout: bit-math correctness vs a Python reference,
Spark<->DuckDB expression parity, and the actual payoff — parquet
file-stat pruning on BOTH dimensions, measured from real written
files' row-group statistics."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from fluent_plugin_record_reformer_spark.operators.layout import (
    sql_zvalue,
    zorder_layout,
    zvalue,
)


def _py_zvalue(x: int, y: int, bits: int) -> int:
    x &= (1 << bits) - 1
    y &= (1 << bits) - 1
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


PROBES = [(0, 0), (1, 0), (0, 1), (255, 255), (170, 85), (300, 7), (63, 64)]


@pytest.mark.parametrize("bits", [4, 8, 16])
def test_zvalue_matches_reference(spark, bits):
    df = spark.createDataFrame(PROBES, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zvalue(F.col("x"), F.col("y"), bits=bits).alias("z")
        ).collect()
    }
    for x, y in PROBES:
        assert got[(x, y)] == _py_zvalue(x, y, bits), (x, y, bits)


@pytest.mark.parametrize("bits", [4, 8, 16])
def test_sql_zvalue_parity(bits):
    con = duckdb.connect()
    expr = sql_zvalue("x", "y", bits=bits)
    for x, y in PROBES:
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS x, ? AS y)", [x, y]
        ).fetchone()[0]
        assert got == _py_zvalue(x, y, bits), (x, y, bits)
    con.close()


def test_zvalue_rejects_bad_bits(spark):
    with pytest.raises(ValueError, match="bits"):
        zvalue(F.lit(1), F.lit(2), bits=17)


def _files_overlapping(path: str, col: str, lo: int, hi: int) -> int:
    """How many parquet files under ``path`` could contain rows with
    ``col BETWEEN lo AND hi`` per their row-group min/max stats —
    i.e. files a stats-pruning scan must actually read."""
    n = 0
    for f in sorted(Path(path).glob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        overlap = False
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col:
                    st = c.statistics
                    if st is None or (st.min <= hi and st.max >= lo):
                        overlap = True
        if overlap:
            n += 1
    return n


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    """A 64x64 grid written 8-ways. Sorted by y alone (the usual
    time-sorted table), an x-slice predicate overlaps EVERY file; laid
    out by z(x, y), most files' x-envelopes exclude the slice. This is
    the measurable content of 'Z-order helps multi-dim pruning'."""
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    ydir, zdir = str(tmp_path / "y_sorted"), str(tmp_path / "z_sorted")
    grid.repartitionByRange(8, "y").sortWithinPartitions("y").write.parquet(ydir)
    zorder_layout(
        grid, F.col("x"), F.col("y"), bits=6, num_files=8
    ).drop("_z").write.parquet(zdir)

    y_overlap = _files_overlapping(ydir, "x", 0, 7)
    z_overlap = _files_overlapping(zdir, "x", 0, 7)
    assert y_overlap == 8  # 1-D sort: the x-slice touches every file
    assert z_overlap < y_overlap  # z-layout prunes files on x too
    assert z_overlap <= 5
    # and the z layout still prunes on y (both dims stay narrow)
    assert _files_overlapping(zdir, "y", 0, 7) <= 5


def test_zorder_layout_rejects_z_col_clash(spark):
    df = spark.range(4).select(F.col("id").alias("_z"))
    with pytest.raises(ValueError, match="_z"):
        zorder_layout(df, F.col("_z"), F.col("_z"))
