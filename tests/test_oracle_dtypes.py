"""Regression guard for the driver's value-hash boundary (VERDICT r2 #1).

The driver hashes the pandas rendering of both result sets; DuckDB sums
of INTEGER return HUGEINT which ``fetchdf()`` renders as float64, so an
uncast ``sum(CASE WHEN ...)`` in an oracle yields ``12.0`` where Spark
yields bigint ``12`` — values identical, hash red.  This test runs every
``oracle_sql()`` through DuckDB at sf0.001 and asserts that no oracle
result column is floating-point unless the matching Spark column is
genuinely Double/Float typed (and vice versa for int columns), catching
the class of bug, not just the two known instances.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod
from pyspark.sql import types as T

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

FLOAT_SPARK = (T.DoubleType, T.FloatType)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_oracle_dtype_parity(spark, duck, name):
    spark_df = entrymod.queries()[name](spark, SF_DIR)
    spark_types = {f.name: f.dataType for f in spark_df.schema.fields}
    want: pd.DataFrame = duck.execute(entrymod.oracle_sql()[name]).fetchdf()
    for col in want.columns:
        assert col in spark_types, f"{name}: oracle column {col!r} missing from Spark result"
        oracle_is_float = pd.api.types.is_float_dtype(want[col])
        spark_is_float = isinstance(spark_types[col], FLOAT_SPARK)
        # float64 on the oracle side is only legitimate when the Spark
        # side is float, OR when the column contains NULLs (pandas
        # promotes nullable ints to float64 — value-hash safe because
        # the driver renders NaN as null and whole floats match ints
        # only if the engines agree; we allow it solely for columns
        # that actually contain NaN).
        if oracle_is_float and not spark_is_float:
            assert want[col].isna().any(), (
                f"{name}.{col}: oracle renders float64 ({want[col].dtype}) but Spark type is "
                f"{spark_types[col]} and no NULLs present — wrap the oracle aggregate in "
                f"CAST(... AS BIGINT) (DuckDB HUGEINT/int128 renders as float64 in pandas)"
            )
