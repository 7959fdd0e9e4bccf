"""Local mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry AND its DuckDB ``oracle_sql()``
side-by-side at sf=0.01, compare row count + column names + values
(order-insensitive). Catching parity drift here, before the driver
does, is the whole point.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if isinstance(v, float):
            return f"{v:.9g}"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    out = df.map(norm_cell)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    oracle = entrymod.oracle_sql().get(name)
    got_df = q(spark, SF_DIR)
    got = _norm(got_df.toPandas())
    if oracle is None:
        assert len(got) >= 0  # rows-only check, like the driver's
        return
    want = _norm(duck.execute(oracle).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    mismatch = (got != want).any(axis=1)
    if mismatch.any():
        i = mismatch.idxmax()
        raise AssertionError(
            f"{name}: first differing row {i}:\nspark: {got.iloc[i].to_dict()}\n"
            f"duck : {want.iloc[i].to_dict()}"
        )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "message" in df.columns
