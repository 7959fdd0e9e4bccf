"""Log-template mining units: masking-rule order, Spark<->DuckDB
regexp_replace parity (the 'g' flag trap), and aggregation shape."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from fluent_plugin_record_reformer_spark.operators.templates import (
    mine_templates,
    sql_template_expr,
    template_col,
)

LINES = [
    "GET /api/v1/user/8472 took 12.7ms from 10.0.3.77",
    "GET /api/v1/user/notfound took 3ms from 192.168.1.1",
    "req 550e8400-e29b-41d4-a716-446655440000 failed at 0xDEADbeef",
    "no variables here at all",
    "version 1.2.3.4 is an ip-shaped string",  # IP rule wins over NUM
    "multi 1 2 3 numbers 44.5 end",  # replace-ALL, not first-match
]

EXPECTED = [
    "GET /api/v<NUM>/user/<NUM> took <NUM>ms from <IP>",
    "GET /api/v<NUM>/user/notfound took <NUM>ms from <IP>",
    "req <UUID> failed at <HEX>",
    "no variables here at all",
    "version <IP> is an ip-shaped string",
    "multi <NUM> <NUM> <NUM> numbers <NUM> end",
]


def test_template_masks(spark):
    df = spark.createDataFrame([(t,) for t in LINES], "text string")
    got = [
        r["tpl"]
        for r in df.select(template_col("text").alias("tpl")).collect()
    ]
    assert got == EXPECTED


def test_sql_mirror_matches_spark():
    """The DuckDB expression (RE2, explicit 'g' flag) produces the
    identical template for every probe line — the parity the entry
    oracle depends on."""
    con = duckdb.connect()
    expr = sql_template_expr("t")
    for line, want in zip(LINES, EXPECTED):
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS t)", [line]
        ).fetchone()[0]
        assert got == want, line
    con.close()


def test_mine_templates_counts(spark):
    rows = [("c1", "err 1"), ("c1", "err 2"), ("c2", "err 3"), ("c2", "ok")]
    df = spark.createDataFrame(rows, "conv_id string, text string")
    out = {
        r["template"]: (r["n_lines"], r["n_keys"])
        for r in mine_templates(df, key_col="conv_id").collect()
    }
    assert out == {"err <NUM>": (3, 2), "ok": (1, 1)}


def test_mine_templates_no_key(spark):
    df = spark.createDataFrame([("x 1",), ("x 2",)], "text string")
    out = mine_templates(df)
    assert out.columns == ["template", "n_lines"]
    assert out.collect()[0]["n_lines"] == 2


def test_plan_is_hash_aggregate_no_python(spark):
    """The mining plan must be Scan -> codegen'd project -> two-phase
    HashAggregate: no BatchEvalPython (UDF), no SortAggregate fallback
    (string min/max trap), no window."""
    df = spark.createDataFrame(
        [("c", "v 1")] * 4, "conv_id string, text string"
    )
    plan = (
        mine_templates(df, key_col="conv_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan
