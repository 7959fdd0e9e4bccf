"""Analog of the reference's enable_ruby compatibility kit
(test_out_record_reformer.rb:631-662): ternary, regex match, odd record
keys (@timestamp / foo.bar), through the restricted-Python expression
escape hatch + the static template compiler."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fluent_plugin_record_reformer_spark import (  # noqa: E402
    ReformContext,
    TransformSpec,
    reform,
)


def _fixture(spark):
    return spark.createDataFrame(
        [("-", "the hex is 0x10 here", "foo.bar-val", 10, "10", "test.tag")],
        "number string, hex string, `foo.bar` string, `@timestamp` int, message string, tag string",
    ).selectExpr("*", "timestamp'2010-05-04 03:02:01' AS ts")


def test_compat_kit(spark):
    df = _fixture(spark)
    spec = TransformSpec(
        tag="tag",
        record={"_message": "prefix-${record['message']}-suffix"},
        python_exprs={
            # ${number == '-' ? 0 : number}
            "_number": "number.mask(number == '-', '0')",
            # ${/0x[0-9a-f]+/.match(hex)[0]}
            "_match": "hex.str.extract(r'(0x[0-9a-f]+)', expand=False)",
            # ${__send__("@timestamp")} — non-identifier key access
            "_timestamp": "record['@timestamp']",
            # ${__send__('foo.bar')}
            "_foo_bar": "record['foo.bar']",
        },
    )
    row = reform(df, spec, ReformContext(hostname="h")).collect()[0]
    assert row["_message"] == "prefix-10-suffix"
    assert row["_number"] == "0"
    assert row["_match"] == "0x10"
    assert row["_timestamp"] == "10"
    assert row["_foo_bar"] == "foo.bar-val"


def test_compat_kit_non_dash_number(spark):
    df = _fixture(spark).selectExpr(
        "'42' AS number", "hex", "`foo.bar`", "`@timestamp`", "message", "tag", "ts"
    )
    spec = TransformSpec(
        tag="tag",
        python_exprs={"_number": "number.mask(number == '-', '0')"},
    )
    row = reform(df, spec, ReformContext(hostname="h")).collect()[0]
    assert row["_number"] == "42"


def test_expr_failure_still_emits_event(spark):
    # ruby eval failure -> field nil, event still emitted (core.rb:315-319)
    df = _fixture(spark)
    spec = TransformSpec(
        tag="tag",
        python_exprs={"_broken": "nonexistent_column + 1"},
    )
    rows = reform(df, spec, ReformContext(hostname="h")).collect()
    assert len(rows) == 1
    assert rows[0]["_broken"] is None


def test_dynamic_record_access_ships_all_columns(spark):
    # record[<non-constant key>] / record.get(...) can touch any column:
    # AST pruning must fall back to shipping everything, else the
    # expression hits a missing column and silently nulls the field.
    df = _fixture(spark)
    spec = TransformSpec(
        tag="tag",
        python_exprs={
            "_dyn_sub": "record[str('mess' + 'age')]",   # dynamic subscript
            "_dyn_get": "record.get('hex')",             # attribute access
        },
    )
    row = reform(df, spec, ReformContext(hostname="h")).collect()[0]
    assert row["_dyn_sub"] == "10"
    assert row["_dyn_get"] == "the hex is 0x10 here"
