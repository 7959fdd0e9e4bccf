"""Golden tests for the template → Column compiler, mirroring the
reference's placeholder test matrix
(/root/reference/test/test_out_record_reformer.rb:208-533). Each case
runs in BOTH tag modes — static (compile-time fold, the per-chunk
hoisting analog) and dynamic (runtime array exprs) — the counterpart
of the reference's use_v1 × enable_ruby matrix: two execution paths,
one expected output.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fluent_plugin_record_reformer_spark.plans.compiler import (
    ReformContext,
    compile_value,
    static_template_value,
    template_column,
)
from fluent_plugin_record_reformer_spark.plans.template import (
    Literal,
    RecordRef,
    TagAffixRef,
    TagPartRef,
    TagRef,
    UnknownRef,
    tokenize,
)

HOST = "testhost"
TS = dt.datetime(2010, 5, 4, 3, 2, 1)  # frozen time, test :13-16


def event_df(spark, tag="test.tag", **record):
    base = {"eventType0": "bar", "message": "1"}
    base.update(record)
    return spark.createDataFrame([Row(tag=tag, ts=TS, **base)])


def expand(spark, template, tag="test.tag", auto_typecast=False, record=None, aliases=None):
    """Expand one template both with static_tag and dynamic tag; assert
    the two engines agree; return the value."""
    df = event_df(spark, tag=tag, **(record or {}))
    results = []
    for static in (True, False):
        ctx = ReformContext(
            hostname=HOST,
            static_tag=tag if static else None,
            record_aliases=aliases or {},
        )
        col = template_column(
            template, ctx, df.columns, auto_typecast=auto_typecast
        )
        results.append(df.select(col.alias("out")).first()["out"])
    assert results[0] == results[1], f"static vs dynamic mismatch for {template!r}"
    return results[0]


# ---------------------------------------------------------------- tokenizer


def test_tokenize_mixed():
    toks = tokenize("a ${tag} b ${tag_parts[-1]} ${record['k']} __FOO__")
    assert toks == [
        Literal("a "),
        TagRef(),
        Literal(" b "),
        TagPartRef(-1),
        Literal(" "),
        RecordRef("k", None, explicit=True),
        Literal(" "),
        UnknownRef("__FOO__"),
    ]


def test_tokenize_reserved_shadowing():
    # bare ${tag_parts} without index is unknown (reference dict only
    # stores indexed entries, core.rb:203-208)
    assert tokenize("${tag_parts}") == [UnknownRef("${tag_parts}")]
    assert tokenize("${tag_prefix[1]}") == [TagAffixRef("prefix", 1)]


# ------------------------------------------------------------- placeholders


def test_hostname(spark):
    assert expand(spark, "${hostname}") == HOST


def test_tag(spark):
    assert expand(spark, "${tag}") == "test.tag"


def test_tag_parts(spark):
    # test :236-249
    assert expand(spark, "${tag_parts[0]} ${tag_parts[-1]}") == "test tag"


def test_tags_obsolete(spark):
    assert expand(spark, "${tags[0]} ${tags[-1]}") == "test tag"


def test_tag_prefix_suffix(spark):
    # test :266-281: tag 'prefix.test.tag.suffix'
    got = expand(
        spark,
        "${tag_prefix[1]} ${tag_prefix[-2]} ${tag_suffix[2]} ${tag_suffix[-3]}",
        tag="prefix.test.tag.suffix",
    )
    assert got == "prefix.test prefix.test.tag tag.suffix test.tag.suffix"


def test_time_render(spark):
    # Ruby Time.at(t).to_s under UTC (core.rb:191-193)
    assert expand(spark, "${time}") == "2010-05-04 03:02:01 +0000"


def test_record_keys(spark):
    # test :298-315
    assert expand(spark, "bar ${message}") == "bar 1"
    assert expand(spark, "${eventType0}") == "bar"


def test_record_quoted_access(spark):
    # test :513-533: keys with dots and @
    got = expand(
        spark,
        '${record["item.key"]} ${record["@timestamp"]}',
        record={"item.key": "v1", "@timestamp": "v2"},
    )
    assert got == "v1 v2"


def test_reserved_key_shadowing(spark):
    # test :317-338: record fields named tag/time must NOT shadow the
    # reserved placeholders; ${record["tag"]} reads the field.
    rec = {"rec_tag": "tag-field", "rec_time": "time-field"}
    aliases = {"tag": "rec_tag", "time": "rec_time"}
    assert expand(spark, "${tag}", record=rec, aliases=aliases) == "test.tag"
    assert (
        expand(spark, "${time}", record=rec, aliases=aliases)
        == "2010-05-04 03:02:01 +0000"
    )
    assert expand(spark, '${record["tag"]}', record=rec, aliases=aliases) == "tag-field"
    assert expand(spark, '${record["time"]}', record=rec, aliases=aliases) == "time-field"


def test_unknown_placeholder_empty(spark):
    # test :536-548: unknown → "" + warning
    df = event_df(spark)
    ctx = ReformContext(hostname=HOST)
    col = template_column("${unknown}x", ctx, df.columns)
    assert df.select(col.alias("o")).first()["o"] == "x"
    assert ctx.warnings


def test_null_value_renders_empty(spark):
    # Ruby gsub of nil → "" (core.rb:236-239)
    df = spark.createDataFrame(
        [Row(tag="t", ts=TS, v=None)],
        "tag string, ts timestamp, v string",
    )
    ctx = ReformContext(hostname=HOST)
    col = template_column("x${v}y", ctx, df.columns)
    assert df.select(col.alias("o")).first()["o"] == "xy"


# ----------------------------------------------------------- auto_typecast


@pytest.mark.parametrize(
    "source,single,concat",
    [
        ("string", "string", "stringstring"),
        (123, 123, "123123"),
        ([1, 2], [1, 2], "[1, 2][1, 2]"),
        (1.23, 1.23, "1.231.23"),
    ],
)
def test_auto_typecast_on(spark, source, single, concat):
    # test :459-511: single placeholder keeps native type; embedded
    # placeholders stringify
    df = spark.createDataFrame([Row(tag="t", ts=TS, source=source)])
    ctx = ReformContext(hostname=HOST)
    one = template_column("${source}", ctx, df.columns, auto_typecast=True)
    two = template_column("${source}${source}", ctx, df.columns, auto_typecast=True)
    row = df.select(one.alias("a"), two.alias("b")).first()
    assert row["a"] == single
    assert row["b"] == concat


def test_auto_typecast_off_stringifies(spark):
    # test :405-457
    df = spark.createDataFrame([Row(tag="t", ts=TS, source=123)])
    ctx = ReformContext(hostname=HOST)
    col = template_column("${source}", ctx, df.columns, auto_typecast=False)
    assert df.select(col.alias("o")).first()["o"] == "123"


def test_auto_typecast_nil_single(spark):
    # nil source with auto_typecast → nil (test :497-510)
    df = spark.createDataFrame(
        [Row(tag="t", ts=TS, source=None)], "tag string, ts timestamp, source string"
    )
    ctx = ReformContext(hostname=HOST)
    col = template_column("${source}", ctx, df.columns, auto_typecast=True)
    assert df.select(col.alias("o")).first()["o"] is None


# ------------------------------------------------------- nested literals


def test_hash_value_static_keys(spark):
    # test :340-356 (static-key subset → struct, native value types)
    df = event_df(spark)
    ctx = ReformContext(hostname=HOST, static_tag="test.tag")
    col = compile_value(
        {"hostname": "${hostname}", "tag": "${tag}", "n": 100}, ctx, df.columns
    )
    row = df.select(col.alias("o")).first()["o"]
    assert row.asDict() == {"hostname": HOST, "tag": "test.tag", "n": 100}


def test_hash_value_dynamic_key_becomes_map(spark):
    # "${tag}":100 — dynamic key without static_tag → map<string,string>
    df = event_df(spark)
    ctx = ReformContext(hostname=HOST)
    col = compile_value({"${tag}": 100}, ctx, df.columns)
    row = df.select(col.alias("o")).first()["o"]
    assert row == {"test.tag": "100"}


def test_array_value(spark):
    # test :358-369
    df = event_df(spark)
    ctx = ReformContext(hostname=HOST)
    col = compile_value(["${hostname}", "${tag}"], ctx, df.columns)
    assert df.select(col.alias("o")).first()["o"] == [HOST, "test.tag"]


def test_mixed_array_of_hash(spark):
    # test :371-383
    df = event_df(spark)
    ctx = ReformContext(hostname=HOST, static_tag="test.tag")
    col = compile_value([{"tag": "${tag}"}], ctx, df.columns)
    got = df.select(col.alias("o")).first()["o"]
    assert [r.asDict() for r in got] == [{"tag": "test.tag"}]


# ------------------------------------------------------------ static keys


def test_static_template_value():
    ctx = ReformContext(hostname=HOST, static_tag="test.tag")
    assert static_template_value("${hostname}", ctx) == HOST
    assert static_template_value("foo.${tag}", ctx) == "foo.test.tag"
    assert static_template_value("${tag_prefix[0]}", ctx) == "test"
    assert static_template_value("${message}", ctx) is None  # per-row → not static
