"""As-of enrichment and bucketed range join: semantics vs naive
reference implementations, plan shapes (no fact shuffle / no nested
loop), and the interval span guard."""

from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from fluent_plugin_record_reformer_spark.operators.enrich import (  # noqa: E402
    asof_enrich,
)
from fluent_plugin_record_reformer_spark.operators.joins import (  # noqa: E402
    bucketed_range_join,
)


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        (1, "checkout", _ts(1)),
        (2, "checkout", _ts(12)),
        (3, "checkout", _ts(25)),
        (4, "auth", _ts(5)),
        (5, "auth", _ts(20)),
        (6, "browser", _ts(10)),  # key with no dim versions
        (7, None, _ts(10)),  # null key
        (8, "checkout", _ts(10)),  # exactly AT a version boundary
    ]
    return spark.createDataFrame(rows, "id long, tool string, ts timestamp")


@pytest.fixture(scope="module")
def versions(spark):
    rows = [
        ("checkout", _ts(10), "standard"),
        ("checkout", _ts(20), "premium"),
        ("auth", _ts(15), "mfa"),
    ]
    return spark.createDataFrame(
        rows, "tool string, effective_from timestamp, tier string"
    )


def test_asof_enrich_semantics(spark, facts, versions):
    out = {
        r["id"]: r["tier"]
        for r in asof_enrich(
            facts, versions, on="tool", ts_col="ts", dim_ts_col="effective_from"
        ).collect()
    }
    assert out == {
        1: None,  # before first checkout version
        2: "standard",
        3: "premium",
        4: None,  # before first auth version
        5: "mfa",
        6: None,  # key never versioned
        7: None,  # null key
        8: "standard",  # boundary: effective_from <= ts is inclusive
    }


def test_asof_enrich_keeps_all_fact_rows_and_columns(spark, facts, versions):
    out = asof_enrich(
        facts, versions, on="tool", ts_col="ts", dim_ts_col="effective_from"
    )
    assert out.count() == facts.count()
    assert out.columns == ["id", "tool", "ts", "tier"]


def test_asof_enrich_plan_never_shuffles_facts(spark, facts, versions):
    """The whole point of the per-key version-array design: the fact
    side sees only a broadcast hash join — no sort-merge join, no
    window, no aggregation over facts."""
    out = asof_enrich(
        facts, versions, on="tool", ts_col="ts", dim_ts_col="effective_from"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "windowspecdefinition" not in plan.lower()


def _interval_frames(spark):
    iv_rows = [
        (100, _ts(1, 0), _ts(1, 6)),
        (101, _ts(1, 3), _ts(1, 4)),  # overlaps 100
        (102, _ts(2, 23, 30), _ts(3, 0, 30)),  # crosses midnight/bucket edges
        (103, _ts(5, 0), _ts(5, 0)),  # zero-length: only exact hits
    ]
    fact_rows = [
        (i, _ts(1 + i % 5, (3 * i) % 24, (7 * i) % 60)) for i in range(60)
    ] + [(1000, _ts(5, 0))]  # exact hit on the zero-length interval
    iv = spark.createDataFrame(
        iv_rows, "win_id long, win_start timestamp, win_end timestamp"
    )
    facts = spark.createDataFrame(fact_rows, "fid long, fts timestamp")
    return facts, iv


def _naive(facts, iv):
    return facts.join(
        iv,
        (F.col("fts") >= F.col("win_start")) & (F.col("fts") <= F.col("win_end")),
    )


@pytest.mark.parametrize("bucket", [600, 3600, 86400])
def test_bucketed_range_join_equals_naive(spark, bucket):
    facts, iv = _interval_frames(spark)
    want = sorted(
        (r["fid"], r["win_id"]) for r in _naive(facts, iv).collect()
    )
    got = sorted(
        (r["fid"], r["win_id"])
        for r in bucketed_range_join(
            facts,
            iv,
            ts_col="fts",
            start_col="win_start",
            end_col="win_end",
            bucket_seconds=bucket,
        ).collect()
    )
    assert got == want
    assert want, "fixture must actually produce matches"
    assert (1000, 103) in want  # inclusive zero-length interval


def test_bucketed_range_join_is_hash_join_not_nested_loop(spark):
    """With broadcast disabled (both sides 'big'), the bucket key must
    make this a shuffled equality join — the naive BETWEEN join would
    be a BroadcastNestedLoopJoin/cartesian."""
    facts, iv = _interval_frames(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            bucketed_range_join(
                facts,
                iv,
                ts_col="fts",
                start_col="win_start",
                end_col="win_end",
                bucket_seconds=3600,
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        naive_plan = (
            _naive(facts, iv)._jdf.queryExecution().executedPlan().toString()
        )
        assert (
            "BroadcastNestedLoopJoin" in naive_plan
            or "CartesianProduct" in naive_plan
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_range_join_span_guard(spark):
    facts, iv = _interval_frames(spark)
    guarded = bucketed_range_join(
        facts,
        iv,
        ts_col="fts",
        start_col="win_start",
        end_col="win_end",
        bucket_seconds=60,
        max_span_buckets=5,  # the 6h interval spans ~360 minute-buckets
    )
    with pytest.raises(Exception, match="spans more than 5 buckets"):
        guarded.count()
    # and disabling the guard lets the same plan run
    assert (
        bucketed_range_join(
            facts,
            iv,
            ts_col="fts",
            start_col="win_start",
            end_col="win_end",
            bucket_seconds=60,
            max_span_buckets=None,
        ).count()
        > 0
    )


def test_asof_enrich_rejects_colliding_attr_names(spark, facts, versions):
    import pytest as _pytest

    bad_dim = versions.withColumnRenamed("tier", "ts")  # collides with fact ts
    with _pytest.raises(ValueError, match="collide with\\s+fact columns"):
        asof_enrich(
            facts, bad_dim, on="tool", ts_col="ts", dim_ts_col="effective_from"
        )


def test_asof_enrich_non_broadcast_path(spark, facts, versions):
    """broadcast_dim=False (VERDICT r4 #5): same results, and the plan
    holds no BroadcastExchange/BroadcastHashJoin for the dim — the join
    co-locates both sides by key hash instead."""
    kwargs = dict(on="tool", ts_col="ts", dim_ts_col="effective_from")
    want = sorted(
        map(tuple, asof_enrich(facts, versions, **kwargs).collect())
    )
    got_df = asof_enrich(facts, versions, broadcast_dim=False, **kwargs)
    assert sorted(map(tuple, got_df.collect())) == want
    # With thresholds off, a join only broadcasts if HINTED — proving
    # broadcast_dim=False really drops the hint. (AQE legitimately
    # auto-broadcasts this tiny dim when thresholds are default.)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        unhinted = asof_enrich(facts, versions, broadcast_dim=False, **kwargs)
        assert sorted(map(tuple, unhinted.collect())) == want
        plan = unhinted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        hinted = asof_enrich(facts, versions, broadcast_dim=True, **kwargs)
        hplan = hinted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in hplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe
            )


def test_asof_enrich_rejects_versions_working_column(spark, versions):
    """A fact table already carrying `_versions` must fail at
    construction (ADVICE r4), not as an ambiguous reference later."""
    facts = spark.createDataFrame(
        [(1, "checkout", _ts(1), "x")],
        "id long, tool string, ts timestamp, _versions string",
    )
    with pytest.raises(ValueError, match="_versions"):
        asof_enrich(
            facts, versions, on="tool", ts_col="ts",
            dim_ts_col="effective_from",
        )


def test_bucketed_range_join_inverted_interval_is_dropped(spark):
    """An interval with end < start matches nothing AND produces zero
    bucket rows (ADVICE r4): it must neither trip the span guard nor
    explode into a descending bucket sequence."""
    facts = spark.createDataFrame(
        [(1, _ts(5))], "fid long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [
            ("ok", _ts(4), _ts(6)),
            # inverted by ~3 weeks: span in 1h buckets would be ~ -500,
            # i.e. |lo-hi|+1 ~ 500 descending bucket rows pre-fix
            ("bad", _ts(25), _ts(2)),
        ],
        "name string, start timestamp, end timestamp",
    )
    out = bucketed_range_join(
        facts, intervals, ts_col="ts", start_col="start", end_col="end",
        bucket_seconds=3600, max_span_buckets=64,
    )
    rows = out.collect()
    assert [r["name"] for r in rows] == ["ok"]
    # the REAL exploded dim side (the operator's own bucket builder)
    # carries rows only for the valid interval — the inverted one
    # contributes ZERO bucket rows, not a descending ~500-bucket fan
    from fluent_plugin_record_reformer_spark.operators.joins import (
        _interval_buckets,
    )

    bucket_rows = _interval_buckets(
        intervals, start_col="start", end_col="end",
        bucket_micros=3600 * 1_000_000, bucket_seconds=3600,
        max_span_buckets=64,
    ).collect()
    assert {r["name"] for r in bucket_rows} == {"ok"}
    assert len(bucket_rows) == 49  # Jan 4 00:00 - Jan 6 00:00 inclusive


# ---------------------------------------------------------------------------
# bucketed_range_join_long (numeric / CIDR variant)
# ---------------------------------------------------------------------------

from fluent_plugin_record_reformer_spark.operators.joins import (  # noqa: E402
    bucketed_range_join_long,
)


def _long_frames(spark):
    facts = spark.range(0, 400).select(
        F.col("id").alias("fid"),
        # spread values over [0, 4000) with a deterministic stride
        (F.pmod(F.col("id") * F.lit(37), F.lit(4000))).alias("v"),
    )
    iv = spark.createDataFrame(
        [
            (1, 0, 99),          # small block
            (2, 100, 100),       # zero-length, inclusive both ends
            (3, 950, 2049),      # spans many buckets
            (4, 3900, 4100),     # extends past the value domain
            (5, 500, 400),       # inverted: matches nothing
        ],
        "rid int, lo long, hi long",
    )
    return facts, iv


@pytest.mark.parametrize("bucket", [1, 64, 1000])
def test_range_join_long_equals_naive(spark, bucket):
    facts, iv = _long_frames(spark)
    want = sorted(
        (r["fid"], r["rid"])
        for r in facts.join(
            iv, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    )
    got = sorted(
        (r["fid"], r["rid"])
        for r in bucketed_range_join_long(
            facts,
            iv,
            value_col="v",
            lo_col="lo",
            hi_col="hi",
            bucket_size=bucket,
            max_span_buckets=4096,
        ).collect()
    )
    assert got == want
    assert want, "fixture must actually produce matches"
    assert not any(r == 5 for _, r in got), "inverted interval must drop"


def test_range_join_long_span_guard_fires(spark):
    facts, iv = _long_frames(spark)
    guarded = bucketed_range_join_long(
        facts,
        iv,
        value_col="v",
        lo_col="lo",
        hi_col="hi",
        bucket_size=10,  # interval 3 spans ~110 ten-buckets
        max_span_buckets=50,
    )
    with pytest.raises(Exception, match="spans more than 50 buckets"):
        guarded.count()


def test_range_join_long_rejects_bkt_column(spark):
    facts, iv = _long_frames(spark)
    with pytest.raises(ValueError, match="_bkt"):
        bucketed_range_join_long(
            facts.withColumnRenamed("v", "_bkt"),
            iv,
            value_col="_bkt",
            lo_col="lo",
            hi_col="hi",
            bucket_size=10,
        )
