"""Property-based equivalence for the temporal joins: for random
facts/intervals/versions and random bucket widths, bucketed_range_join
must equal the naive BETWEEN join, and asof_enrich must equal pandas
merge_asof (an independent reference implementation) — including
boundary hits, zero-length intervals, empty sides, and keys with no
versions."""

from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from fluent_plugin_record_reformer_spark.operators.enrich import (  # noqa: E402
    asof_enrich,
)
from fluent_plugin_record_reformer_spark.operators.joins import (  # noqa: E402
    bucketed_range_join,
)

BASE = dt.datetime(2024, 1, 1)


def _t(minutes: int) -> dt.datetime:
    return BASE + dt.timedelta(minutes=minutes)


interval_st = st.tuples(
    st.integers(min_value=0, max_value=2000),  # start minute
    st.integers(min_value=0, max_value=180),  # span minutes (0 = point)
)
fact_minute_st = st.integers(min_value=-100, max_value=2300)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    facts=st.lists(fact_minute_st, min_size=0, max_size=40),
    intervals=st.lists(interval_st, min_size=0, max_size=15),
    bucket_minutes=st.sampled_from([1, 7, 60, 1440]),
)
def test_range_join_matches_naive(spark, facts, intervals, bucket_minutes):
    fdf = spark.createDataFrame(
        [(i, _t(m)) for i, m in enumerate(facts)] or [(None, None)],
        "fid long, fts timestamp",
    ).filter(F.col("fid").isNotNull())
    idf = spark.createDataFrame(
        [(i, _t(s), _t(s + span)) for i, (s, span) in enumerate(intervals)]
        or [(None, None, None)],
        "win_id long, win_start timestamp, win_end timestamp",
    ).filter(F.col("win_id").isNotNull())
    want = sorted(
        (i, j)
        for i, m in enumerate(facts)
        for j, (s, span) in enumerate(intervals)
        if s <= m <= s + span
    )
    got = sorted(
        (r["fid"], r["win_id"])
        for r in bucketed_range_join(
            fdf,
            idf,
            ts_col="fts",
            start_col="win_start",
            end_col="win_end",
            bucket_seconds=bucket_minutes * 60,
            max_span_buckets=None,
        ).collect()
    )
    assert got == want


version_st = st.tuples(
    st.sampled_from(["a", "b", "c"]),
    st.integers(min_value=0, max_value=1000),  # effective minute (deduped)
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    facts=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d", None]),
            st.integers(min_value=-50, max_value=1100),
        ),
        min_size=1,
        max_size=30,
    ),
    versions=st.lists(version_st, min_size=1, max_size=12).map(
        # effective_from must be unique per key
        lambda vs: list({(k, m): (k, m) for k, m in vs}.values())
    ),
)
def test_asof_enrich_matches_python_asof(spark, facts, versions):
    fdf = spark.createDataFrame(
        [(i, k, _t(m)) for i, (k, m) in enumerate(facts)],
        "id long, tool string, ts timestamp",
    )
    vdf = spark.createDataFrame(
        [(k, _t(m), f"tier-{k}-{m}") for k, m in versions],
        "tool string, effective_from timestamp, tier string",
    )
    got = {
        r["id"]: r["tier"]
        for r in asof_enrich(
            fdf, vdf, on="tool", ts_col="ts", dim_ts_col="effective_from"
        ).collect()
    }
    for i, (k, m) in enumerate(facts):
        eligible = [(vm, f"tier-{vk}-{vm}") for vk, vm in versions if vk == k and vm <= m]
        want = max(eligible)[1] if eligible else None
        assert got[i] == want, (i, k, m)


funnel_event_st = st.tuples(
    st.integers(min_value=0, max_value=5),  # user
    st.integers(min_value=0, max_value=120),  # minute
    st.sampled_from(["view", "click", "purchase", "noise"]),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(funnel_event_st, min_size=1, max_size=60))
def test_funnel_matches_python_greedy(spark, events):
    from fluent_plugin_record_reformer_spark.operators.aggregate import (
        funnel_stages,
    )

    steps = ["view", "click", "purchase"]
    df = spark.createDataFrame(
        [(u, _t(m), et) for u, m, et in events],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        r["stage"]: r["n_users"]
        for r in funnel_stages(df, steps).collect()
    }
    # python reference: per user, earliest-completion greedy with
    # strict > on the (minute, type)-sorted sequence (sort tie order
    # is immaterial because equal times never advance)
    reach: dict[int, int] = {}
    for u in {u for u, _, _ in events}:
        seq = sorted((m, et) for uu, m, et in events if uu == u)
        stage, last = 0, None
        for m, et in seq:
            if stage < len(steps) and et == steps[stage] and (
                last is None or m > last
            ):
                stage, last = stage + 1, m
        reach[u] = stage
    want = {
        k: sum(1 for s in reach.values() if s >= k)
        for k in range(1, len(steps) + 1)
    }
    assert got == want
