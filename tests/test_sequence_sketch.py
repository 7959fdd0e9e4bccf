"""Unit + error-bound tests for the round-5 additions:
operators/sequence (transitions) and the bottom-k quantile sketch /
stratified sampler in operators/sketch.

Cross-engine value parity is covered by test_entry_oracle; these tests
pin the SEMANTICS (pair adjacency, keep-whole strata, posting caps)
and the statistical contract the oracle cannot see (sketch quantile
rank error vs the exact quantile).
"""

import math

import pytest
from pyspark.sql import functions as F

from fluent_plugin_record_reformer_spark.operators.corpus import inverted_index
from fluent_plugin_record_reformer_spark.operators.sequence import (
    transition_matrix,
    transitions,
)
from fluent_plugin_record_reformer_spark.operators.sketch import (
    bottomk_quantile_sketch,
    stratified_sample,
)


def test_transitions_pairs_in_order(spark):
    df = spark.createDataFrame(
        [
            (1, 10, "a"),
            (1, 20, "b"),
            (1, 30, "a"),
            (2, 5, "c"),
            (2, 6, "c"),
            (3, 1, "z"),  # single event: no pair
        ],
        "k int, o int, s string",
    )
    got = sorted(
        transitions(df, key_col="k", state_col="s", order_cols=["o"])
        .select("k", "from_state", "to_state")
        .collect()
    )
    assert [tuple(r) for r in got] == [
        (1, "a", "b"),
        (1, "b", "a"),
        (2, "c", "c"),
    ]


def test_transitions_tiebreak_is_deterministic(spark):
    # two events share a timestamp: the unique id column must decide
    df = spark.createDataFrame(
        [(1, 10, 100, "a"), (1, 10, 101, "b"), (1, 20, 102, "c")],
        "k int, o int, uid int, s string",
    )
    got = [
        (r["from_state"], r["to_state"])
        for r in transitions(
            df, key_col="k", state_col="s", order_cols=["o", "uid"]
        )
        .orderBy("from_state")
        .collect()
    ]
    assert got == [("a", "b"), ("b", "c")]


def test_transition_matrix_counts(spark):
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (2, 1, "a"), (2, 2, "b"), (2, 3, "a")],
        "k int, o int, s string",
    )
    got = {
        (r["from_state"], r["to_state"]): (r["n_transitions"], r["n_keys"])
        for r in transition_matrix(
            df, key_col="k", state_col="s", order_cols=["o"]
        ).collect()
    }
    assert got == {("a", "b"): (2, 2), ("b", "a"): (1, 1)}


def test_quantile_sketch_exact_when_group_fits(spark):
    # n <= k: the sample is the whole group -> exact quantiles
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id int, v double"
    )
    row = bottomk_quantile_sketch(
        df, "v", [], key_col="id", k=256, quantiles=(0.5, 0.9), seed=0
    ).collect()
    # empty group_cols path: operator requires at least one group col?
    # (bottomk_quantile_sketch supports [] via grouped_topk on no cols)
    assert len(row) == 1
    r = row[0]
    assert r["n_sample"] == 100
    assert r["q50"] == 50.0  # ceil(0.5*100) = 50th smallest
    assert r["q90"] == 90.0


def test_quantile_sketch_error_bound(spark):
    # 20k rows, k=256: rank error ~ sqrt(q(1-q)/k) ~ 3%; assert a
    # generous 5-sigma bound so the test is deterministic-safe for the
    # fixed seed yet would catch a broken estimator instantly.
    n, k = 20000, 256
    df = spark.range(1, n + 1).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id").cast("double")).alias("v"),
    )
    r = bottomk_quantile_sketch(
        df, "v", [], key_col="id", k=k, quantiles=(0.5, 0.9), seed=3
    ).collect()[0]
    assert r["n_sample"] == k
    for q, est in ((0.5, r["q50"]), (0.9, r["q90"])):
        sigma = math.sqrt(q * (1 - q) / k)
        assert abs(est / n - q) < 5 * sigma, (q, est)


def test_stratified_sample_keeps_small_strata_whole(spark):
    rows = [(i, "tiny") for i in range(10)] + [
        (1000 + i, "big") for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = (
        stratified_sample(df, "id", ["s"], target_per_stratum=50, seed=1)
        .groupBy("s")
        .count()
        .collect()
    )
    by = {r["s"]: r["count"] for r in got}
    assert by["tiny"] == 10  # rate 1.0: every row kept
    # big stratum: binomial(2000, 0.025) -> expect ~50, 5-sigma ~ 35
    assert 15 <= by["big"] <= 85


def test_stratified_sample_is_rerun_stable(spark):
    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("s")
    )
    a = set(
        r["id"]
        for r in stratified_sample(
            df, "id", ["s"], target_per_stratum=100, seed=2
        ).collect()
    )
    b = set(
        r["id"]
        for r in stratified_sample(
            df.repartition(7), "id", ["s"], target_per_stratum=100, seed=2
        ).collect()
    )
    assert a == b and a  # same rows regardless of partitioning


def test_inverted_index_caps_postings(spark):
    docs = spark.createDataFrame(
        [
            (1, "x x x common"),
            (2, "x x common"),
            (3, "x common"),
            (4, "common"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["term"]: r
        for r in inverted_index(
            docs, id_col="doc_id", text_col="text", max_postings=2
        ).collect()
    }
    x = got["x"]
    assert x["doc_freq"] == 3 and x["total_tf"] == 6
    assert x["postings"] == "1:3,2:2"  # top-2 by tf desc, capped
    c = got["common"]
    assert c["doc_freq"] == 4 and c["postings"] == "1:1,2:1"  # tf tie -> id


def test_stratified_sample_null_stratum_sampled_not_dropped(spark):
    # null-rejecting join equality would silently DROP every row whose
    # strata column is NULL; the null-safe join keeps them as their own
    # stratum (here below target -> kept whole)
    rows = [(i, None) for i in range(7)] + [
        (100 + i, "web") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = (
        stratified_sample(df, "id", ["s"], target_per_stratum=500, seed=3)
        .groupBy("s")
        .count()
        .collect()
    )
    by = {r["s"]: r["count"] for r in got}
    assert by.get(None) == 7
    assert by.get("web") == 50


def test_stratified_sample_rejects_working_column_clash(spark):
    df = spark.createDataFrame([(1, "a", 0.5)], "id long, s string, _rate double")
    with pytest.raises(ValueError):
        stratified_sample(df, "id", ["s"], target_per_stratum=5)


def test_grouped_reservoir_exact_k_and_small_groups_whole(spark):
    from fluent_plugin_record_reformer_spark.operators.sketch import (
        grouped_reservoir,
    )

    rows = [(i, "big") for i in range(500)] + [(1000 + i, "tiny") for i in range(3)]
    df = spark.createDataFrame(rows, "id long, g string")
    out = grouped_reservoir(df, ["g"], "id", 5, seed=2, rank_col="r")
    by = {r["g"]: r["count"] for r in out.groupBy("g").count().collect()}
    assert by == {"big": 5, "tiny": 3}  # exact k / whole small group
    ranks = sorted(r["r"] for r in out.filter("g = 'big'").collect())
    assert ranks == [1, 2, 3, 4, 5]


def test_grouped_reservoir_stable_under_repartition_and_rerun(spark):
    from fluent_plugin_record_reformer_spark.operators.sketch import (
        grouped_reservoir,
    )

    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 4).alias("g")
    )
    a = sorted(
        tuple(r) for r in grouped_reservoir(df, ["g"], "id", 7, seed=5).collect()
    )
    b = sorted(
        tuple(r)
        for r in grouped_reservoir(
            df.repartition(17), ["g"], "id", 7, seed=5
        ).collect()
    )
    assert a == b and len(a) == 28


def test_grouped_reservoir_validation(spark):
    from fluent_plugin_record_reformer_spark.operators.sketch import (
        grouped_reservoir,
    )

    df = spark.createDataFrame([(1, "a")], "id long, g string")
    with pytest.raises(ValueError):
        grouped_reservoir(df, ["g"], "id", 0)
    clash = spark.createDataFrame([(1, "a", 2)], "id long, g string, _row long")
    with pytest.raises(ValueError):
        grouped_reservoir(clash, ["g"], "id", 1)


def test_dense_counts_fills_gaps_with_zeros(spark):
    from fluent_plugin_record_reformer_spark.operators.sequence import (
        dense_counts,
    )

    rows = [
        ("a", "2024-01-01 00:05:00"),
        ("a", "2024-01-01 00:07:00"),
        ("a", "2024-01-01 03:30:00"),  # hours 1 and 2 are silent
        ("b", "2024-01-01 01:00:00"),
    ]
    df = spark.createDataFrame(rows, "k string, ts string").select(
        "k", F.col("ts").cast("timestamp").alias("ts")
    )
    out = dense_counts(df, ["k"], "ts", bucket_seconds=3600, count_col="n")
    got = {
        (r["k"], str(r["bucket_start"])): r["n"] for r in out.collect()
    }
    assert got[("a", "2024-01-01 00:00:00")] == 2
    assert got[("a", "2024-01-01 01:00:00")] == 0
    assert got[("a", "2024-01-01 02:00:00")] == 0
    assert got[("a", "2024-01-01 03:00:00")] == 1
    assert got[("b", "2024-01-01 01:00:00")] == 1
    assert len(got) == 5  # a: 4 buckets, b: 1 bucket — no cross-key grid


def test_dense_counts_span_guard_fires(spark):
    from fluent_plugin_record_reformer_spark.operators.sequence import (
        dense_counts,
    )

    rows = [("a", "2024-01-01 00:00:00"), ("a", "2024-06-01 00:00:00")]
    df = spark.createDataFrame(rows, "k string, ts string").select(
        "k", F.col("ts").cast("timestamp").alias("ts")
    )
    out = dense_counts(
        df, ["k"], "ts", bucket_seconds=60, max_buckets_per_key=1000
    )
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "dense_counts" in str(ei.value)
    # disabling the guard lets the same span through
    ok = dense_counts(
        df, ["k"], "ts", bucket_seconds=60, max_buckets_per_key=None
    )
    assert ok.count() > 200000


def test_dense_counts_clash_validation(spark):
    from fluent_plugin_record_reformer_spark.operators.sequence import (
        dense_counts,
    )

    df = spark.createDataFrame([("a", 1)], "k string, _bkt long")
    with pytest.raises(ValueError):
        dense_counts(df, ["k"], "_bkt", bucket_seconds=60)


# ---------------------------------------------------------------------------
# rolling_sum / merge_summaries
# ---------------------------------------------------------------------------

from fluent_plugin_record_reformer_spark.operators.aggregate import (  # noqa: E402
    merge_summaries,
)
from fluent_plugin_record_reformer_spark.operators.sequence import (  # noqa: E402
    rolling_sum,
)


def test_rolling_sum_matches_naive(spark):
    rows = [
        # (key, order, value) with a duplicate order tie broken by id
        ("a", 1, 10), ("a", 2, 20), ("a", 3, 30), ("a", 4, 40),
        ("b", 1, 5), ("b", 2, 7),
        ("c", 9, 100),
    ]
    df = spark.createDataFrame(
        [(k, o, v, i) for i, (k, o, v) in enumerate(rows)],
        "k string, o int, v long, id int",
    )
    got = {
        (r["k"], r["o"]): r["roll"]
        for r in rolling_sum(
            df,
            key_col="k",
            order_cols=["o", "id"],
            value_col="v",
            window_rows=3,
            out_col="roll",
        ).collect()
    }
    per_key: dict = {}
    for k, o, v in rows:
        per_key.setdefault(k, []).append((o, v))
    want = {}
    for k, seq in per_key.items():
        seq.sort()
        for i, (o, _) in enumerate(seq):
            want[(k, o)] = sum(v for _, v in seq[max(0, i - 2) : i + 1])
    assert got == want


def test_rolling_sum_rejects_bad_window(spark):
    df = spark.createDataFrame([("a", 1, 1)], "k string, o int, v int")
    with pytest.raises(ValueError, match="window_rows"):
        rolling_sum(
            df, key_col="k", order_cols=["o"], value_col="v", window_rows=0
        )


def test_merge_summaries_split_invariance(spark):
    """Any partition of the input into delta batches merges to the
    SAME summary as one full-history aggregation — the associativity
    that makes checkpoint-resume sound."""
    ev = spark.range(1000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 13 % 101).alias("v"),
        F.col("id").alias("t"),
    )

    def summarize(part):
        return part.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("t").alias("lo"),
            F.max("t").alias("hi"),
        )

    full = {r["k"]: (r["n"], r["s"], r["lo"], r["hi"])
            for r in summarize(ev).collect()}
    # three uneven deltas, one of them empty for a key range
    parts = [
        ev.filter(F.col("id") < 100),
        ev.filter((F.col("id") >= 100) & (F.col("id") < 101)),
        ev.filter(F.col("id") >= 101),
    ]
    merged = merge_summaries(
        [summarize(p) for p in parts],
        keys=["k"],
        sum_cols=["n", "s"],
        min_cols=["lo"],
        max_cols=["hi"],
    )
    got = {r["k"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in merged.collect()}
    assert got == full
    # merge is re-mergeable: state ∘ delta ∘ delta == full as well
    twice = merge_summaries(
        [merged, summarize(ev.filter(F.lit(False)))],
        keys=["k"],
        sum_cols=["n", "s"],
        min_cols=["lo"],
        max_cols=["hi"],
    )
    assert {r["k"]: (r["n"], r["s"], r["lo"], r["hi"])
            for r in twice.collect()} == full


def test_merge_summaries_rejects_schema_drift(spark):
    a = spark.range(3).groupBy().agg(F.count(F.lit(1)).alias("n"))
    b = spark.range(3).groupBy().agg(F.count(F.lit(1)).alias("m"))
    with pytest.raises(ValueError, match="summary schema"):
        merge_summaries([a, b], keys=[], sum_cols=["n"])


# ---------------------------------------------------------------------------
# interval_concurrency
# ---------------------------------------------------------------------------

from fluent_plugin_record_reformer_spark.operators.sequence import (  # noqa: E402
    interval_concurrency,
)


def test_interval_concurrency_matches_naive_sweep(spark):
    iv = [
        # (group, start, end) — integer "times" via timestamps
        ("g1", 0, 10),
        ("g1", 5, 15),
        ("g1", 10, 20),   # starts exactly when the first ends: half-open
        ("g1", 10, 12),
        ("g2", 0, 1),
        ("g2", 100, 101),
    ]
    df = spark.createDataFrame(iv, "g string, s long, e long").select(
        "g",
        F.timestamp_seconds(F.col("s")).alias("s"),
        F.timestamp_seconds(F.col("e")).alias("e"),
    )
    got = {
        (r["g"], int(r["ts"].timestamp())): r["concurrent"]
        for r in interval_concurrency(
            df, group_col="g", start_col="s", end_col="e"
        ).collect()
    }
    # naive: for each boundary t, count intervals with s <= t < e
    want = {}
    for g in {x[0] for x in iv}:
        spans = [(s, e) for gg, s, e in iv if gg == g]
        for t in sorted({v for s, e in spans for v in (s, e)}):
            want[(g, t)] = sum(1 for s, e in spans if s <= t < e)
    assert got == want
    # the curve ends at zero for every group
    last = {}
    for (g, t), c in sorted(got.items()):
        last[g] = c
    assert all(c == 0 for c in last.values())


def test_interval_concurrency_no_single_task_window(spark):
    """The sweep must NOT contain a global (empty-partition-spec)
    window — the whole point of routing through the chunked prefix
    sum."""
    df = spark.range(100).select(
        F.lit("all").alias("g"),
        F.timestamp_seconds(F.col("id")).alias("s"),
        F.timestamp_seconds(F.col("id") + 5).alias("e"),
    )
    plan = (
        interval_concurrency(df, group_col="g", start_col="s", end_col="e")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "_chunk" in line or "g#" in line, line
