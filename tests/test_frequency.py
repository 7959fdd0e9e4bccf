"""Heavy-hitters (Misra-Gries candidates + exact verify) unit tests:
exactness against a plain group-count, the decrement path under a
deliberately tiny capacity, the provability contract of the miss
bound, construction laziness, and the two-scan/one-broadcast plan
shape."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from fluent_plugin_record_reformer_spark.operators.frequency import (  # noqa: E402
    heavy_hitters,
    mg_merge,
    mg_summarize,
)


def _zipf_df(spark, *, n_keys: int = 60, base: int = 600, parts: int = 8):
    """key_i appears base//(i+1) times — strictly decreasing, so the
    true top-k is unambiguous."""
    rows = []
    for i in range(n_keys):
        rows += [(f"k{i:03d}",)] * (base // (i + 1))
    return spark.createDataFrame(rows, "key string").repartition(parts)


def _exact_topk(df, k):
    return [
        (r["key"], r["cnt"])
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(k)
        .collect()
    ]


def test_heavy_hitters_matches_exact_skewed(spark):
    df = _zipf_df(spark)
    got = heavy_hitters(df, "key", k=10, capacity=64).collect()
    assert [(r["key"], r["cnt"]) for r in got] == _exact_topk(df, 10)
    assert all(r["provably_exact"] for r in got)


def test_heavy_hitters_decrement_path_counts_stay_exact(spark):
    """capacity << distinct keys forces Misra-Gries decrements in both
    the per-partition and the merge pass. Returned counts must still
    be EXACT (phase 2 recounts from raw data), and any row the miss
    bound marks provable must really be in the true top-k."""
    df = _zipf_df(spark, n_keys=200, base=2000, parts=8)
    truth = dict(_exact_topk(df, 200))
    got = heavy_hitters(df, "key", k=5, capacity=8).collect()
    assert len(got) == 5
    for r in got:
        assert truth[r["key"]] == r["cnt"], "candidate counts must be exact recounts"
    true_top = [k for k, _ in _exact_topk(df, 5)]
    for r in got:
        if r["provably_exact"]:
            assert r["key"] in true_top
    # On this sharply skewed input the head is far above the miss
    # bound, so at least the top rows must come back proven.
    assert got[0]["provably_exact"]


def test_heavy_hitters_null_keys_ignored(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [(None,)] * 50 + [("b",)] * 3, "key string"
    )
    got = [(r["key"], r["cnt"]) for r in heavy_hitters(df, "key", k=3).collect()]
    assert got == [("a", 5), ("b", 3)]


def test_mg_summary_miss_bound_property(spark):
    """Every key ABSENT from a partition's final summary has true
    partition-local count <= that partition's decrement total, and a
    present key's residual undercounts by at most the same bound —
    the invariant the provably_exact flag is built on."""
    df = _zipf_df(spark, n_keys=100, base=1000, parts=1)
    truth = dict(_exact_topk(df, 100))
    summ = mg_summarize(df, "key", capacity=10).collect()
    dec = sum(r["_hh_cnt"] for r in summ if r["_hh_key"] is None)
    present = {r["_hh_key"]: r["_hh_cnt"] for r in summ if r["_hh_key"] is not None}
    assert 0 < len(present) <= 10
    assert dec <= sum(truth.values()) // (10 + 1)
    for key, true_cnt in truth.items():
        if key in present:
            assert present[key] <= true_cnt <= present[key] + dec
        else:
            assert true_cnt <= dec


def test_mg_merge_carries_bound_and_caps_size(spark):
    df = _zipf_df(spark, n_keys=150, base=1500, parts=8)
    merged = mg_merge(
        mg_summarize(df, "key", capacity=12), capacity=12, partitions=1
    ).collect()
    keys = [r for r in merged if r["_hh_key"] is not None]
    assert 0 < len(keys) <= 12
    total = sum(r["cnt"] for r in df.groupBy("key").agg(F.count("*").alias("cnt")).collect())
    dec = sum(r["_hh_cnt"] for r in merged if r["_hh_key"] is None)
    # merged bound stays within the additive MG guarantee
    assert dec <= total // (12 + 1) + total // (12 + 1)


def test_heavy_hitters_construction_is_lazy(spark):
    df = _zipf_df(spark, n_keys=20, base=100, parts=2)
    sc = spark.sparkContext
    sc.setJobGroup("hh-lazy-probe", "construction must not run jobs")
    try:
        out = heavy_hitters(df, "key", k=3, capacity=32)
        jobs = sc.statusTracker().getJobIdsForGroup("hh-lazy-probe")
        assert list(jobs) == [], f"construction ran Spark jobs: {jobs}"
    finally:
        sc.setJobGroup(None, None)
    assert out.count() == 3


def test_heavy_hitters_plan_shape(spark):
    """Exactly the advertised physical shape: the verify join is a
    broadcast (never sort-merge — the candidate side is <= capacity
    rows), and the final top-k is TakeOrderedAndProject (per-partition
    partial top-k), not a global sort."""
    df = _zipf_df(spark, n_keys=30, base=300, parts=4)
    plan = heavy_hitters(df, "key", k=5, capacity=64)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_heavy_hitters_multi_partition_merge(spark):
    """merge_partitions > 1 (the tree-merge step for extreme input
    partition counts): candidates come from several merged summaries,
    the miss bound sums across them, and results still equal the
    exact top-k."""
    df = _zipf_df(spark, n_keys=80, base=800, parts=8)
    got = heavy_hitters(df, "key", k=6, capacity=32, merge_partitions=3).collect()
    assert [(r["key"], r["cnt"]) for r in got] == _exact_topk(df, 6)
    assert got[0]["provably_exact"]


def test_heavy_hitters_low_skew_still_returns_k(spark):
    """Regression (code-review finding): near-uniform frequencies with
    capacity << distinct used to empty the Misra-Gries summary and
    silently return ZERO rows. The prune now keeps exactly `capacity`
    survivors (zero residuals included), so top-k always comes back —
    counts exact (recounted), provability honestly reported per row."""
    rows = [(f"u{i:03d}",) for i in range(50)]  # every key exactly once
    df = spark.createDataFrame(rows, "key string").repartition(4)
    got = heavy_hitters(df, "key", k=5, capacity=8).collect()
    assert len(got) == 5
    truth = dict(_exact_topk(df, 50))
    for r in got:
        assert truth[r["key"]] == r["cnt"] == 1
        assert not r["provably_exact"]  # 1 <= miss bound here — honest


def test_heavy_hitters_two_level_merge_plan_and_results(spark):
    """The default tree merge (VERDICT r4 #3): a high-partition-count
    input goes through TWO merge levels (three MapInPandas stages
    total: summarize + 2 merges), and results equal both the exact
    top-k and the flat single-level merge."""
    df = _zipf_df(spark, n_keys=80, base=800, parts=64)
    tree = heavy_hitters(df, "key", k=6, capacity=32)
    flat = heavy_hitters(
        df, "key", k=6, capacity=32, intermediate_merge_partitions=None
    )
    want = _exact_topk(df, 6)
    assert [(r["key"], r["cnt"]) for r in tree.collect()] == want
    assert [(r["key"], r["cnt"]) for r in flat.collect()] == want
    # the summary subtree prints twice (candidate-set branch + miss-
    # bound branch), so compare counts relatively: one extra merge
    # level = +1 MapInPandas per printed subtree
    tree_plan = tree._jdf.queryExecution().executedPlan().toString()
    flat_plan = flat._jdf.queryExecution().executedPlan().toString()
    n_subtrees = flat_plan.count("MapInPandas") // 2  # summarize+merge
    assert n_subtrees >= 1
    assert (
        tree_plan.count("MapInPandas")
        == flat_plan.count("MapInPandas") + n_subtrees
    )
