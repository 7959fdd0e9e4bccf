"""Curation operator edges: budget drop-not-truncate, quota
determinism under repartition, scrub pattern order, contamination
flag exactness."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fluent_plugin_record_reformer_spark.operators.curation import (  # noqa: E402
    decontaminate,
    domain_quota,
    pii_scrub,
    token_budget_mix,
)


def test_token_budget_drops_not_truncates(spark):
    rows = [("s1", 0, "a " * 10), ("s1", 1, "b " * 1000), ("s1", 2, "c " * 10)]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    kept = {r["doc_id"] for r in token_budget_mix(df, budget=50).collect()}
    # doc 1 blows the running budget and is dropped whole; doc 2 cannot
    # re-enter (running total includes the dropped doc's tokens? NO —
    # the cumulative sum includes every doc in order, so once exceeded
    # later docs stay out: the cut is a prefix)
    assert kept == {0}


def test_domain_quota_deterministic_under_repartition(spark):
    rows = [(f"s{i % 3}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    a = {r["doc_id"] for r in domain_quota(df, quota=5).collect()}
    b = {r["doc_id"] for r in domain_quota(df.repartition(13), quota=5).collect()}
    assert a == b
    assert a == {i for i in range(15)}  # smallest ids per source


def test_pii_scrub_order_and_patterns(spark):
    df = spark.createDataFrame(
        [("reach a.b@x.co or 10.1.2.3 or +44 7700-900123 end",)], "t string"
    )
    got = df.select(pii_scrub("t").alias("s")).collect()[0]["s"]
    assert got == "reach <EMAIL> or <IP> or <PHONE> end"


def test_decontaminate_flags_exact_copy(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "totally different words here entirely now"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["contaminated"] for r in
           decontaminate(docs, bench, shingle_n=3, threshold=0.5).collect()}
    assert got == {1: True, 2: False}


def test_pack_sequences_layout(spark):
    from fluent_plugin_record_reformer_spark.operators.curation import pack_sequences

    rows = [("s", 0, "w " * 300), ("s", 1, "w " * 300), ("s", 2, "w " * 100)]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    got = {r["doc_id"]: (r["bin_id"], r["bin_offset"]) for r in
           pack_sequences(df, seq_len=512).collect()}
    # doc0 starts at 0 (bin 0); doc1 starts at 300 (bin 0, offset 300,
    # spans into bin 1); doc2 starts at 600 (bin 1, offset 88)
    assert got == {0: (0, 0), 1: (0, 300), 2: (1, 88)}


def test_weighted_sample_deterministic_and_monotone(spark):
    from fluent_plugin_record_reformer_spark.operators.sketch import weighted_sample

    df = spark.range(20000).select(
        F.col("id").cast("string").alias("v"),
        (F.col("id") % 2).alias("g"),
    )
    half = weighted_sample(df, "v", F.lit(0.5), seed=3)
    a = {r["v"] for r in half.collect()}
    b = {r["v"] for r in weighted_sample(df.repartition(7), "v", F.lit(0.5), seed=3).collect()}
    assert a == b  # repartition-invariant
    assert abs(len(a) - 10000) < 500  # ~binomial band
    # weight monotonicity: a 0.2 sample is a SUBSET of the 0.5 sample
    small = {r["v"] for r in weighted_sample(df, "v", F.lit(0.2), seed=3).collect()}
    assert small <= a
    # weight 0 keeps nothing, weight 1 keeps everything
    assert weighted_sample(df, "v", F.lit(0.0), seed=3).count() == 0
    assert weighted_sample(df, "v", F.lit(1.0), seed=3).count() == 20000


def test_distributed_running_sum_parallel_per_group(spark):
    """One group must spread across MANY chunks (the whole point: a
    single source never funnels through one window task), and the
    chunked result must equal the naive single-window running sum."""
    from pyspark.sql import Window

    from fluent_plugin_record_reformer_spark.operators.curation import (
        distributed_running_sum,
    )

    df = spark.range(5000).select(
        F.lit("only-source").alias("source"),
        F.format_string("doc-%05d", F.col("id")).alias("doc_id"),
        (F.col("id") % 7 + 1).alias("w"),
    )
    out = distributed_running_sum(
        df, group_col="source", order_col="doc_id", val=F.col("w"), chunks=8
    )
    # chunk spread: peek at the pre-join chunk column via the plan's
    # range partitioning + a direct recount of distinct spans
    spans = (
        df.repartitionByRange(8, F.col("source"), F.col("doc_id"))
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert spans > 1, "single group collapsed to one span"
    naive = df.withColumn(
        "_cum", F.sum("w").over(Window.partitionBy("source").orderBy("doc_id"))
    )
    got = {(r["doc_id"], r["_cum"]) for r in out.collect()}
    want = {(r["doc_id"], r["_cum"]) for r in naive.collect()}
    assert got == want


def test_repetition_stats_known_doc(spark):
    from fluent_plugin_record_reformer_spark.operators.curation import (
        repetition_stats,
    )

    rows = [
        ("rep", "spam spam spam spam spam"),   # all dup tokens/bigrams
        ("uniq", "one two three four five"),   # no repetition at all
        ("short", "hi"),                       # no bigrams/trigrams
        ("empty", "..."),                      # zero tokens, must survive
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert set(got) == {"rep", "uniq", "short", "empty"}
    r = got["rep"]
    assert (r["n_tokens"], r["n_dup_tokens"]) == (5, 5)
    assert (r["n_bigrams"], r["n_dup_bigrams"]) == (4, 4)  # 'spam spam' x4
    assert (r["n_trigrams"], r["n_dup_trigrams"]) == (3, 3)
    assert r["repetitive"]
    u = got["uniq"]
    assert (u["n_tokens"], u["n_dup_tokens"]) == (5, 0)
    assert not u["repetitive"]
    s = got["short"]
    assert (s["n_tokens"], s["n_bigrams"], s["n_trigrams"]) == (1, 0, 0)
    assert not s["repetitive"]  # zero bigrams -> never flagged
    e = got["empty"]
    assert e["n_tokens"] == 0 and not e["repetitive"]


# ---------------------------------------------------------------------------
# validate_expectations
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

from fluent_plugin_record_reformer_spark.operators.curation import (  # noqa: E402
    validate_expectations,
)


def test_validate_expectations_counts_and_null_hostility(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (-3, "b"), (None, "c")],
        "v int, s string",
    )
    out = {
        r["rule"]: (r["n_violations"], r["n_rows"])
        for r in validate_expectations(
            df,
            {
                "v_positive": F.col("v") > 0,     # -3 fails, null v fails
                "s_present": F.col("s").isNotNull(),
                "always": F.lit(True),
            },
        ).collect()
    }
    assert out == {
        "v_positive": (2, 4),
        "s_present": (1, 4),
        "always": (0, 4),
    }


def test_validate_expectations_one_scan_no_python(spark):
    df = spark.createDataFrame([(1,)], "v int")
    plan = (
        validate_expectations(df, {"r1": F.col("v") > 0, "r2": F.col("v") < 9})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan") <= 1
    assert "BatchEvalPython" not in plan


def test_validate_expectations_rejects_bad_rule_names(spark):
    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ValueError, match="characters"):
        validate_expectations(df, {"bad'name": F.lit(True)})
    with pytest.raises(ValueError, match="at least one"):
        validate_expectations(df, {})
