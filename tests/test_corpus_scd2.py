"""Unit tests for the round-5 additions: SCD2 dimension build
(operators/enrich.scd2_from_changelog), corpus surprisal scoring and
the scalable grouped_topk / tfidf_topk (operators/corpus). The
entry-surface queries built on these (scd2_dim, doc_surprisal, tfidf)
are additionally gated by the side-by-side DuckDB parity suite in
test_entry_oracle.py."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fluent_plugin_record_reformer_spark.operators.corpus import (  # noqa: E402
    grouped_topk,
    surprisal_score,
    tfidf_topk,
    top_vocab,
)
from fluent_plugin_record_reformer_spark.operators.enrich import (  # noqa: E402
    asof_enrich,
    scd2_from_changelog,
    values_dim,
)

TS = "ts timestamp"


def _changelog(spark):
    rows = [
        # entity a: v1 -> restated v1 (collapse) -> v2 -> v2 again -> v3
        ("a", "2024-01-01 00:00:00", "bronze"),
        ("a", "2024-01-02 00:00:00", "bronze"),
        ("a", "2024-01-03 00:00:00", "silver"),
        ("a", "2024-01-04 00:00:00", "silver"),
        ("a", "2024-01-05 00:00:00", "gold"),
        # entity b: single version, stays current
        ("b", "2024-01-01 12:00:00", "silver"),
        # entity c: null attr first (kept), then a value
        ("c", "2024-01-01 00:00:00", None),
        ("c", "2024-01-02 00:00:00", "bronze"),
    ]
    return values_dim(spark, rows, f"entity string, {TS}, status string")


def test_scd2_collapses_and_closes_versions(spark):
    dim = scd2_from_changelog(
        _changelog(spark), key="entity", ts_col="ts", attrs=["status"]
    )
    rows = {
        (r["entity"], str(r["valid_from"])): r
        for r in dim.collect()
    }
    # entity a: exactly three versions survive the collapse
    a = sorted(
        (r for (e, _), r in rows.items() if e == "a"),
        key=lambda r: r["valid_from"],
    )
    assert [r["status"] for r in a] == ["bronze", "silver", "gold"]
    # bronze runs from day 1 to day 3 (the day-2 restatement is gone)
    assert str(a[0]["valid_from"]).startswith("2024-01-01")
    assert str(a[0]["valid_to"]).startswith("2024-01-03")
    assert a[0]["is_current"] is False
    # the open version has null valid_to
    assert a[2]["valid_to"] is None and a[2]["is_current"] is True
    # entity b: one open version
    b = [r for (e, _), r in rows.items() if e == "b"]
    assert len(b) == 1 and b[0]["is_current"] is True
    # entity c: the all-null first version is KEPT (row_number guard),
    # closed by the bronze version
    c = sorted(
        (r for (e, _), r in rows.items() if e == "c"),
        key=lambda r: (r["valid_from"],),
    )
    assert [r["status"] for r in c] == [None, "bronze"]
    assert str(c[0]["valid_to"]).startswith("2024-01-02")


def test_scd2_no_collapse_keeps_restatements(spark):
    dim = scd2_from_changelog(
        _changelog(spark),
        key="entity",
        ts_col="ts",
        attrs=["status"],
        collapse=False,
    )
    assert dim.filter(F.col("entity") == "a").count() == 5


def test_scd2_roundtrips_through_asof_enrich(spark):
    """Facts as-of-joined against the built SCD2 (keyed on valid_from)
    land in exactly the version whose [valid_from, valid_to) interval
    contains them — the producer and consumer agree."""
    dim = scd2_from_changelog(
        _changelog(spark), key="entity", ts_col="ts", attrs=["status"]
    )
    facts = values_dim(
        spark,
        [
            ("a", "2024-01-02 12:00:00"),  # inside bronze (restated run)
            ("a", "2024-01-04 23:59:59"),  # inside silver
            ("a", "2024-01-05 00:00:00"),  # exactly at gold's start
            ("a", "2023-12-31 00:00:00"),  # before any version -> null
            ("b", "2024-02-01 00:00:00"),  # open version
        ],
        f"entity string, {TS}",
    )
    versioned = dim.select("entity", "valid_from", "status")
    e = asof_enrich(
        facts,
        versioned,
        on="entity",
        ts_col="ts",
        dim_ts_col="valid_from",
    )
    got = [
        r["status"]
        for r in e.orderBy("entity", "ts").collect()
    ]
    assert got == [None, "bronze", "silver", "gold", "silver"]


def _docs(spark):
    rows = [
        (1, "the the the cat", "s1"),
        (2, "the dog", "s1"),
        (3, "zebra quark", "s2"),
        (4, "", "s2"),  # token-less: drops out of scoring
    ]
    return values_dim(
        spark, rows, "doc_id int, text string, source string"
    )


def test_top_vocab_deterministic_cut(spark):
    v = top_vocab(_docs(spark), "text", 2).collect()
    # counts: the=4, cat=1, dog=1, quark=1, zebra=1 -> tie at the cut
    # resolves by token ascending: cat wins
    assert [(r["token"], r["cnt"]) for r in v] == [("the", 4), ("cat", 1)]


def test_surprisal_integer_bits_and_oov_floor(spark):
    # T = 8 tokens -> bitlen(T) = 4
    # vocab_size=1 -> only 'the' (cnt 4, bitlen 3) in vocab
    per_doc = {
        r["doc_id"]: r
        for r in surprisal_score(
            _docs(spark),
            id_cols=["doc_id", "source"],
            text_col="text",
            vocab_size=1,
        ).collect()
    }
    # doc 1: the(1) the(1) the(1) cat(OOV: 4-1=3) = 6 bits / 4 tokens
    assert per_doc[1]["n_tokens"] == 4 and per_doc[1]["sum_bits"] == 6
    # doc 3: two OOV tokens -> 3 + 3
    assert per_doc[3]["sum_bits"] == 6
    # token-less doc 4 has no row
    assert 4 not in per_doc


def test_grouped_topk_matches_naive_window(spark):
    # deterministic synthetic: 3 groups x 200 rows, scores with ties
    base = spark.range(600).select(
        (F.col("id") % 3).alias("g"),
        F.col("id").alias("rid"),
        F.pmod(F.col("id") * 37 + 11, F.lit(101)).alias("score"),
    )
    # spread over several partitions so the local phase actually runs
    base = base.repartition(7)
    got = grouped_topk(
        base,
        group_cols=["g"],
        order_struct=F.struct(
            (-F.col("score")).alias("_neg"), F.col("rid").alias("rid")
        ),
        k=5,
    )
    w = Window.partitionBy("g").orderBy(F.col("score").desc(), "rid")
    want = (
        base.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("g", "rid", "score", "rank")
    )
    got_set = {
        (r["g"], r["rid"], -r["_neg"], r["rank"]) for r in got.collect()
    }
    want_set = {
        (r["g"], r["rid"], r["score"], r["rank"]) for r in want.collect()
    }
    assert got_set == want_set


def test_grouped_topk_plan_has_no_raw_window(spark):
    """The window must run over the bounded candidate set: the plan's
    Window node input is the partial-aggregated local-top-k explode
    (spark_partition_id grouping), never the raw table."""
    base = spark.range(100).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("rid")
    )
    plan = grouped_topk(
        base,
        group_cols=["g"],
        order_struct=F.struct(F.col("rid").alias("rid")),
        k=3,
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "SPARK_PARTITION_ID" in plan.upper()
    # the aggregate (local top-k) sits BELOW the window in the tree
    assert plan.upper().index("WINDOW") < plan.upper().index(
        "SPARK_PARTITION_ID"
    )


def test_tfidf_topk_small(spark):
    docs = values_dim(
        spark,
        [
            (1, "cat cat cat dog"),
            (2, "cat dog dog"),
            (3, "fish"),
        ],
        "doc_id int, text string",
    )
    rows = {
        (r["term"], r["rnk"]): r
        for r in tfidf_topk(
            docs, id_col="doc_id", text_col="text", terms=["cat", "fish"], k=2
        ).collect()
    }
    assert rows[("cat", 1)]["doc_id"] == 1 and rows[("cat", 1)]["tf"] == 3
    assert rows[("cat", 2)]["doc_id"] == 2
    assert rows[("fish", 1)]["df"] == 1
    # idf for fish: ln(4/2)+1; tf=1
    import math

    assert abs(
        rows[("fish", 1)]["tfidf"] - round(math.log(4 / 2) + 1, 6)
    ) < 1e-9
