"""pagerank / cooccurrence_edges semantics (cross-engine parity is the
`textrank` entry-oracle test; these pin hand-computable values and
the determinism contract)."""

import pytest
from pyspark.sql import functions as F

from fluent_plugin_record_reformer_spark.functions.text import word_tokens
from fluent_plugin_record_reformer_spark.operators.graph import (
    cooccurrence_edges,
    pagerank,
)


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_pagerank_two_cycle_hand_computed(spark):
    # a <-> b, unit weights, scale 1000, d=50: base = 500
    # r0 = 1000 each; each iteration r = 500 + 50*(peer, all weight) //100
    # r1 = 500 + 50*1000//100 = 1000 (fixed point immediately)
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1)], "src string, dst string, weight int"
    )
    got = _ranks(
        pagerank(edges, iterations=3, damping_pct=50, scale=1000)
    )
    assert got == {"a": 1000, "b": 1000}


def test_pagerank_star_center_accumulates(spark):
    # undirected star: center c with leaves l1..l3 (symmetric edges)
    rows = []
    for leaf in ["l1", "l2", "l3"]:
        rows += [("c", leaf, 1), (leaf, "c", 1)]
    edges = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = _ranks(pagerank(edges, iterations=1, damping_pct=85, scale=10000))
    # leaves send their whole mass to c: r(c) = 1500 + 85*30000//100
    # each leaf receives c's mass/3: 1500 + 85*(10000//3)//100
    assert got["c"] == 1500 + 85 * 30000 // 100
    assert got["l1"] == got["l2"] == got["l3"] == 1500 + 85 * (10000 // 3) // 100
    assert got["c"] > got["l1"]


def test_pagerank_no_incoming_gets_base(spark):
    edges = spark.createDataFrame(
        [("a", "b", 2)], "src string, dst string, weight int"
    )
    got = _ranks(pagerank(edges, iterations=2, damping_pct=85, scale=10000))
    assert got["a"] == 1500  # nothing points at a


def test_pagerank_partitioning_invariant(spark):
    rows = [(f"n{i}", f"n{(i * 7 + 3) % 23}", (i % 5) + 1) for i in range(200)]
    edges = spark.createDataFrame(rows, "src string, dst string, weight int")
    a = _ranks(pagerank(edges, iterations=3))
    b = _ranks(pagerank(edges.repartition(13), iterations=3))
    assert a == b  # integer fixed-point: bit-identical under reshuffle


def test_pagerank_validation(spark):
    e = spark.createDataFrame([("a", "b", 1)], "src string, dst string, weight int")
    with pytest.raises(ValueError):
        pagerank(e, iterations=0)
    with pytest.raises(ValueError):
        pagerank(e, iterations=1, damping_pct=100)


def test_cooccurrence_edges_symmetric_no_selfloops(spark):
    docs = spark.createDataFrame(
        [("a b a b",), ("b b",), ("solo",)], "text string"
    )
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in cooccurrence_edges(
            docs, text_col="text", tokenize=word_tokens
        ).collect()
    }
    # "a b a b": pairs (a,b),(b,a),(a,b) -> symmetric weight 3 each way;
    # "b b" is a self-loop (dropped); "solo" has no pairs
    assert got == {("a", "b"): 3, ("b", "a"): 3}


def test_pagerank_rejects_nonpositive_weights_in_plan(spark):
    # a zero out-weight would NULL `rank * w div wt` and silently
    # vanish that node's rank mass — the in-plan guard must throw
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    bad = spark.createDataFrame(
        [("a", "b", 0), ("b", "a", 1)], "src string, dst string, weight int"
    )
    with pytest.raises(Exception) as ei:
        pagerank(bad, iterations=1).collect()
    assert "weight" in str(ei.value)
    null_w = spark.createDataFrame(
        [("a", "b", None), ("b", "a", 1)],
        "src string, dst string, weight int",
    )
    with pytest.raises(Exception) as ei2:
        pagerank(null_w, iterations=1).collect()
    assert "weight" in str(ei2.value)


def test_pagerank_window_outweight_matches_joined_agg(spark):
    # r6: per-source total out-weight moved from groupBy+self-join to a
    # window sum over src (one edge-frame build, reused by every
    # iteration). int64 sums are order-free, so the two constructions
    # must be BIT-identical — this is the old construction, inlined,
    # as the oracle.
    edges = spark.createDataFrame(
        [
            ("a", "b", 3), ("a", "c", 1), ("b", "a", 2), ("c", "a", 5),
            ("c", "b", 1), ("d", "a", 7), ("b", "d", 1), ("d", "b", 2),
        ],
        "src string, dst string, weight int",
    )
    got = _ranks(pagerank(edges, iterations=3, damping_pct=85, scale=10_000))

    e = edges.select(
        F.col("src").alias("_src"),
        F.col("dst").alias("_dst"),
        F.col("weight").cast("long").alias("_w"),
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    wout = e.groupBy("_src").agg(F.sum("_w").alias("_wt"))
    ew = e.join(wout, on="_src")
    base = (10_000 * (100 - 85)) // 100
    ranks = nodes.select("node", F.lit(10_000).cast("long").alias("rank"))
    for _ in range(3):
        contrib = ew.join(
            ranks.withColumnRenamed("node", "_src"), on="_src"
        ).select(
            F.col("_dst").alias("node"), F.expr("rank * _w div _wt").alias("_c")
        )
        incoming = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        ranks = nodes.join(incoming, on="node", how="left").select(
            "node",
            (F.lit(base) + F.expr("85 * coalesce(_s, 0L) div 100")).alias("rank"),
        )
    want = _ranks(ranks)
    assert got == want


def test_pagerank_outweight_is_windowed_not_joined(spark):
    # plan pin for the r6 shape: the out-weight total must come from a
    # Window over _src (reused by every iteration), not a groupBy +
    # self-join that re-builds the edge frame with different pruning
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1)], "src string, dst string, weight int"
    )
    plan = pagerank(edges, iterations=1)._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(_src" in plan
