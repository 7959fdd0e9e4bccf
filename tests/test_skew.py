"""Skew-handling contract: a pathologically hot key (one conv_id owning
half the table) must (a) aggregate to exactly the plain-groupBy answer
through the salted two-phase path, and (b) actually spread across salt
buckets in phase 1 — the property that keeps one reducer from pinning
at 100 TB."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from fluent_plugin_record_reformer_spark.operators.aggregate import (  # noqa: E402
    salted_agg,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 50k rows for one hot conv + 50 cold convs x 1k rows
    hot = spark.range(50_000).select(
        F.lit("conv-HOT").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    cold = spark.range(50_000).select(
        F.concat(F.lit("conv-"), (F.col("id") % 50).cast("string")).alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        (F.col("id") % 89).cast("double").alias("value"),
    )
    return hot.unionByName(cold)


def test_salted_agg_equals_plain_on_hot_key(spark, skewed):
    got = salted_agg(
        skewed,
        ["conv_id"],
        {
            "n": ("count", ""),
            "sum_v": ("sum", "value"),
            "max_t": ("max", "turn_idx"),
            "min_t": ("min", "turn_idx"),
        },
        salt_buckets=16,
    )
    want = skewed.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("sum_v"),
        F.max("turn_idx").alias("max_t"),
        F.min("turn_idx").alias("min_t"),
    )
    g = {r["conv_id"]: (r["n"], r["sum_v"], r["max_t"], r["min_t"]) for r in got.collect()}
    w = {r["conv_id"]: (r["n"], r["sum_v"], r["max_t"], r["min_t"]) for r in want.collect()}
    assert g == w
    assert g["conv-HOT"][0] == 50_000


def test_hot_key_spreads_across_salt_buckets(spark, skewed):
    # phase-1 shape: the hot key must occupy (nearly) all salt buckets,
    # and no single (key, salt) group may hold more than ~2x its fair
    # share of the hot key's rows
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(16))
    phase1 = (
        skewed.filter(F.col("conv_id") == "conv-HOT")
        .withColumn("__salt", salt)
        .groupBy("__salt")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    sizes = {r["__salt"]: r["n"] for r in phase1}
    assert len(sizes) == 16, "hot key did not reach every salt bucket"
    fair = 50_000 / 16
    assert max(sizes.values()) < 2 * fair, f"salt skewed: {sizes}"


def test_salt_is_deterministic_across_runs(spark, skewed):
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(16))
    a = skewed.withColumn("s", salt).groupBy("s").count().collect()
    b = skewed.withColumn("s", salt).groupBy("s").count().collect()
    assert sorted((r["s"], r["count"]) for r in a) == sorted(
        (r["s"], r["count"]) for r in b
    )


def test_embedding_near_dup_flood_cap(spark):
    """Correlated embeddings all land in ONE sign-bit bucket; the cap
    must report the flood wholesale, not expand O(n^2) pairs."""
    import pyspark.sql.functions as F

    from fluent_plugin_record_reformer_spark.operators.similarity import (
        embedding_near_dup,
        recommended_planes,
    )

    # 30 identical flood vectors + 6 spread vectors
    flood = [(i, [1.0] * 8) for i in range(30)]
    spread = [(100 + i, [(-1.0) ** (i >> d) for d in range(8)]) for i in range(6)]
    df = spark.createDataFrame(flood + spread, "vec_id long, embedding array<double>")
    uncapped = embedding_near_dup(df, threshold=0.0, planes=8)
    got = uncapped.count()
    assert got >= 435  # C(30,2) flood pairs alone
    capped = embedding_near_dup(df, threshold=0.0, planes=8, max_bucket=10)
    flood_ids = set(range(30))
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert not any(a in flood_ids and b in flood_ids for a, b in pairs)


def test_recommended_planes_grows_with_n():
    from fluent_plugin_record_reformer_spark.operators.similarity import (
        recommended_planes,
    )

    assert recommended_planes(1_000) >= 4
    assert recommended_planes(1_000_000, target_bucket=64) == 14
    # 100 TB scale: ~10^12 vectors -> bucket size stays ~target
    p = recommended_planes(10**12, target_bucket=64)
    assert 10**12 / 2**p <= 64
    assert recommended_planes(10) == 4  # floor


def test_trained_ivf_recall_at_least_fixed_slice(spark):
    """Trained centroids must not lose recall vs the fixed id-slice
    quantizer, measured against brute-force ground truth."""
    import pyspark.sql.functions as F

    from fluent_plugin_record_reformer_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        train_kmeans_centroids,
    )
    from fluent_plugin_record_reformer_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    # queries must be DISJOINT from the id-slice seed: a query that IS
    # a fixed centroid probes its own perfectly-tailored list, which
    # makes the untrained quantizer look spuriously good
    queries = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 120)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    def topk_set(df):
        return {(r["query_id"], r["vec_id"]) for r in df.collect()}

    truth = topk_set(cosine_topk(emb, queries, k=5))
    fixed = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    trained = train_kmeans_centroids(emb, k=16, iters=2, dim=64)
    recall_fixed = len(topk_set(ivf_topk(emb, fixed, queries, k=5, nprobe=2)) & truth)
    recall_trained = len(topk_set(ivf_topk(emb, trained, queries, k=5, nprobe=2)) & truth)
    assert recall_trained >= recall_fixed, (recall_trained, recall_fixed)
    assert recall_trained > 0


def test_dup_clusters_mega_component_salted(spark):
    """One component holding ~90% of edges: the salted pointer-jump
    must yield IDENTICAL labels to the unsalted path (salting is pure
    replication + deterministic bucketing — never changes the min), and
    the probe side must actually spread across salt buckets."""
    from fluent_plugin_record_reformer_spark.operators.dedup import dup_clusters

    # mega chain component 0..900 (chain = worst diameter) + 10 small pairs
    mega = [(i, i + 1) for i in range(900)]
    small = [(10_000 + 2 * i, 10_001 + 2 * i) for i in range(10)]
    df = spark.createDataFrame(mega + small, "id_a long, id_b long")

    plain_stats, salted_stats = {}, {}
    plain = {
        (r["doc_id"], r["cluster_id"])
        for r in dup_clusters(df, stats=plain_stats).collect()
    }
    salted = {
        (r["doc_id"], r["cluster_id"])
        for r in dup_clusters(df, stats=salted_stats, label_salt=4).collect()
    }
    assert salted == plain
    # mega component labelled by its min; chain converges in log rounds
    assert all(c == 0 for v, c in plain if v <= 900)
    assert plain_stats["iterations"] <= 15
    # the salt really buckets: 901 vertices over 4 buckets, each nonempty
    buckets = (
        df.select(F.col("id_a").alias("_v"))
        .union(df.select("id_b"))
        .distinct()
        .select(F.pmod(F.xxhash64("_v"), F.lit(4)).alias("b"))
        .groupBy("b")
        .count()
    )
    assert buckets.count() == 4


def test_kmeans_empty_seed_raises_clear_error(spark):
    """An empty seed slice (no vector id < k) must raise a clear
    ValueError, not a VALUES-with-no-rows ParseException (ADVICE r4)."""
    import pytest as _pytest

    from fluent_plugin_record_reformer_spark.operators.similarity import (
        train_kmeans_centroids,
    )

    emb = spark.createDataFrame(
        [(100, [0.1] * 4), (101, [0.2] * 4)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="no centroids"):
        train_kmeans_centroids(emb, k=4, iters=1, dim=4)
