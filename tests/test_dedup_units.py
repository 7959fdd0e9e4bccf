"""Unit tests for dedup operators beyond the oracle gate: the
max_bucket flood cap and exact-dedup keeper semantics."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from fluent_plugin_record_reformer_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    lsh_candidate_pairs,
    minhash_lsh,
)


def _docs(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog every day") for i in range(20)]
    rows += [(100 + i, f"unique document number {i} about topic {i * 7} with words") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeper_is_min_id(spark):
    out = {r["text"]: (r["keep_id"], r["n_copies"]) for r in exact_dedup(_docs(spark)).collect()}
    flood = "the quick brown fox jumps over the lazy dog every day"
    assert out[flood] == (0, 20)
    assert all(n == 1 for t, (_, n) in out.items() if t != flood)


def test_max_bucket_caps_identical_doc_flood(spark):
    docs = _docs(spark)
    banded = minhash_lsh(docs)
    # uncapped: the 20 identical docs alone produce C(20,2)=190 pairs
    uncapped = lsh_candidate_pairs(banded).count()
    assert uncapped >= 190
    # capped at 8 members per bucket: the flood bucket is excluded
    capped = lsh_candidate_pairs(banded, max_bucket=8)
    flood_ids = set(range(20))
    got_pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert not any(a in flood_ids and b in flood_ids for a, b in got_pairs)


def test_kmv_null_values_ignored(spark):
    """NULL values must not enter the sketch on either engine (a null
    sorts first in DuckDB's list(DISTINCT) and would displace a real
    k-min); Spark estimate == estimate without nulls == DuckDB mirror."""
    import duckdb
    import pandas as pd

    from fluent_plugin_record_reformer_spark.operators.sketch import (
        kmv_distinct,
        kmv_oracle_sql,
    )

    rows = [("g1", str(i)) for i in range(300)] + [("g1", None)] * 5
    rows += [("g2", str(i)) for i in range(10)] + [("g2", None)]
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r["g"]: r["approx_distinct"] for r in kmv_distinct(df, "v", ["g"], k=64).collect()}
    no_nulls = {
        r["g"]: r["approx_distinct"]
        for r in kmv_distinct(df.filter(F.col("v").isNotNull()), "v", ["g"], k=64).collect()
    }
    assert got == no_nulls
    assert got["g2"] == 10  # degenerates to exact below k

    con = duckdb.connect()
    con.register("tbl", pd.DataFrame(rows, columns=["g", "v"]))
    want = dict(
        con.execute(kmv_oracle_sql("v", ["g"], "tbl", k=64)).fetchall()
    )
    assert got == want


def test_kmv_two_phase_merge_lossless(spark):
    """The two-phase merge must produce the SAME k-mins as a
    single-phase sketch on a high-cardinality group (every global
    k-min is a k-min of its own salt bucket)."""
    from fluent_plugin_record_reformer_spark.operators.sketch import (
        HASH_SPACE,
        kmv_distinct,
        kmv_hash,
    )

    df = spark.range(20000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    # merge_buckets=1 degenerates to the single-phase sketch
    single = {r["g"]: r["approx_distinct"] for r in
              kmv_distinct(df, "v", ["g"], k=64, merge_buckets=1).collect()}
    for buckets in (2, 16, 64, 1024):
        two = {r["g"]: r["approx_distinct"] for r in
               kmv_distinct(df, "v", ["g"], k=64, merge_buckets=buckets).collect()}
        assert two == single, f"merge_buckets={buckets}"
    # and the estimate is in the expected error band (~1/sqrt(k-2))
    for got in single.values():
        assert abs(got - 10000) / 10000 < 0.5


def test_dup_clusters_chain_and_islands(spark):
    """A chain a-b-c-d must collapse to one component (propagation
    runs to fixed point, not a fixed iteration count), islands keep
    their own label."""
    from fluent_plugin_record_reformer_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (4, 5), (5, 6)],
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
                   10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_exact_quantiles_matches_sorted_reference(spark):
    from fluent_plugin_record_reformer_spark.operators.aggregate import (
        exact_quantiles,
    )
    import math

    vals = [(("g1"), v) for v in [5, 1, 9, 3, 7, 2, 8, 4, 6, 10]]
    vals += [("g2", v) for v in [100, 300, 200]]
    vals += [("g2", None)]
    df = spark.createDataFrame(vals, "g string, x int")
    got = {r["g"]: (r["p50"], r["p90"], r["p99"]) for r in
           exact_quantiles(df, "x", ["g"], qs=(0.5, 0.9, 0.99)).collect()}

    def ref(xs):
        xs = sorted(xs)
        pick = lambda q: xs[math.ceil(q * len(xs)) - 1]
        return (pick(0.5), pick(0.9), pick(0.99))

    assert got["g1"] == ref(range(1, 11))
    assert got["g2"] == ref([100, 200, 300])  # nulls excluded


def test_dup_clusters_log_rounds_on_chain(spark):
    """Pointer jumping must converge in O(log d) rounds, not O(d):
    a 64-link chain needs <= ~8 rounds (plain propagation needs 64)."""
    from fluent_plugin_record_reformer_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a long, id_b long"
    )
    stats: dict = {}
    got = {r["doc_id"]: r["cluster_id"] for r in
           dup_clusters(pairs, stats=stats).collect()}
    assert got == {i: 0 for i in range(65)}
    assert stats["iterations"] <= 10, stats


def test_kmv_prefilter_bounds_state(spark):
    """The cardinality-adaptive pre-filter must cap per-group survivor
    counts near prefilter_factor*k regardless of group cardinality —
    the bounded-aggregation-state contract (VERDICT r2 #5). Recompute
    the survivor set exactly as kmv_distinct positions it."""
    from fluent_plugin_record_reformer_spark.operators.sketch import (
        HASH_SPACE,
        kmv_hash,
    )

    k, factor = 64, 8.0
    df = spark.range(200000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    hashed = df.select("g", kmv_hash("v").alias("_h"))
    est = hashed.groupBy("g").agg(F.approx_count_distinct("_h").alias("_dest"))
    thr = F.least(
        F.lit(float(HASH_SPACE)), F.lit(factor * k) * F.lit(HASH_SPACE) / F.col("_dest")
    ).cast("long")
    surv = (
        hashed.join(est.select("g", thr.alias("_thr")), "g")
        .filter(F.col("_h") < F.col("_thr"))
        .groupBy("g")
        .count()
        .collect()
    )
    for r in surv:
        # 100k distinct per group, but survivors stay ~factor*k; allow
        # 4x slack for HLL error + binomial spread
        assert r["count"] <= 4 * factor * k, r


def test_kmv_underflow_guard_falls_back_exactly(spark):
    """Force the exactness guard: prefilter_factor=0.25 keeps ~16 < k
    survivors, so every group must be recomputed via the salted path —
    and the result must STILL equal the default sketch bit-for-bit."""
    from fluent_plugin_record_reformer_spark.operators.sketch import kmv_distinct

    df = spark.range(20000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    normal = {r["g"]: r["approx_distinct"] for r in
              kmv_distinct(df, "v", ["g"], k=64).collect()}
    forced = {r["g"]: r["approx_distinct"] for r in
              kmv_distinct(df, "v", ["g"], k=64, prefilter_factor=0.25).collect()}
    assert forced == normal


def test_exact_quantiles_chunked_single_giant_group(spark):
    """One giant group with heavy ties straddling chunk boundaries: the
    chunked rank layout must return the same quantile VALUES as a
    local sorted reference (tie-run permutations can't change values),
    and must spread the group across >1 range chunk."""
    from fluent_plugin_record_reformer_spark.operators.aggregate import (
        exact_quantiles,
    )

    n = 50_000
    df = spark.range(n).select(
        F.lit("g").alias("g"), (F.col("id") % 101).cast("double").alias("x")
    )
    got = exact_quantiles(df, "x", ["g"], qs=(0.5, 0.9, 0.99)).collect()[0]
    xs = sorted([float(i % 101) for i in range(n)])
    import math

    for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        assert got[name] == xs[math.ceil(q * n) - 1], name
    spans = (
        df.repartitionByRange(8, F.col("g"), F.col("x"))
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert spans > 1


def test_kmv_construction_is_lazy(spark):
    """VERDICT r3 #3: kmv_distinct must run ZERO jobs at construction —
    the exactness guard lives in the lazy plan (broadcast-flagged
    leftsemi redo branch, unconditional union), not behind an eager
    driver-side probe that executed the full aggregation once and let
    the uncached result recompute it on action."""
    from fluent_plugin_record_reformer_spark.operators.sketch import kmv_distinct

    df = spark.range(5000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    sc = spark.sparkContext
    sc.setJobGroup("kmv-lazy-probe", "construction must not run jobs")
    try:
        out = kmv_distinct(df, "v", ["g"], k=64)
        jobs = sc.statusTracker().getJobIdsForGroup("kmv-lazy-probe")
        assert list(jobs) == [], f"construction ran Spark jobs: {jobs}"
    finally:
        sc.setJobGroup(None, None)
    # and the frame still evaluates correctly afterwards
    got = {r["g"]: r["approx_distinct"] for r in out.collect()}
    assert set(got) == {"0", "1"}


def test_dup_clusters_reliable_checkpoint_dir(spark, tmp_path):
    """VERDICT r3 #9: with checkpoint_dir the per-round truncation
    uses reliable checkpoint() into that directory (cluster-safe) and
    labels are identical to the localCheckpoint default."""
    from fluent_plugin_record_reformer_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (4, 5)],
        "id_a long, id_b long",
    )
    base = {
        (r["doc_id"], r["cluster_id"]) for r in dup_clusters(pairs).collect()
    }
    ckdir = str(tmp_path / "cc-ckpt")
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in dup_clusters(pairs, checkpoint_dir=ckdir).collect()
    }
    assert got == base
    import os

    assert any(os.scandir(ckdir)), "no reliable checkpoint files written"


def test_prefix_jaccard_equals_naive_all_pairs(spark):
    from pyspark.sql import functions as F
    from fluent_plugin_record_reformer_spark.operators.dedup import (
        _exploded_shingles,
        _hash60,
        prefix_jaccard_pairs,
    )

    # deterministic corpus with heavy vocab overlap so pairs straddle
    # the threshold boundary from both sides
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rows = []
    for i in range(40):
        toks = [words[(i * 3 + j * (1 + i % 4)) % len(words)] for j in range(6 + i % 5)]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = prefix_jaccard_pairs(docs, shingle_n=2, threshold_pct=40)

    sets = (
        _exploded_shingles(docs, text_col="text", id_col="doc_id", shingle_n=2)
        .select("doc_id", _hash60(F.col("_s")).alias("_h"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_set("_h").alias("s"))
    )
    a = sets.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sets.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("long")
    union = (F.size("sa") + F.size("sb")).cast("long") - inter
    naive = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            inter.alias("inter_size"), union.alias("union_size"),
        )
        .filter(F.lit(100) * F.col("inter_size") >= F.lit(40) * F.col("union_size"))
    )
    gs = sorted(tuple(r) for r in got.collect())
    ns = sorted(tuple(r) for r in naive.collect())
    assert gs == ns and len(ns) > 3  # exact: no false negatives, none extra


def test_prefix_jaccard_validation(spark):
    from fluent_plugin_record_reformer_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    import pytest

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    for bad in (0, 101):
        with pytest.raises(ValueError):
            prefix_jaccard_pairs(docs, threshold_pct=bad)


# ---------------------------------------------------------------------------
# edit1_pairs: symmetric-deletion exact edit-distance-1 join
# ---------------------------------------------------------------------------

from fluent_plugin_record_reformer_spark.operators.dedup import (  # noqa: E402
    edit1_pairs,
)


def test_edit1_pairs_equals_naive(spark):
    words = [
        "kitten", "sitten",        # substitution
        "cat", "cats",             # insertion at end
        "cat", "at",               # deletion at front
        "flaw", "flaws", "claw",   # chain: multiple partners
        "hello", "hxllo", "hell",
        "aa", "a",                 # duplicate-variant collapse (aa->a twice)
        "totally-unrelated-string",
        "", "x",                   # empty string: ed("", "x") == 1
    ]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = sorted(
        (r["str_a"], r["str_b"], r["dist"])
        for r in edit1_pairs(df, str_col="s").collect()
    )
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    uniq = sorted(set(words))
    want = sorted(
        (a, b, lev(a, b))
        for a, b in itertools.combinations(uniq, 2)
        if lev(a, b) <= 1
    )
    assert got == want
    assert ("a", "aa", 1) in got
    assert ("", "x", 1) in got


def test_edit1_pairs_max_bucket_caps_flood(spark):
    # ten strings all one deletion away from "x" share bucket "" → cap
    words = [f"{c}" for c in "abcdefghij"]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    assert edit1_pairs(df, str_col="s").count() == 45
    assert edit1_pairs(df, str_col="s", max_bucket=5).count() == 0


def test_edit1_pairs_no_python_in_plan(spark):
    df = spark.createDataFrame([("ab",), ("ac",)], "s string")
    plan = (
        edit1_pairs(df, str_col="s")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# lsh_incremental_near_dup
# ---------------------------------------------------------------------------

from fluent_plugin_record_reformer_spark.operators.dedup import (  # noqa: E402
    lsh_incremental_near_dup,
    lsh_near_dup,
)


def test_incremental_equals_cross_side_slice_of_full(spark):
    """Cross-boundary pairs must be EXACTLY the full self-join's pairs
    restricted to (new, old) — nothing lost, nothing intra-side."""
    base = "the quick brown fox jumps over the lazy dog "
    docs = [
        (i, base * 3 + f"tail {i % 4}") for i in range(20)
    ]  # heavy overlap → plenty of bucket collisions
    df = spark.createDataFrame(docs, "doc_id long, text string")
    corpus = df.filter("doc_id % 2 = 1")
    batch = df.filter("doc_id % 2 = 0")
    inc = {
        (r["id_new"], r["id_old"]): r["jaccard"]
        for r in lsh_incremental_near_dup(
            corpus, batch, num_hashes=16, bands=4, shingle_n=3
        ).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in lsh_near_dup(df, num_hashes=16, bands=4, shingle_n=3).collect()
    }
    want = {}
    for (a, b), j in full.items():
        if a % 2 == 0 and b % 2 == 1:
            want[(a, b)] = j
        elif b % 2 == 0 and a % 2 == 1:
            want[(b, a)] = j
    assert inc == want
    assert want, "fixture must produce cross pairs"
    assert all(n % 2 == 0 and o % 2 == 1 for n, o in inc)


def test_incremental_max_bucket_counts_total_membership(spark):
    docs = [(i, "identical text for every doc") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    corpus, batch = df.filter("doc_id < 5"), df.filter("doc_id >= 5")
    # every doc in one bucket per band: total membership 10 > cap 8
    assert (
        lsh_incremental_near_dup(corpus, batch, max_bucket=8).count() == 0
    )
    assert lsh_incremental_near_dup(corpus, batch).count() == 25
