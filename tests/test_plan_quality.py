"""Physical-plan assertions: the 100 TB contract.

Correctness tests prove the answers match; these prove the PLANS are
the ones that survive a 1000-executor cluster — broadcast joins where a
dim is small, parquet column pruning / predicate pushdown reaching the
scan, no Python evaluation nodes in JVM-only pipelines, partial (map-
side) aggregation before every shuffle.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from fluent_plugin_record_reformer_spark.sources.tables import load_table  # noqa: E402

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pipeline_e2e_broadcasts_dim_no_python(spark):
    plan = _plan(entrymod.q_pipeline_e2e(spark, SF))
    assert "BroadcastHashJoin" in plan, "role dim must broadcast, never shuffle"
    assert "SortMergeJoin" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, f"JVM-only pipeline contains Python node {node}"


def test_pipeline_e2e_partial_aggregation(spark):
    plan = _plan(entrymod.q_pipeline_e2e(spark, SF))
    assert plan.count("HashAggregate") >= 2, "need map-side partial agg before shuffle"


def test_reform_has_no_python_nodes(spark):
    # the reform spec compiles to pure Column exprs — the tag_prefix
    # HOFs are CodegenFallback islands but there must be NO Python
    # evaluation anywhere (AQE hides WholeStageCodegen markers until
    # the final plan, so we assert the absence of the bad nodes)
    plan = _plan(entrymod.q_reform_flagship(spark, SF))
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_column_pruning_reaches_scan(spark):
    # quality_score touches only doc_id + text; lang/source/n_chars must
    # not be read from parquet
    plan = _plan(entrymod.q_quality_score(spark, SF))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, "no parquet scan found"
    line = read_schema[0]
    assert "text" in line and "doc_id" in line
    assert "lang" not in line and "source" not in line


def test_predicate_pushdown_reaches_scan(spark):
    df = load_table(spark, SF, "documents").filter(F.col("doc_id") < 10).select("doc_id")
    plan = _plan(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "LessThan(doc_id,10)" in pushed[0]


def test_knn_broadcasts_queries(spark):
    plan = _plan(entrymod.q_knn_brute(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # 3 query vectors broadcast against the scan — never a shuffle join
    assert "SortMergeJoin" not in plan


def test_salted_agg_is_two_phase(spark):
    plan = _plan(entrymod.q_salted_agg(spark, SF))
    # salt phase + unsalt phase, each with partial+final HashAggregate
    assert plan.count("HashAggregate") >= 4


def test_route_fanout_single_case_expression(spark):
    # routing must be ONE projection pass (CASE), not N filtered scans
    plan = _plan(entrymod.q_route_fanout(spark, SF))
    assert plan.count("FileScan") == 1


def test_exact_dedup_partial_agg(spark):
    plan = _plan(entrymod.q_dedup_exact(spark, SF))
    assert plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan


def test_minhash_single_tokenize_no_join_back(spark):
    # the exploded-hash design tokenizes ONCE and carries the shingle
    # hash sets through the band pair-gen: exactly one tokenizer site,
    # exactly one scan of documents (no jaccard join back to the text)
    df = entrymod.q_minhash_lsh_pairs(spark, SF)
    plan = _plan(df)
    assert plan.count("regexp_extract_all") == 1, (
        "documents tokenized more than once — sets no longer carried"
    )
    assert plan.count("FileScan") == 1, "jaccard re-joined the doc table"
    # the per-doc signature re-agg must be partially aggregated
    assert plan.count("HashAggregate") + plan.count("ObjectHashAggregate") >= 2


def test_simhash_exploded_codegen_shape(spark):
    # md5 must run as a codegen'd scalar post-explode (one Generate
    # node), not inside an interpreted array HOF: no `transform(`/
    # `aggregate(` lambda wrapping md5 in the plan
    plan = _plan(entrymod.q_simhash(spark, SF))
    assert "Generate explode" in plan or "Generate posexplode" in plan
    assert "transform(" not in plan.replace("regexp_extract_all", "")
    assert plan.count("FileScan") == 1

def test_embed_near_dup_single_scan_no_joinback(spark):
    # (id, vec) structs are CARRIED through the bucket collect_list, so
    # the exact-cosine re-rank needs no join back to the vector table:
    # exactly one scan, zero joins (VERDICT r2 #4)
    plan = _plan(entrymod.q_embed_near_dup(spark, SF))
    assert plan.count("FileScan") == 1, "re-rank re-joined the vector table"
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert node not in plan, node


def test_decontaminate_broadcasts_benchmark(spark):
    # the benchmark hash set must broadcast — a shuffle join would
    # move the full doc-side exploded hashes at 100 TB
    plan = _plan(entrymod.q_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_weighted_sample_pure_predicate(spark):
    # the gate is ONE codegen'd filter on the scan side: no Python
    # nodes, no join, no window
    plan = _plan(entrymod.q_weighted_sample(spark, SF))
    for node in ("BatchEvalPython", "ArrowEvalPython", "SortMergeJoin", "Window"):
        assert node not in plan, node


def test_pack_sequences_no_per_source_window(spark):
    # Scale contract (VERDICT r2 #3): the running sum must NEVER funnel
    # an entire source through one window task. Every window over the
    # doc-sized data must be partitioned by (source, _chunk); the only
    # source-alone window allowed is the tiny per-chunk offsets frame
    # (n_groups x chunks rows), recognizable by its _ctot aggregate.
    plan = _plan(entrymod.q_pack_sequences(spark, SF))
    assert "rangepartitioning" in plan  # order-monotone chunking present
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, "expected running-sum windows in the plan"
    for spec in specs:
        # local running sum partitions by (source, _chunk); the tiny
        # offsets window partitions by source but ORDERS by _chunk —
        # either way _chunk appears. A spec without _chunk would be a
        # whole-source single-task window.
        assert "_chunk" in spec, f"source-only window over full data: {spec}"


def test_gap_quantiles_chunked_ranks(spark):
    # exact_quantiles must rank chunked (VERDICT r2 #3): range
    # partitioning present, and every window spec carries _chunk (as
    # partition key for local row_number, as order key for the tiny
    # offsets window) — never a whole-group single-task sort
    plan = _plan(entrymod.q_gap_quantiles(spark, SF))
    assert "rangepartitioning" in plan
    import re

    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    for spec in specs:
        if spec.startswith(("conv_id", "user_id")):
            continue  # the transcript-derivation and gap-lag windows key
            # on user_id/conv_id — millions of keys, naturally parallel;
            # the scale hazard is only a window keyed by the few-valued
            # quantile GROUP (role)
        assert "_chunk" in spec, f"whole-group window: {spec}"


def test_ivf_assign_no_vecid_window(spark):
    # nprobe=1 assignment — inverted-list building AND every k-means
    # training iteration — must be the partial-aggregating groupBy
    # argmax, never a window shuffling+sorting the |V|x|C| scored
    # cross product by vector id (VERDICT r3 #1). Windows keyed by
    # query_id (probes, final top-k) are fine: the query side is tiny.
    plan = _plan(entrymod.q_knn_ivf(spark, SF))
    assert "windowspecdefinition(vec_id" not in plan, (
        "IVF assignment shuffles+sorts the scored cross product by vec_id"
    )
    # trained centroids arrive as a LocalRelation literal: nothing is
    # persisted (r3 leak) and the broadcast build costs zero scans
    assert "InMemoryTableScan" not in plan


def test_reform_affix_is_codegen_substring_index(spark):
    # tag_prefix/tag_suffix compile to ONE substring_index each —
    # never the O(n^2) per-row affix array (transform over
    # sequence + array_join of slices, all CodegenFallback) that
    # dominated e2e wall time before r4
    plan = _plan(entrymod.q_reform_flagship(spark, SF))
    assert "substring_index" in plan
    for node in ("array_join", "sequence(1"):
        assert node not in plan, f"interpreted affix array is back: {node}"


def test_ivf_assign_rejects_null_centroid_vectors(spark):
    import pytest
    from fluent_plugin_record_reformer_spark.operators.similarity import (
        ivf_assign,
    )

    cents = spark.createDataFrame(
        [(0, None), (1, [1.0, 0.0])],
        "centroid_id int, centroid_vec array<float>",
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id int, embedding array<float>"
    )
    with pytest.raises(ValueError, match="non-null"):
        ivf_assign(vecs, cents)


def test_runtime_bloom_filter_injects_on_selective_join(spark, tmp_path):
    """The session leaves Spark's runtime bloom-filter injection ON
    (default thresholds: creation side <= 10 MiB, application-side
    scan >= 10 GiB — i.e. it engages exactly on the 100 TB shapes this
    engine targets). This test lowers the application-side threshold
    to our test scale and pins that a selective dim filter injects
    bloom_filter semi-join reduction into the fact scan of a SHUFFLE
    join — the runtime analog of the broadcast pushdown the engine
    pins elsewhere."""
    fdir, ddir = str(tmp_path / "facts"), str(tmp_path / "dim")
    spark.range(200_000).selectExpr(
        "id % 1000 AS k", "id AS v"
    ).write.parquet(fdir)
    spark.range(1000).selectExpr(
        "id AS k", "id % 7 AS cat"
    ).write.parquet(ddir)
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    try:
        facts = spark.read.parquet(fdir)
        dim = spark.read.parquet(ddir).filter("cat = 3")  # selective
        j = facts.join(dim, "k")
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan
        # and the filtered join still returns the right rows
        assert j.count() == facts.join(
            spark.read.parquet(ddir).filter("cat = 3"), "k"
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "10GB",
        )


# r6 (verdict #3): the net now covers EVERY registry query, not a
# hand-kept list — any future query picks up the exclusions
# automatically. Known-by-design exceptions are explicit per query so
# a NEW occurrence of the pattern anywhere else still fails:
#
# - BroadcastNestedLoopJoin: brute-force similarity scoring joins a
#   big side against a broadcast FEW-ROW frame with no equi-key (the
#   k query vectors in knn_brute/knn_ivf; the single-row corpus-N
#   aggregate in tfidf/doc_surprisal's IDF/surprisal scalar
#   subquery). A BNLJ whose build side is k rows IS the intended
#   plan; there is no key to hash on.
# - SortAggregate: min(string)/min_by(string, ...) have no mutable
#   fixed-width aggregation buffer in Spark, so the planner must
#   sort-aggregate (scd2_dim's min(event_type) status;
#   curation_e2e's exact-dedup keeper min_by(source, doc_id)). The
#   sort is per-exchange-side and spillable; documented cost, not a
#   silent fallback.
ALLOWED = {
    "knn_brute": {"BroadcastNestedLoopJoin"},
    "knn_ivf": {"BroadcastNestedLoopJoin"},
    "tfidf": {"BroadcastNestedLoopJoin"},
    "doc_surprisal": {"BroadcastNestedLoopJoin"},
    "scd2_dim": {"SortAggregate"},
    "curation_e2e": {"SortAggregate"},
}

ALL_QUERIES = sorted(entrymod.QUERIES)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_plans_stay_jvm_side(spark, name):
    """Anti-pattern net over every registry query: no row-at-a-time
    Python (BatchEvalPython), no BroadcastNestedLoopJoin or
    CartesianProduct, no SortAggregate fallback (immutable-buffer
    trap) anywhere in the executed plan, except the per-query
    documented allowances above. ArrowEvalPython (the vectorized
    Python boundary) is permitted — python_expr/tag_expr/
    media_features are exactly that surface."""

    df = entrymod.queries()[name](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    allowed = ALLOWED.get(name, set())
    for pattern in (
        "BatchEvalPython",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
        "SortAggregate",
    ):
        if pattern not in allowed:
            assert pattern not in plan, f"{name}: {pattern}"


@pytest.mark.parametrize("name", ["tfidf", "inverted_index"])
def test_corpus_tf_subtree_tokenizes_once(spark, name):
    """r6 pin: the (term, doc) tf aggregate feeds two consumers (df /
    totals and the top-k branch); with the isNotNull alignment (and
    tfidf's fold-proof df aggregate) both share ONE canonical subtree,
    so the tokenize+explode pass appears exactly once in the AQE-final
    executed plan instead of once per consumer."""
    df = entrymod.queries()[name](spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    final = plan.split("Initial Plan")[0]
    assert final.count("regexp_extract_all") == 1, final.count(
        "regexp_extract_all"
    )
    assert "ReusedExchange" in final


def test_ip_enrich_no_distinct_aggregate(spark):
    """r6 pin: ip_enrich aggregates turns per conversation BEFORE the
    hash + range join, so the per-label conversation count is a plain
    row count — no count(distinct ...) (and its extra aggregate
    pass) may reappear in the plan."""
    df = entrymod.queries()["ip_enrich"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "distinct" not in plan.lower(), plan
