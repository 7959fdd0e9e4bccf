"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator of the engine (SURVEY.md §2)
run over the driver's testdata tables; ``oracle_sql()`` carries the
equivalent DuckDB SQL. Every computed column is aliased identically on
both sides (the driver sorts columns by name before value-hashing).

The transcript table required by BASELINE.json's input_hint
(conv_id, turn_idx, role, text, tool, ts) is derived DETERMINISTICALLY
from the ``events`` testdata table — pure column ops + one window —
so both engines reproduce it bit-for-bit (no external data).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluent_plugin_record_reformer_spark import ReformContext, TransformSpec, reform
from fluent_plugin_record_reformer_spark.functions import oracle_mirrors as om
from fluent_plugin_record_reformer_spark.functions.text import (
    language_id,
    language_id_oracle_sql,
    shingles,
    word_tokens,
)
from fluent_plugin_record_reformer_spark.operators.aggregate import (
    exact_quantiles_oracle_sql as agg_exact_quantiles_oracle_sql,
)
from fluent_plugin_record_reformer_spark.operators.aggregate import salted_agg
from fluent_plugin_record_reformer_spark.operators.curation import (
    pii_scrub_oracle_sql,
)
from fluent_plugin_record_reformer_spark.operators.dedup import (
    doc_fingerprints,
    lsh_near_dup,
    simhash_by_id,
)
from fluent_plugin_record_reformer_spark.operators.enrich import (
    enrich,
    role_dim,
    tool_dim,
)
from fluent_plugin_record_reformer_spark.operators.parse import grok_parse, regex_parse
from fluent_plugin_record_reformer_spark.operators.layout import sql_zvalue
from fluent_plugin_record_reformer_spark.operators.templates import (
    sql_template_expr,
)
from fluent_plugin_record_reformer_spark.operators.route import Route, RouteTable
from fluent_plugin_record_reformer_spark.operators.sketch import (
    bottomk_quantile_sketch,
    bottomk_quantile_sql,
    deterministic_sample,
    kmv_distinct,
    kmv_oracle_sql,
    reservoir_oracle_sql,
    sample_gate_sql,
    stratified_gate_sql,
    stratified_sample,
    weighted_gate_sql,
)
from fluent_plugin_record_reformer_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup,
    ivf_topk,
    signbit_ann_topk,
    train_kmeans_centroids,
)
from fluent_plugin_record_reformer_spark.sources.tables import load_table
from fluent_plugin_record_reformer_spark.sources.transcripts import (
    transcripts_from_events,
    with_tag,
)

HOSTNAME = "reformer-host"  # fixed so both engines agree (vs core.rb:82)

# ---------------------------------------------------------------------------
# Transcript derivation — shared CTE for every oracle (DuckDB dialect).
# Keep in sync with sources/transcripts.transcripts_from_events.
# ---------------------------------------------------------------------------
TRANSCRIPTS_CTE = """
WITH transcripts AS (
  SELECT
    printf('conv-%04d', user_id) AS conv_id,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
    CASE WHEN event_type IN ('click','view') THEN 'user'
         WHEN event_type IN ('purchase','signup') THEN 'assistant'
         ELSE 'system' END AS role,
    printf('event=%s value=%.2f props=%s', event_type, value, props) AS text,
    CASE WHEN event_type = 'purchase' THEN 'checkout'
         WHEN event_type = 'signup' THEN 'auth' ELSE NULL END AS tool,
    ts
  FROM events
), tagged AS (
  SELECT *, 'transcripts.' || role || '.' || coalesce(tool, 'none') AS tag
  FROM transcripts
)
"""


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts_from_events(load_table(spark, sf_dir, "events"))


def _tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_tag(_transcripts(spark, sf_dir))


# ---------------------------------------------------------------------------
# Queries
# ---------------------------------------------------------------------------


def q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + derive: the input table of the engine (input_hint shape)."""
    return _transcripts(spark, sf_dir)


def q_tag_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator #4: tag_parts / tag_prefix / tag_suffix placeholders
    (core.rb:86-88,163-180) compiled to array exprs."""
    from fluent_plugin_record_reformer_spark.plans.compiler import template_column

    df = _tagged(spark, sf_dir)
    ctx = ReformContext(hostname=HOSTNAME)
    cols = df.columns
    return df.select(
        "conv_id",
        "turn_idx",
        "tag",
        template_column("${tag_parts[-1]}", ctx, cols).alias("last_part"),
        template_column("${tag_prefix[1]}", ctx, cols).alias("prefix1"),
        template_column("${tag_suffix[-2]}", ctx, cols).alias("suffix2"),
    )


def q_reform_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operators #5,#6,#8,#9,#12: the README flagship spec — placeholder
    expansion, add fields, tag rewrite, remove_keys (README.md:23-58)."""
    spec = TransformSpec(
        tag="reformed.${tag_prefix[-2]}",
        record={
            "hostname": "${hostname}",
            "input_tag": "${tag}",
            "last_tag": "${tag_parts[-1]}",
            "message": "${record['text']}, yay!",
        },
        remove_keys=["text"],
    )
    out = reform(_tagged(spark, sf_dir), spec, ReformContext(hostname=HOSTNAME))
    return out.select(
        "conv_id", "turn_idx", "tag", "hostname", "input_tag", "last_tag", "message"
    )


def q_reform_renew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operators #8 renew_record + keep_keys + auto_typecast native
    passthrough (core.rb:136-137, tests :126-188,:459-511)."""
    spec = TransformSpec(
        tag="renewed.${tag_parts[0]}",
        renew_record=True,
        keep_keys=["conv_id", "turn_idx"],
        record={"idx_native": "${record['turn_idx']}", "who": "${record['role']}"},
        auto_typecast=True,
    )
    out = reform(_tagged(spark, sf_dir), spec, ReformContext(hostname=HOSTNAME))
    return out.select("tag", "conv_id", "turn_idx", "idx_native", "who")


def q_renew_time_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator #10: event time := record field as unix seconds, field
    removed afterwards (core.rb:106-109, CHANGELOG 0.8.3 ordering)."""
    df = _tagged(spark, sf_dir).withColumn(
        "epoch_shift", F.unix_timestamp("ts") + F.lit(3600)
    )
    spec = TransformSpec(
        tag="timeshift.${tag}",
        renew_time_key="epoch_shift",
        remove_keys=["epoch_shift", "text"],
    )
    out = reform(df, spec, ReformContext(hostname=HOSTNAME))
    return out.select("conv_id", "turn_idx", "tag", F.col("ts").alias("shifted_ts"))


def q_tag_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression-driven tag rewrite (core.rb:80 with enable_ruby): the
    OUTPUT TAG comes from a vectorized expression; rows where it
    evaluates to null are DROPPED (core.rb:105, test :568-578)."""
    spec = TransformSpec(
        tag_python_expr=(
            "('routed.' + tag_parts.str[-1]).mask(tag_parts.str[-1] == 'none')"
        ),
        remove_keys=["text"],
    )
    out = reform(_tagged(spark, sf_dir), spec, ReformContext(hostname=HOSTNAME))
    return out.select("conv_id", "turn_idx", "tag")


ROUTES = RouteTable(
    [
        Route("user_turns", "transcripts.user.**"),
        Route("assistant_auth", "transcripts.assistant.auth"),
        Route("assistant_rest", "transcripts.assistant.**"),
        Route("ops", "**"),
    ]
)


def q_route_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator #13: tag-glob routing, first match wins (core.rb:110 +
    fluentd match semantics); per-sink row counts."""
    routed = ROUTES.assign(_tagged(spark, sf_dir))
    return routed.groupBy("route").agg(F.count(F.lit(1)).alias("n_rows"))


def q_per_sink_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule aggregate: groupBy(route, conv bucket, role, tool,
    hour(ts)).count() — portable bucket so DuckDB reproduces it."""
    routed = ROUTES.assign(_tagged(spark, sf_dir))
    return routed.groupBy(
        "route",
        (F.substring("conv_id", 6, 4).cast("int") % 8).alias("conv_bucket"),
        "role",
        "tool",
        F.hour("ts").cast("int").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_turns"))


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase salted aggregation — must equal the plain
    GROUP BY oracle exactly (north rule: explicit salting)."""
    return salted_agg(
        _transcripts(spark, sf_dir),
        ["role"],
        {"n_turns": ("count", ""), "max_turn": ("max", "turn_idx")},
        salt_buckets=16,
    )


def q_grok_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse stage: grok %{WORD}/%{NUMBER}/%{GREEDYDATA} → typed fields,
    JVM-side regexp_extract (north rule: batched regex, no per-row
    Python)."""
    out = grok_parse(
        _transcripts(spark, sf_dir),
        "event=%{WORD:etype} value=%{NUMBER:val} props=%{GREEDYDATA:props_raw}",
        types={"val": "double"},
    )
    return out.select("conv_id", "turn_idx", "etype", "val", "props_raw")


def q_enrich_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich stage: broadcast lookup join against the role dictionary
    (generalizes ${hostname}, core.rb:82)."""
    out = enrich(_transcripts(spark, sf_dir), role_dim(spark), on="role")
    return out.groupBy("role", "role_kind", "role_rank").agg(
        F.count(F.lit(1)).alias("n_turns")
    )


def q_enrich_tools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich via the tool dictionary (left join keeps tool-less turns
    flowing with null enrichment — drop only ever happens on nil tag)."""
    out = enrich(_transcripts(spark, sf_dir), tool_dim(spark), on="tool")
    return out.groupBy("tool", "tool_family", "networked").agg(
        F.count(F.lit(1)).alias("n_turns")
    )


def q_python_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """enable_ruby analog (#7): vectorized restricted-Python field over
    Arrow batches (core.rb:252-343 → pandas_udf)."""
    spec = TransformSpec(
        tag="expr.${tag}",
        python_exprs={"text_len": "text.str.len()"},
    )
    out = reform(_tagged(spark, sf_dir), spec, ReformContext(hostname=HOSTNAME))
    return out.select(
        "conv_id", "turn_idx", F.col("text_len").cast("int").alias("text_len")
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic rollup on the raw events stream (scan → agg pushdown)."""
    ev = load_table(spark, sf_dir, "events", fanout=False)
    return ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel per user (strictly ordered
    timestamps) via the single-scan array-fold funnel operator
    (operators/aggregate.funnel_stages); the oracle reaches the same
    counts through the staged-min CTE formulation — the two are
    provably the same greedy."""
    from fluent_plugin_record_reformer_spark.operators.aggregate import (
        funnel_stages,
    )

    ev = load_table(spark, sf_dir, "events", fanout=False)
    return funnel_stages(ev, ["view", "click", "purchase"])


def q_sliding_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window event rates in batch: 6-hour windows every 3
    hours via ``F.window`` (size = 2x slide, so each event lands in
    exactly two windows — the oracle enumerates both by epoch
    arithmetic). The batch mirror of the streaming watermarked
    windowed counts; window boundaries are epoch-aligned in the UTC
    session on both engines."""
    ev = load_table(spark, sf_dir, "events", fanout=False)
    w = F.window("ts", "6 hours", "3 hours")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n_events",
        )
    )


def q_sink_top_talkers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch mirror of streaming/stateful.streaming_top_talkers (the
    pairing pattern of conv_sessions <-> the stateful sessionizer):
    per route, the top-3 keys by turn count — here (role, tool) as the
    talker key — with the streaming operator's exact (cnt desc, key
    asc) tiebreak. Window top-k over pre-aggregated per-route counts:
    the window input is one row per (route, key), never raw turns."""
    from pyspark.sql.window import Window

    routed = ROUTES.assign(_tagged(spark, sf_dir))
    counts = routed.groupBy(
        "route",
        F.concat_ws("/", "role", F.coalesce("tool", F.lit("none"))).alias("key"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("route").orderBy(F.desc("cnt"), F.asc("key"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("route", "key", "cnt", "rank")
    )


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup in ONE pass: Spark's
    ROLLUP (grouping sets) computes the (type, day, hour), (type, day),
    (type), and grand-total aggregate levels in a single shuffle —
    the continuous-aggregate ladder a time-series store materializes,
    here as one partial-aggregated plan. Level is indicated by the
    null pattern (the grouping columns themselves are never null)."""
    ev = load_table(spark, sf_dir, "events", fanout=False)
    d = ev.select(
        F.col("event_type").alias("etype"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.hour("ts").cast("int").alias("hour"),
        "value",
    )
    return d.rollup("etype", "day", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_val"),
    )


E2E_ROUTES = RouteTable(
    [
        Route("user_sink", "reformed.transcripts.user"),
        Route("assistant_sink", "reformed.transcripts.assistant"),
        Route("ops_sink", "**"),
    ]
)


def q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule headline: the FULL parse -> enrich -> reform -> route ->
    aggregate chain as one Catalyst plan. grok parse of text, broadcast
    role-dim join, placeholder reform + tag rewrite, glob routing on the
    rewritten tag, per-sink groupBy(count, sum) rollup."""
    parsed = grok_parse(
        _tagged(spark, sf_dir),
        "event=%{WORD:etype} value=%{NUMBER:val} props=%{GREEDYDATA:props_raw}",
        types={"val": "double"},
    )
    enriched = enrich(parsed, role_dim(spark), on="role")
    spec = TransformSpec(
        tag="reformed.${tag_prefix[-2]}",
        record={
            "hostname": "${hostname}",
            "message": "${record['etype']} by ${record['role_kind']}",
        },
        remove_keys=["text", "props_raw"],
    )
    out = reform(enriched, spec, ReformContext(hostname=HOSTNAME))
    routed = E2E_ROUTES.assign(out)
    return routed.groupBy(
        "route",
        "etype",
        "message",
        (F.substring("conv_id", 6, 4).cast("int") % 8).alias("conv_bucket"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.round(F.sum("val"), 2).alias("sum_val"),
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on full text; keeper = min doc_id."""
    docs = load_table(spark, sf_dir, "documents", fanout=False)
    return docs.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: whitespace tokens + BPE-ish regex tokens."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), 0)).alias(
            "n_bpe_tokens"
        ),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: length / punctuation / stopword ratio features."""
    docs = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_punct = F.size(F.regexp_extract_all("text", F.lit(r"[^\w\s]"), 0))
    n_words = F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+"), 0))
    n_stop = F.size(
        F.regexp_extract_all("text", F.lit(r"\b(the|and|of|to|a|in)\b"), 0)
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        F.round(n_punct.cast("double") / n_chars, 4).alias("punct_ratio"),
        F.round(n_stop.cast("double") / F.greatest(n_words, F.lit(1)), 4).alias(
            "stop_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Training-data-pipeline operators: dedup / similarity / text analysis
# ---------------------------------------------------------------------------

MINHASH_K, LSH_BANDS, SHINGLE_N = 16, 4, 3


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: MinHash(16) -> LSH(4 bands x 4 rows) bucket
    grouping -> exact shingle-hash Jaccard, sets carried through the
    band pair-gen (no join back to the text)."""
    docs = load_table(spark, sf_dir, "documents")
    return lsh_near_dup(
        docs, num_hashes=MINHASH_K, bands=LSH_BANDS, shingle_n=SHINGLE_N
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(16-bit) document fingerprints: codegen'd md5 per
    exploded token, 16 partial-aggregated vote sums per doc."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_by_id(docs, bits=16)


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: Rabin-Karp rolling hash over chars +
    winnowed min shingle digest (md5 codegen'd post-explode)."""
    docs = load_table(spark, sf_dir, "documents")
    return doc_fingerprints(docs, shingle_n=SHINGLE_N)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third near-dup scheme (next to MinHash-LSH and SimHash): block
    on the winnowed min-shingle fingerprint, exact n-gram Jaccard
    inside each block with shingle sets carried through the pair-gen —
    one scan, zero join-backs (operators/dedup.fingerprint_near_dup)."""
    from fluent_plugin_record_reformer_spark.operators.dedup import (
        fingerprint_near_dup,
    )

    docs = load_table(spark, sf_dir, "documents")
    return fingerprint_near_dup(
        docs, shingle_n=SHINGLE_N, threshold=0.0, max_bucket=64
    )


PREFIX_JACCARD_PCT = 50


def q_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-threshold Jaccard similarity join
    (operators/dedup.prefix_jaccard_pairs, the AllPairs/PPJoin prefix
    filter): every pair with distinct-shingle Jaccard >= 0.5, no false
    negatives — docs only meet in buckets keyed by their rarest-first
    prefix tokens. Because the candidate scheme is exact, the oracle
    is the NAIVE all-pairs Jaccard over the same sets: any missed or
    extra pair hash-fails."""
    from fluent_plugin_record_reformer_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return prefix_jaccard_pairs(
        docs, shingle_n=SHINGLE_N, threshold_pct=PREFIX_JACCARD_PCT
    )


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language-ID heuristic vs the labeled lang col."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", language_id(word_tokens("text")).alias("lang_pred")
    )


def _knn_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def q_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 per query vector (brute force baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, _knn_queries(spark, sf_dir), k=5)


def q_knn_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5: sign-bit hyperplane LSH bucket join + exact re-rank."""
    emb = load_table(spark, sf_dir, "embeddings")
    return signbit_ann_topk(emb, _knn_queries(spark, sf_dir), k=5, planes=6)


# ---------------------------------------------------------------------------
# Analytical join/agg breadth on the star-schema tables. Money sums go
# through DECIMAL so partial-aggregation order can't perturb doubles —
# both engines produce exact, identical totals.
# ---------------------------------------------------------------------------

DEC = "decimal(18,4)"


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped rollup: per (returnflag, linestatus) sums/avgs
    over filtered lineitem. Partial+final hash agg; filter pushed to
    the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01")
    )
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_quantity").cast(DEC)).cast("double"), 2).alias(
                "sum_qty"
            ),
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double"), 2
            ).alias("sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 2).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: segment customers x orders x lineitem, top-10
    orders by exact decimal revenue (broadcastable dims, ordered limit)."""
    cust = load_table(spark, sf_dir, "customer", fanout=False).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders", fanout=False)
    li = load_table(spark, sf_dir, "lineitem", fanout=False)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: region x nation x customer x orders x lineitem
    multi-join, revenue per nation — small dims broadcast up the chain."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_parse_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error containment: a grok pattern that only matches purchase/
    signup turns — non-matching rows yield NULL fields (never errors,
    never drops; core.rb:315-319 semantics) and the rollup counts them."""
    parsed = regex_parse(
        _transcripts(spark, sf_dir),
        r"event=(?P<petype>purchase|signup) value=(?P<pval>[+-]?\d+(?:\.\d+)?) .*",
        types={"pval": "decimal(18,2)"},
    )
    # sum_val_cents: the value sum crosses the oracle boundary as an
    # EXACT integer (decimal cents), never a rounded double — float
    # rendering/rounding can differ between engines' normalizers.
    return parsed.groupBy("role").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.count("petype").alias("n_parsed"),
        F.sum(F.when(F.col("petype").isNull(), 1).otherwise(0)).alias("n_failed"),
        (
            F.sum(F.coalesce(F.col("pval"), F.lit(0).cast("decimal(18,2)"))) * 100
        ).cast("long").alias("sum_val_cents"),
    )


def q_apache_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grok base-library breadth, oracle-gated end-to-end: construct
    combined-format access-log lines deterministically from the events
    table, parse them back with ``%{COMBINEDAPACHELOG}`` (the full
    public composite — IPORHOST/HTTPDATE/QS/...), and aggregate the
    PARSED fields. The oracle computes the same aggregates from the
    ORIGINAL columns (no regex), so any misparse — wrong group order,
    a pattern that over/under-matches — breaks the value hash."""
    from fluent_plugin_record_reformer_spark.operators.parse import grok_parse

    ev = load_table(spark, sf_dir, "events")
    verb = (
        F.when(F.col("event_type") == "view", "GET")
        .when(F.col("event_type") == "click", "POST")
        .when(F.col("event_type") == "purchase", "PUT")
        .when(F.col("event_type") == "signup", "DELETE")
        .otherwise("HEAD")
    )
    line = F.format_string(
        '10.%d.%d.%d - user%d [%s +0000] "%s /api/%s HTTP/1.1" %d %d '
        '"http://ref.example.com/" "bench-agent/1.0"',
        F.pmod(F.col("user_id"), F.lit(256)),
        F.pmod(F.col("event_id"), F.lit(256)),
        F.pmod(F.col("user_id") + F.col("event_id"), F.lit(256)),
        F.pmod(F.col("user_id"), F.lit(100)),
        F.date_format("ts", "dd/MMM/yyyy:HH:mm:ss"),
        verb,
        F.col("event_type"),
        (F.lit(200) + F.pmod(F.col("event_id"), F.lit(3)) * 100).cast("int"),
        F.pmod(F.col("event_id"), F.lit(5000)),
    )
    parsed = grok_parse(
        ev.select(line.alias("text")),
        "%{COMBINEDAPACHELOG}",
        types={"response": "int", "bytes": "long"},
        # 10 fields: single-pass evaluates the composite regex once per
        # row instead of 10x (the wide-pattern scale path; parity incl.
        # no-match lines pinned in test_single_pass_parity_*)
        single_pass=True,
    )
    # first_ts = the EARLIEST event (min over the PARSED timestamp, a
    # mutable long buffer -> HashAggregate at every level of the
    # countDistinct expand; min(string) buffers are immutable and
    # forced SortAggregate plans), re-rendered post-agg. Lexicographic
    # string-min would differ for day-first formats.
    agg = parsed.groupBy("verb", "response").agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.sum("bytes").alias("sum_bytes"),
        F.countDistinct("clientip").alias("n_ips"),
        F.min(
            F.try_to_timestamp(
                F.col("timestamp"), F.lit("dd/MMM/yyyy:HH:mm:ss Z")
            )
        ).alias("_min_ts"),
    )
    return agg.select(
        "verb", "response", "n_requests", "sum_bytes", "n_ips",
        F.concat(
            F.date_format("_min_ts", "dd/MMM/yyyy:HH:mm:ss"), F.lit(" +0000")
        ).alias("first_ts"),
    )


def q_syslog_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second oracle-gated grok composite (VERDICT r3 #7), mirroring
    ``apache_logs``' construct-then-parse-back design with the syslog
    family: build classic-timestamp syslog lines (optional
    ``<facility.priority>`` section on even event_ids) from the events
    table, parse with the full-line ``%{SYSLOGLINE}`` composite
    (SYSLOGBASE2 -> SYSLOGTIMESTAMP|TIMESTAMP_ISO8601 / SYSLOGFACILITY
    / SYSLOGHOST / SYSLOGPROG / GREEDYDATA), and aggregate the PARSED
    fields. The oracle recomputes every aggregate from the ORIGINAL
    columns, so a misparse in any sub-pattern breaks the value hash.
    ``n_iso`` (count of the ISO8601 alternation branch) must be 0 —
    proving the classic branch matched, not a lucky fallback."""
    from fluent_plugin_record_reformer_spark.operators.parse import grok_parse

    ev = load_table(spark, sf_dir, "events")
    fac = F.when(
        F.pmod(F.col("event_id"), F.lit(2)) == 0,
        F.format_string(
            "<%d.%d> ",
            F.pmod(F.col("event_id"), F.lit(24)),
            F.pmod(F.col("event_id"), F.lit(8)),
        ),
    ).otherwise("")
    line = F.format_string(
        "%s %shost%d svc-%s[%d]: user=%d action=%s",
        F.date_format("ts", "MMM d HH:mm:ss"),
        fac,
        F.pmod(F.col("user_id"), F.lit(50)),
        F.col("event_type"),
        (F.pmod(F.col("event_id"), F.lit(30000)) + 1).cast("int"),
        F.pmod(F.col("user_id"), F.lit(100)),
        F.col("event_type"),
    )
    parsed = grok_parse(
        ev.select(line.alias("text")),
        "%{SYSLOGLINE}",
        types={"pid": "long", "priority": "long"},
        single_pass=True,  # 8 fields -> one regex pass per row
    )
    # min over the parsed classic timestamp (year-less "MMM d" is
    # anchored to 1972, a LEAP year — anchoring to the 1970 default
    # would parse "Feb 29" lines to NULL and silently drop them from
    # the min; chronological ordering is preserved within one calendar
    # year, the inherent ambit of syslog timestamps), HashAggregate
    # instead of the immutable-string-buffer SortAggregate fallback
    agg = parsed.groupBy("program").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("logsource").alias("n_hosts"),
        F.countDistinct("message").alias("n_msgs"),
        F.min(
            F.try_to_timestamp(
                F.concat(F.lit("1972 "), F.col("timestamp")),
                F.lit("yyyy MMM d HH:mm:ss"),
            )
        ).alias("_min_ts"),
        F.sum("pid").alias("sum_pid"),
        F.count("facility").alias("n_fac"),
        F.sum("priority").alias("sum_prio"),
        F.count("timestamp8601").alias("n_iso"),
    )
    return agg.select(
        "program", "n_lines", "n_hosts", "n_msgs",
        F.date_format("_min_ts", "MMM d HH:mm:ss").alias("first_ts"),
        "sum_pid", "n_fac", "sum_prio", "n_iso",
    )


def q_rfc5424_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third construct-then-parse-back grok gate: RFC5424 structured
    syslog. Exercises the %{SYSLOG5424LINE} composite's ISO8601
    timestamp branch, nil ('-') field semantics (proc nulls on odd
    event_ids), the SD section alternation, and the single-pass
    extractor — all against an oracle recomputed from the ORIGINAL
    columns."""
    from fluent_plugin_record_reformer_spark.operators.parse import grok_parse

    ev = load_table(spark, sf_dir, "events")
    proc = F.when(
        F.pmod(F.col("event_id"), F.lit(2)) == 0,
        F.pmod(F.col("event_id"), F.lit(9999)).cast("string"),
    ).otherwise("-")
    sd = F.when(
        F.pmod(F.col("event_id"), F.lit(3)) == 0, F.lit('[m@1 i="3"]')
    ).otherwise("-")
    line = F.format_string(
        "<%d>1 %s host%d app-%s %s ID%d %s user=%d action=%s",
        F.pmod(F.col("event_id"), F.lit(192)),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.pmod(F.col("user_id"), F.lit(50)),
        F.col("event_type"),
        proc,
        F.pmod(F.col("event_id"), F.lit(100)),
        sd,
        F.pmod(F.col("user_id"), F.lit(100)),
        F.col("event_type"),
    )
    parsed = grok_parse(
        ev.select(line.alias("text")),
        "%{SYSLOG5424LINE}",
        types={"syslog5424_pri": "long"},
        single_pass=True,
    )
    agg = parsed.groupBy(F.col("syslog5424_app").alias("app")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("syslog5424_host").alias("n_hosts"),
        F.sum("syslog5424_pri").alias("sum_pri"),
        F.count("syslog5424_proc").alias("n_proc"),
        F.sum(F.when(F.col("syslog5424_sd") != "-", 1).otherwise(0)).alias("n_sd"),
        # parsed-timestamp min: hash-aggregatable long buffer
        F.min(
            F.try_to_timestamp(
                F.col("syslog5424_ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'")
            )
        ).alias("_min_ts"),
        F.count("syslog5424_msg").alias("n_msgs"),
    )
    return agg.select(
        "app", "n_lines", "n_hosts", "sum_pri", "n_proc", "n_sd",
        F.date_format("_min_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("first_ts"),
        "n_msgs",
    )


def q_postfix_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fourth construct-then-parse-back grok gate (VERDICT r4 #8):
    application-level MTA composite. Build postfix smtp-delivery lines
    ("<syslog head> QUEUEID: to=<rcpt>, relay=host[ip]:port,
    delay=D.DD, status=sent (...)") from the events table, parse with
    ``%{POSTFIX_SMTP_DELIVERY}`` (14 fields: SYSLOGBASE head +
    queueid/recipient/relay triple/delay/status/response), aggregate
    the PARSED fields. Oracle recomputes everything from the ORIGINAL
    columns; delay crosses the boundary as exact integer cents."""
    from fluent_plugin_record_reformer_spark.operators.parse import grok_parse

    ev = load_table(spark, sf_dir, "events")
    status = (
        F.when(F.col("event_type").isin("view", "click"), "sent")
        .when(F.col("event_type") == "purchase", "deferred")
        .when(F.col("event_type") == "signup", "bounced")
        .otherwise("expired")
    )
    line = F.format_string(
        "%s host%d postfix/smtp[%d]: %s: to=<user%d@example.com>, "
        "relay=mx%d.example.net[10.0.%d.%d]:25, delay=%d.%02d, status=%s (ok)",
        F.date_format("ts", "MMM d HH:mm:ss"),
        F.pmod(F.col("user_id"), F.lit(50)),
        (F.pmod(F.col("event_id"), F.lit(30000)) + 1).cast("int"),
        # hex(event_id + 0x100000) is always >= 6 uppercase hex chars,
        # satisfying the POSTFIX_QUEUEID alternation
        F.hex(F.col("event_id") + F.lit(1048576)),
        F.pmod(F.col("user_id"), F.lit(1000)),
        F.pmod(F.col("event_id"), F.lit(5)),
        F.pmod(F.col("event_id"), F.lit(256)),
        F.pmod(F.col("user_id"), F.lit(256)),
        F.pmod(F.col("event_id"), F.lit(20)).cast("int"),
        F.pmod(F.col("event_id"), F.lit(100)).cast("int"),
        status,
    )
    parsed = grok_parse(
        ev.select(line.alias("text")),
        "%{POSTFIX_SMTP_DELIVERY}",
        types={"pid": "long", "delay": "decimal(18,2)"},
        single_pass=True,  # 14 fields -> one regex pass per row
    )
    agg = parsed.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("recipient").alias("n_recipients"),
        F.countDistinct("queueid").alias("n_queueids"),
        F.countDistinct("relayip").alias("n_relays"),
        (F.sum("delay") * 100).cast("long").alias("sum_delay_cents"),
        F.sum("pid").alias("sum_pid"),
        F.countDistinct("logsource").alias("n_hosts"),
        # parsed-timestamp min anchored to leap year 1972 (see
        # q_syslog_logs — 1970 would NULL-drop "Feb 29" lines):
        # HashAggregate, not the immutable-string-buffer SortAggregate
        F.min(
            F.try_to_timestamp(
                F.concat(F.lit("1972 "), F.col("timestamp")),
                F.lit("yyyy MMM d HH:mm:ss"),
            )
        ).alias("_min_ts"),
        F.count("response").alias("n_resp"),
    )
    return agg.select(
        "status", "n_lines", "n_recipients", "n_queueids", "n_relays",
        "sum_delay_cents", "sum_pid", "n_hosts",
        F.date_format("_min_ts", "MMM d HH:mm:ss").alias("first_ts"),
        "n_resp",
    )


def q_tomcat_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fifth construct-then-parse-back grok gate: the Java app-server
    family. Build Tomcat-format lines ("2024-01-15 12:34:56+00:00 |
    INFO | com.example.App - msg") from events, parse with
    ``%{TOMCATLOG}`` (TOMCAT_DATESTAMP's ``20%{YEAR}`` prefix +
    ISO8601_TIMEZONE, LOGLEVEL alternation, JAVACLASS dotted path),
    aggregate the PARSED fields against an original-column oracle."""
    from fluent_plugin_record_reformer_spark.operators.parse import grok_parse

    ev = load_table(spark, sf_dir, "events")
    level = (
        F.when(F.col("event_type") == "view", "INFO")
        .when(F.col("event_type") == "click", "DEBUG")
        .when(F.col("event_type") == "purchase", "WARN")
        .when(F.col("event_type") == "signup", "ERROR")
        .otherwise("FATAL")
    )
    line = F.format_string(
        # TOMCAT_DATESTAMP takes the tz AFTER a space ("...28,269 -0800")
        "%s +00:00 | %s | com.example.svc.Handler%d - user=%d action=%s",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        level,
        F.pmod(F.col("event_id"), F.lit(7)),
        F.pmod(F.col("user_id"), F.lit(100)),
        F.col("event_type"),
    )
    parsed = grok_parse(
        ev.select(line.alias("text")), "%{TOMCATLOG}", single_pass=True
    )
    agg = parsed.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("class").alias("n_classes"),
        F.countDistinct("logmessage").alias("n_msgs"),
        # parsed-timestamp min: hash-aggregatable long buffer
        F.min(
            F.try_to_timestamp(
                F.col("timestamp"), F.lit("yyyy-MM-dd HH:mm:ss XXX")
            )
        ).alias("_min_ts"),
    )
    return agg.select(
        "level", "n_lines", "n_classes", "n_msgs",
        F.concat(
            F.date_format("_min_ts", "yyyy-MM-dd HH:mm:ss"), F.lit(" +00:00")
        ).alias("first_ts"),
    )


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals per document (duplicated
    token / 2-gram / 3-gram occurrence counts + the boilerplate flag)
    — the Gopher-style repetition filters. Exact integers at the
    oracle boundary; flag via integer cross-multiplication."""
    from fluent_plugin_record_reformer_spark.operators.curation import (
        repetition_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs)


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-15 tokens across the corpus via Misra-Gries candidate
    pruning + broadcast exact verify (operators/frequency.py): the
    shuffle is bounded by `capacity` summary rows per partition rather
    than the distinct-token cardinality, and the oracle recomputes the
    same top-k wholesale — counts must match exactly, and on this
    corpus the miss bound proves every returned row."""
    from fluent_plugin_record_reformer_spark.operators.frequency import heavy_hitters

    docs = load_table(spark, sf_dir, "documents", fanout=False)
    toks = docs.select(F.explode(word_tokens(F.col("text"))).alias("token"))
    return heavy_hitters(toks, "token", k=15, capacity=2048)


# Versioned tool dimension for the as-of enrichment query — shared
# verbatim between the Spark values_dim and the oracle's VALUES CTE.
TOOL_VERSIONS = [
    ("checkout", "2023-12-01 00:00:00", "legacy"),
    ("checkout", "2024-01-10 00:00:00", "standard"),
    ("checkout", "2024-01-20 00:00:00", "premium"),
    ("auth", "2023-12-01 00:00:00", "legacy"),
    ("auth", "2024-01-15 00:00:00", "mfa"),
]


def q_asof_tools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) enrichment: each turn gets the tool tier
    that was effective AT ITS TIMESTAMP from a versioned dim
    (operators/enrich.asof_enrich — fact side never shuffles; the dim
    collapses to per-key sorted version arrays and broadcasts). The
    oracle is DuckDB's native ASOF LEFT JOIN."""
    from fluent_plugin_record_reformer_spark.operators.enrich import (
        asof_enrich,
        values_dim,
    )

    t = _transcripts(spark, sf_dir)
    dim = values_dim(
        spark,
        TOOL_VERSIONS,
        "tool string, effective_from timestamp, tier string",
    )
    e = asof_enrich(t, dim, on="tool", ts_col="ts", dim_ts_col="effective_from")
    return e.groupBy("tool", "tier").agg(F.count(F.lit(1)).alias("n_turns"))


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join without a cartesian product: 2-hour alert windows
    (anchored at every 97th error event) joined to ALL events falling
    inside them via the bucket-equality range join
    (operators/joins.bucketed_range_join); the oracle runs the plain
    BETWEEN join the buckets must exactly reproduce."""
    from fluent_plugin_record_reformer_spark.operators.joins import (
        bucketed_range_join,
    )

    ev = load_table(spark, sf_dir, "events", fanout=False)
    iv = ev.filter(
        (F.col("event_type") == "error") & (F.pmod(F.col("event_id"), F.lit(97)) == 0)
    ).select(
        F.col("event_id").alias("win_id"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("win_end"),
    )
    facts = ev.select("event_id", "event_type", "ts", "value")
    j = bucketed_range_join(
        facts,
        iv,
        ts_col="ts",
        start_col="win_start",
        end_col="win_end",
        bucket_seconds=7200,
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.countDistinct("win_id").alias("n_windows"),
        F.round(F.sum("value"), 2).alias("sum_val"),
    )


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch: approximate distinct conversations per role, next to
    the exact count so the estimator's accuracy is visible in output."""
    t = _transcripts(spark, sf_dir)
    approx = kmv_distinct(t, "conv_id", ["role"], k=64)
    exact = t.groupBy("role").agg(
        F.countDistinct("conv_id").alias("exact_distinct")
    )
    return approx.join(exact, "role")


def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 10% conversation sample: the hash gate is a pure
    function of conv_id, so the SAME conversations survive reruns,
    repartitions, and engine swaps — and sampling is join-closed
    (every turn of a kept conversation is kept)."""
    t = _transcripts(spark, sf_dir)
    kept = deterministic_sample(t, "conv_id", 0.10, seed=7)
    return kept.groupBy("role").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("conv_id").alias("n_convs"),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing under the correctness gate: a deterministic
    synthetic media table (binary payloads from md5) flows through the
    mapInPandas decode stage (fake codec) — the Arrow batch shape,
    binary schema, and feature math are all oracle-checked."""
    from fluent_plugin_record_reformer_spark.operators.multimodal import (
        decode_image_features,
    )

    media = spark.range(200).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 2 == 0, "image").otherwise("video").alias("kind"),
        (F.col("id") % 64 + 32).cast("int").alias("width"),
        (F.col("id") % 48 + 24).cast("int").alias("height"),
        F.unhex(F.md5(F.col("id").cast("string"))).alias("payload"),
    )
    feats = decode_image_features(media.filter("kind = 'image'"), fake_decoder=True)
    return feats.select(
        "media_id", "width", "height",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        "phash",
    )


def q_conv_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions over the conversation spine: per-turn gap to the
    previous turn (lag) and per-conv rollup (duration, mean gap)."""
    t = _transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = t.withColumn(
        "gap_s",
        F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(w),
    )
    # The mean gap crosses the oracle boundary as an exact rational
    # pair (sum, count) of BIGINTs — avg()+round() doubles can differ
    # between engines' float normalizers on ties.
    return gaps.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "duration_s"
        ),
        F.sum("gap_s").alias("sum_gap_s"),
        F.count("gap_s").alias("n_gaps"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias(
            "n_assistant"
        ),
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag documents whose distinct
    3-shingle hash overlap with the (broadcast) benchmark set is
    >= 20%. Benchmark = every 97th doc (a deterministic stand-in for
    an eval set)."""
    from fluent_plugin_record_reformer_spark.operators.curation import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return decontaminate(docs, bench, shingle_n=SHINGLE_N, threshold=0.2)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: emails / IPv4s / phone numbers replaced in
    pattern order. The PII spans are synthesized deterministically so
    both engines scrub identical inputs."""
    from fluent_plugin_record_reformer_spark.operators.curation import pii_scrub

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    dirty = F.concat(
        F.col("text"),
        F.lit(" mail u"), F.col("doc_id").cast("string"), F.lit("@ex.com"),
        F.lit(" ip 10.0.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(" tel +1 555-000-1234"),
    )
    return docs.select("doc_id", pii_scrub(dirty).alias("scrubbed"))


def q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota: keep at most 30 docs per source, selected by
    the deterministic doc_id order (rerun/repartition-stable)."""
    from fluent_plugin_record_reformer_spark.operators.curation import domain_quota

    docs = load_table(spark, sf_dir, "documents", fanout=False)
    return domain_quota(docs, quota=30).select("doc_id", "source")


def q_token_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixing: per source, keep docs in doc_id order while
    the running whitespace-token total stays within 2000; report what
    each source contributes to the mix."""
    from fluent_plugin_record_reformer_spark.operators.curation import (
        token_budget_mix,
    )

    docs = load_table(spark, sf_dir, "documents", fanout=False)
    kept = token_budget_mix(docs, budget=2000)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").alias("n_tokens_kept"),
    )


def q_conv_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (the batch mirror of the stateful streaming
    sessionizer): a new session starts when the gap to the previous
    turn exceeds 30 min — session ids via a cumulative boundary sum,
    then per-conversation session stats."""
    t = _transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gap = F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(w)
    marked = t.withColumn(
        "_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sess = marked.withColumn("session_idx", F.sum("_new").over(w))
    per_session = sess.groupBy("conv_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_turns"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("dur_s"),
    )
    return per_session.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_turns").alias("longest_session_turns"),
        F.max("dur_s").alias("longest_session_s"),
    )


def q_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation pipeline end-to-end, one lazy plan: language
    filter (predicted 'en') -> quality gate (stopword ratio) -> exact
    dedup (keeper = min doc_id) -> deterministic 50% sample -> per-
    source counts + token sums. The curation analog of pipeline_e2e."""
    docs = load_table(spark, sf_dir, "documents", fanout=False)
    toks = word_tokens(F.col("text"))
    n_words = F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+"), 0))
    n_stop = F.size(
        F.regexp_extract_all("text", F.lit(r"\b(the|and|of|to|a|in)\b"), 0)
    )
    gated = docs.filter(
        (language_id(toks) == "en")
        & (n_stop.cast("double") / F.greatest(n_words, F.lit(1)) >= 0.05)
    )
    # min_by: the KEPT doc's source (arg-min by doc_id), not the
    # lexicographic min — and a TypedImperative agg, so the plan is
    # ObjectHashAggregate instead of the SortAggregate fallback that
    # min(string)'s immutable buffer forces (round-5 plan sweep)
    keepers = gated.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("source", "doc_id").alias("source"),
    )
    sampled = deterministic_sample(keepers, "doc_id", 0.5, seed=5)
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n_tokens"),
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified + quality-weighted deterministic sampling: per-row
    keep probability = per-source rate x length-derived quality proxy,
    evaluated through the value-pure hash gate (rerun/repartition/
    engine-invariant row selection)."""
    from fluent_plugin_record_reformer_spark.operators.sketch import weighted_sample

    docs = load_table(spark, sf_dir, "documents", fanout=False)
    rate = (
        F.when(F.col("source") == "src0", F.lit(0.5))
        .when(F.col("source") == "src1", F.lit(0.25))
        .otherwise(F.lit(0.1))
    )
    quality = F.least(F.col("n_chars").cast("double") / 400.0, F.lit(1.0))
    kept = weighted_sample(docs, "doc_id", rate * quality, seed=11)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.min("doc_id").alias("first_kept"),
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: per-source concat-then-split layout into
    512-token training sequences; per-bin rollup shows the packing."""
    from fluent_plugin_record_reformer_spark.operators.curation import (
        pack_sequences,
    )

    docs = load_table(spark, sf_dir, "documents", fanout=False)
    packed = pack_sequences(docs, seq_len=512)
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("bin_offset").alias("first_offset"),
    )


def q_gap_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-role latency quantiles (p50/p90/p99 of the turn gap)
    as distributed k-th order statistics — engine-portable, unlike
    percentile_approx sketches."""
    from fluent_plugin_record_reformer_spark.operators.aggregate import (
        exact_quantiles,
    )

    t = _transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = t.select(
        "role",
        (F.unix_timestamp("ts") - F.lag(F.unix_timestamp("ts")).over(w)).alias(
            "gap_s"
        ),
    )
    return exact_quantiles(gaps, "gap_s", ["role"], qs=(0.5, 0.9, 0.99))


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the verified LSH
    pairs (jaccard >= 0.5); cluster id = component min doc id (the
    keeper). Iterative min-label propagation to fixed point — the
    oracle reaches the same fixed point via a recursive CTE."""
    from fluent_plugin_record_reformer_spark.operators.dedup import dup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_near_dup(
        docs, num_hashes=MINHASH_K, bands=LSH_BANDS, shingle_n=SHINGLE_N,
        threshold=0.5,
    )
    return dup_clusters(pairs)


def q_top_convs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort/limit: top-10 busiest conversations (deterministic tiebreak
    on conv_id). TakeOrderedAndProject — no global sort at scale."""
    t = _transcripts(spark, sf_dir)
    return (
        t.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .orderBy(F.col("n_turns").desc(), F.col("conv_id").asc())
        .limit(10)
    )


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN top-5 with TRAINED centroids: deterministic Lloyd
    k-means (k=16, 2 iterations, exact-integer coordinate means —
    replayed CTE-for-CTE by the oracle), inverted lists by nearest
    centroid, queries probe 2 lists, exact re-rank."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = train_kmeans_centroids(emb, k=16, iters=2, dim=64)
    return ivf_topk(emb, centroids, _knn_queries(spark, sf_dir), k=5, nprobe=2)


def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: sign-bit LSH bucket pair-gen (flood
    cap mirrored in the oracle) + exact cosine >= 0.2 verification."""
    emb = load_table(spark, sf_dir, "embeddings", fanout=False)
    return embedding_near_dup(emb, threshold=0.2, planes=8, max_bucket=128)


def q_scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension build (operators/enrich.scd2_from_changelog):
    a per-entity status change log (derived deterministically from
    events) collapses into versioned rows with valid_from/valid_to —
    the producer side of what asof_enrich consumes. No-op restatements
    (same status as the previous version) are collapsed. Oracle
    mirrors the lag-collapse + lead-validity windows in SQL."""
    from fluent_plugin_record_reformer_spark.operators.enrich import (
        scd2_from_changelog,
    )

    ev = load_table(spark, sf_dir, "events", fanout=False)
    chg = (
        ev.select(
            F.pmod(F.col("user_id"), F.lit(40)).alias("entity"),
            "ts",
            "event_type",
        )
        .groupBy("entity", "ts")
        .agg(F.min("event_type").alias("status"))
    )
    dim = scd2_from_changelog(
        chg, key="entity", ts_col="ts", attrs=["status"]
    )
    dur = F.unix_timestamp("valid_to") - F.unix_timestamp("valid_from")
    return dim.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(F.col("is_current").cast("long")).alias("n_current"),
        F.sum(
            F.when(F.col("valid_to").isNotNull(), dur).otherwise(F.lit(0))
        ).alias("sum_dur_s"),
        F.min("valid_from").alias("first_seen"),
    )


SURPRISAL_VOCAB, SURPRISAL_THR = 16, (17, 2)  # flag: bits/token > 17/2


def q_doc_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram-LM quality filter
    (operators/corpus.surprisal_score): per-doc corpus surprisal in
    INTEGER bits (bitlen(T) - bitlen(cnt) per token, OOV floor), so
    every aggregate is an order-free exact BIGINT sum; the high-
    surprisal flag compares the rational bits/token threshold by
    integer cross-multiplication. Vocab is bounded top-16 (broadcast
    stays bounded at 100 TB; the tail of the 31-word synthetic vocab
    exercises the OOV path)."""
    from fluent_plugin_record_reformer_spark.operators.corpus import (
        surprisal_score,
    )

    docs = load_table(spark, sf_dir, "documents", fanout=False)
    per_doc = surprisal_score(
        docs,
        id_cols=["doc_id", "source"],
        text_col="text",
        vocab_size=SURPRISAL_VOCAB,
    )
    thr_num, thr_den = SURPRISAL_THR
    high = (
        F.col("sum_bits") * F.lit(thr_den) > F.lit(thr_num) * F.col("n_tokens")
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.sum("sum_bits").alias("sum_bits"),
        F.sum(high.cast("long")).alias("n_high"),
        (F.sum("sum_bits").cast("double") / F.sum("n_tokens")).alias(
            "avg_bits"
        ),
    )


TFIDF_TERMS = ["filter", "scan", "slow", "vector"]


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 documents per query term
    (operators/corpus.tfidf_topk): term filter pushed into the scan
    projection, doc-frequency + doc-count broadcast back, ranking via
    the scalable grouped_topk (per-partition bounded local top-k, then
    an exact window over only the candidate set — never a window over
    the raw per-doc counts)."""
    from fluent_plugin_record_reformer_spark.operators.corpus import (
        tfidf_topk,
    )

    docs = load_table(spark, sf_dir, "documents", fanout=False)
    return tfidf_topk(
        docs, id_col="doc_id", text_col="text", terms=TFIDF_TERMS, k=3
    )


def q_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection over hourly event rates: an hour is
    anomalous for a type when its count deviates from that type's
    mean by more than 2 standard deviations. The entire flag is
    computed in EXACT integer arithmetic — |cnt - S/n| > 2σ is
    cross-multiplied to (cnt*n - S)^2 > 4*(SS*n - S^2) over BIGINT
    sums (S, SS, n), so no float ever reaches a comparison and the
    oracle matches bit-for-bit. (The squares stay < 2^63 up to
    ~10^9 events/hour x 10^4 hours; beyond that promote to DECIMAL.)

    Scale shape: one partial-aggregated groupBy to hourly counts
    (output rows = types x hours, tiny), per-type stats over THAT
    (tinier), broadcast back. The raw table is touched once."""
    ev = load_table(spark, sf_dir, "events", fanout=False)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    stats = hourly.groupBy("event_type").agg(
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
        F.count(F.lit(1)).alias("n"),
    )
    j = hourly.join(F.broadcast(stats), on="event_type")
    dev = F.col("cnt") * F.col("n") - F.col("s")
    anom = (dev * dev) > F.lit(4) * (
        F.col("ss") * F.col("n") - F.col("s") * F.col("s")
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("cnt").alias("sum_cnt"),
        F.max("cnt").alias("max_cnt"),
        F.sum(anom.cast("long")).alias("n_anom"),
    )


COHORT_EPOCH = "2024-01-01"


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week,
    activity counted per (cohort week, weeks-since-cohort) cell —
    the standard triangle every events pipeline grows. Week indexes
    are integer day-diffs `div 7` from a fixed epoch (no engine
    week-truncation semantics in play).

    Scale shape: per-user first-day and per-(user, day) activity both
    hash-aggregate on user_id (co-partitioned, partial agg); the
    cohort join is a same-key shuffle join; the final cell agg is over
    user-days, already orders of magnitude below raw events."""
    ev = load_table(spark, sf_dir, "events", fanout=False)
    days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    firsts = days.groupBy("user_id").agg(F.min("d").alias("cohort_d"))
    j = days.join(firsts, on="user_id")
    cohort_week = F.expr(
        f"datediff(cohort_d, DATE '{COHORT_EPOCH}') div 7"
    )
    offset_week = F.expr("datediff(d, cohort_d) div 7")
    return j.groupBy(
        cohort_week.alias("cohort_week"), offset_week.alias("offset_week")
    ).agg(
        F.countDistinct("user_id").alias("n_active"),
        F.count(F.lit(1)).alias("n_user_days"),
    )


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (operators/sequence.transition_matrix) — the
    distributed generalization of the reference's in-order event
    iteration (out_record_reformer.rb `es.each`). Ordering is the
    deterministic total order (ts, event_id); the only sort in the
    plan is the per-user window that DEFINES adjacency — both
    aggregations are hash + partial."""
    from fluent_plugin_record_reformer_spark.operators.sequence import (
        transition_matrix,
    )

    ev = load_table(spark, sf_dir, "events", fanout=False)
    return transition_matrix(
        ev,
        key_col="user_id",
        state_col="event_type",
        order_cols=["ts", "event_id"],
    )


QSKETCH_K, QSKETCH_SEED = 256, 11


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate per-type value quantiles from a deterministic
    bottom-k row sample (operators/sketch.bottomk_quantile_sketch):
    bounded per-group state (k structs) and one pass, where
    exact_quantiles pays a chunked global rank. The sample is a pure
    function of (seed, event_id), so the DuckDB oracle reproduces the
    SAME sample and the estimates hash-match bit-for-bit; the error
    BOUND vs the true quantile is property-tested in pytest."""
    ev = load_table(spark, sf_dir, "events")
    return bottomk_quantile_sketch(
        ev,
        "value",
        ["event_type"],
        key_col="event_id",
        k=QSKETCH_K,
        quantiles=(0.5, 0.9, 0.99),
        seed=QSKETCH_SEED,
    )


STRAT_TARGET, STRAT_SEED = 500, 7


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-rebalancing stratified sample
    (operators/sketch.stratified_sample): every event_type stratum is
    hash-gated down to ~500 expected rows (rate = least(1, 500/cnt)
    from a broadcast count dim), then summarized. The checksum column
    (sum of kept event_ids) proves both engines kept EXACTLY the same
    rows, not just the same number."""
    ev = load_table(spark, sf_dir, "events", fanout=False)
    kept = stratified_sample(
        ev,
        "event_id",
        ["event_type"],
        target_per_stratum=STRAT_TARGET,
        seed=STRAT_SEED,
    )
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("event_id").alias("sum_ids"),
    )


DENSE_BUCKET_S = 900


def q_dense_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled per-type event-rate series
    (operators/sequence.dense_counts): one row per (event_type,
    15-minute bucket) across each type's active span, with zero counts
    for silent buckets — the resample a rate dashboard or anomaly
    baseline needs (a bare groupBy never emits the gaps). The dense
    grid is generated from per-key spans (one row per key), never from
    raw events."""
    from fluent_plugin_record_reformer_spark.operators.sequence import (
        dense_counts,
    )

    ev = load_table(spark, sf_dir, "events", fanout=False)
    return dense_counts(
        ev, ["event_type"], "ts", bucket_seconds=DENSE_BUCKET_S
    )


RESERVOIR_K, RESERVOIR_SEED = 2, 11


def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT k-per-group sampling (operators/sketch.grouped_reservoir):
    the 2 documents with the smallest seeded hash per source — a
    deterministic reservoir routed through the bounded-state
    grouped_topk shape (per-partition candidates, rank over the tiny
    candidate set) instead of a raw-table window. Raw sampled rows are
    returned, so the cross-engine hash certifies BOTH engines picked
    the identical reservoir."""
    from fluent_plugin_record_reformer_spark.operators.sketch import (
        grouped_reservoir,
    )

    docs = load_table(spark, sf_dir, "documents", fanout=False)
    kept = grouped_reservoir(
        docs.select("doc_id", "lang", "source", "n_chars"),
        ["source"],
        "doc_id",
        RESERVOIR_K,
        seed=RESERVOIR_SEED,
        rank_col="sample_rank",
    )
    return kept.select("source", "doc_id", "lang", "n_chars", "sample_rank")


INVIDX_POSTINGS = 3


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped inverted index over the documents corpus
    (operators/corpus.inverted_index): term -> doc_freq, total_tf and
    a rank-ordered "doc:tf" posting string capped at 3 — per-term
    state bounded by the cap regardless of term frequency."""
    from fluent_plugin_record_reformer_spark.operators.corpus import (
        inverted_index,
    )

    docs = load_table(spark, sf_dir, "documents", fanout=False)
    return inverted_index(
        docs, id_col="doc_id", text_col="text", max_postings=INVIDX_POSTINGS
    )


SKEW_SALT_R = 8


def q_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-defeating salted equi-join (operators/joins.salted_join):
    facts join a per-(event_type, day) count dim on a 5-value key —
    exactly the hot-key shape that sends a third of a 100 TB table to
    one reducer. The fact side gains a deterministic 8-way salt
    (pmod(xxhash64(event_id), 8)), the dim replicates 8x via one
    explode, and the join key widens to (type, day, salt). Results are
    provably the plain join: the oracle runs the UNSALTED join, so the
    parity gate certifies the equivalence, and the aggregate
    sum-of-day-counts (= Σ cnt² per type) checksums the fan-out."""
    from fluent_plugin_record_reformer_spark.operators.joins import (
        salted_join,
    )

    ev = load_table(spark, sf_dir, "events", fanout=False)
    facts = ev.select(
        "event_id", "event_type", F.to_date("ts").alias("d")
    )
    dim = facts.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).alias("day_cnt")
    )
    j = salted_join(
        facts,
        dim,
        ["event_type", "d"],
        salt_col="event_id",
        salt_partitions=SKEW_SALT_R,
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("day_cnt").alias("sum_cnt_sq"),
        F.countDistinct("d").alias("n_days"),
    )


CHUNK_TOKENS, CHUNK_OVERLAP = 16, 4


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking for embedding/RAG ingest
    (operators/corpus.chunk_documents): 16-token windows every 12
    tokens (4-token overlap), redundant trailing windows suppressed.
    Raw chunk rows are returned, so the cross-engine hash certifies
    every chunk TEXT byte-for-byte, not just counts. One projection +
    one explode — no shuffle, no UDF."""
    from fluent_plugin_record_reformer_spark.operators.corpus import (
        chunk_documents,
    )

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(
        docs,
        id_col="doc_id",
        text_col="text",
        chunk_tokens=CHUNK_TOKENS,
        overlap=CHUNK_OVERLAP,
    )


TEXTRANK_ITERS, TEXTRANK_SCALE, TEXTRANK_D = 3, 10_000, 85


def q_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword scoring: integer-exact distributed PageRank
    (operators/graph.pagerank) over the corpus' symmetric adjacent-
    token co-occurrence graph. Ranks are INT64 fixed-point (scale
    10^4) so every per-iteration sum is order-free — the DuckDB oracle
    unrolls the 3 iterations as CTEs and hash-matches bit-for-bit.
    Each iteration is one same-key shuffle join + one partial-agg
    groupBy; the edge exchange is materialized once (exchange reuse)
    and reread by all iterations."""
    from fluent_plugin_record_reformer_spark.operators.graph import (
        cooccurrence_edges,
        pagerank,
    )

    docs = load_table(spark, sf_dir, "documents", fanout=False)
    edges = cooccurrence_edges(docs, text_col="text", tokenize=word_tokens)
    ranked = pagerank(
        edges,
        iterations=TEXTRANK_ITERS,
        damping_pct=TEXTRANK_D,
        scale=TEXTRANK_SCALE,
    )
    return ranked.select(F.col("node").alias("term"), "rank")


def q_log_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain-style log-template mining (operators/templates): mask
    variable tokens (UUID/IP/hex/number) with a codegen'd
    regexp_replace chain, then hash-aggregate per template — the "5
    shapes, one spiking" view of a 10^12-line firehose. No UDF, no
    window; the shuffle carries one row per (partition, template)."""
    from fluent_plugin_record_reformer_spark.operators.templates import (
        mine_templates,
    )

    t = _transcripts(spark, sf_dir)
    return mine_templates(t, text_col="text", key_col="conv_id")


PIVOT_TOOL_SLOTS = ["auth", "checkout", "none"]


def q_role_tool_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab of routed traffic: role x tool usage matrix via
    ``groupBy(role).pivot(tool)`` with the value list PINNED — an
    unpinned pivot runs an extra distinct-collection job over the full
    table just to learn the columns (a scan a 100 TB table cannot
    afford). Empty cells stay null (no traffic observed), mirrored by
    NULLIF(count,0) on the oracle side."""
    t = _tagged(spark, sf_dir)
    wide = (
        t.withColumn("tool_slot", F.coalesce(F.col("tool"), F.lit("none")))
        .groupBy("role")
        .pivot("tool_slot", PIVOT_TOOL_SLOTS)
        .count()
    )
    return wide.select(
        "role",
        *[F.col(s).alias(f"n_{s}") for s in PIVOT_TOOL_SLOTS],
    )


# CIDR-style blocks over the 32-bit IP space — shared verbatim between
# the Spark values_dim and the oracle's VALUES CTE. Deliberately
# non-covering (convs outside any block drop out of the inner join on
# BOTH engines) and of very different spans (1 to 32 buckets of 2^24).
IP_SEED = 17
IP_BUCKET = 1 << 24
IP_RANGES = [
    ("dc-west", 0x0A000000, 0x0AFFFFFF),
    ("office", 0x2A000000, 0x2A00FFFF),
    ("region-a", 0x40000000, 0x5FFFFFFF),
    ("region-b", 0x80000000, 0x9FFFFFFF),
    ("cdn-edge", 0xC0000000, 0xC3FFFFFF),
]


def q_ip_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoIP-style CIDR-block enrichment: each conversation gets a
    deterministic 32-bit source address (seeded hash of conv_id), then
    range-joins against an IP-block dictionary via
    operators/joins.bucketed_range_join_long — a bucket-EQUALITY join
    (broadcastable, AQE-friendly) instead of the
    BroadcastNestedLoopJoin a raw BETWEEN lookup would plan. The
    oracle runs the plain BETWEEN join the buckets must reproduce."""
    from fluent_plugin_record_reformer_spark.functions.hashing import (
        seeded_hash60,
    )
    from fluent_plugin_record_reformer_spark.operators.enrich import values_dim
    from fluent_plugin_record_reformer_spark.operators.joins import (
        bucketed_range_join_long,
    )

    # src_ip is a function of conv_id alone, so aggregate turns per
    # conversation FIRST (a partial-agg groupBy that collapses ~10:1
    # map-side before anything is shuffled), then hash and range-join
    # only the conv rows: 10x fewer md5 evaluations and join probes,
    # and the per-label distinct-conversation count becomes a plain
    # row count (the distinct aggregate disappears — each conv is one
    # row here). Same inner-join drop semantics per conv; output is
    # row-identical (r6 interleaved A/B: parity 0/0, sf0.1 0.84->0.71,
    # 10x replica 3.48->3.24 best — and at real scale the win is
    # structural: the heavy per-turn stream never reaches the hash or
    # the join).
    t = _transcripts(spark, sf_dir)
    convs = (
        t.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("_nt"))
        .withColumn(
            "src_ip",
            F.pmod(seeded_hash60(F.col("conv_id"), IP_SEED), F.lit(1 << 32)),
        )
    )
    dim = values_dim(
        spark,
        [(lbl, lo, hi) for lbl, lo, hi in IP_RANGES],
        "net_label string, ip_lo long, ip_hi long",
    )
    j = bucketed_range_join_long(
        convs,
        dim,
        value_col="src_ip",
        lo_col="ip_lo",
        hi_col="ip_hi",
        bucket_size=IP_BUCKET,
        max_span_buckets=64,
    )
    return j.groupBy("net_label").agg(
        F.sum("_nt").alias("n_turns"),
        F.count(F.lit(1)).alias("n_convs"),
    )


EDIT1_SLUG_LEN = 12


def q_edit_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-level near-dup join: EXACT edit-distance<=1 pairs among
    document slugs (leading chars) via symmetric-deletion blocking
    (operators/dedup.edit1_pairs) — zero recall loss, no all-pairs
    join. The oracle IS the naive all-pairs levenshtein join over the
    distinct slugs, so exactness has nothing to hide behind."""
    from fluent_plugin_record_reformer_spark.operators.dedup import edit1_pairs

    docs = load_table(spark, sf_dir, "documents", fanout=False)
    slugs = docs.select(
        F.substring(F.col("text"), 1, EDIT1_SLUG_LEN).alias("slug")
    )
    return edit1_pairs(slugs, str_col="slug", out_a="slug_a", out_b="slug_b")


ZORDER_BITS = 8


def q_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key (operators/layout.zvalue):
    interleave user-bucket and hour-of-day bits so a write laid out by
    this key prunes parquet files on BOTH dimensions (the layout/
    pruning proof lives in tests/test_layout.py against real file
    stats). The query certifies the bit math cross-engine: per-z-cell
    event counts, pure codegen'd integer ops on each side."""
    from fluent_plugin_record_reformer_spark.operators.layout import zvalue

    ev = load_table(spark, sf_dir, "events", fanout=False)
    z = zvalue(
        F.pmod(F.col("user_id"), F.lit(256)),
        F.hour(F.col("ts")),
        bits=ZORDER_BITS,
    )
    return (
        ev.select(z.alias("z_cell"))
        .groupBy("z_cell")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


ROLLING_ROWS = 3
# money → exact integer cents before any aggregation: floor(x*100+0.5)
# over a double is the same IEEE arithmetic on both engines, and the
# BIGINT sums after it are bit-stable under any partitioning
CENTS = "CAST(floor(value * 100 + 0.5) AS BIGINT)"


def q_rolling_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-3-event spend (operators/sequence.rolling_sum):
    the SQL ROWS frame over an exact-integer cents column — one
    shuffle by user, external (spillable) per-partition sort, O(frame)
    memory. The oracle runs the identical window frame."""
    from fluent_plugin_record_reformer_spark.operators.sequence import (
        rolling_sum,
    )

    ev = load_table(spark, sf_dir, "events", fanout=False).select(
        "event_id", "user_id", "ts", F.expr(CENTS).alias("cents")
    )
    return rolling_sum(
        ev,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        value_col="cents",
        window_rows=ROLLING_ROWS,
        out_col="roll3_cents",
    )


INCR_CUTOFF = "2024-02-01 00:00:00"


def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-merge aggregation (operators/aggregate.merge_summaries):
    the stored pre-cutoff state merged with the post-cutoff delta must
    EQUAL the full-history aggregate — which is precisely what the
    oracle computes (one pass over everything). Count/sum sum-merge,
    min/max min/max-merge; nothing rescans the 'historical' side."""
    from fluent_plugin_record_reformer_spark.operators.aggregate import (
        merge_summaries,
    )

    ev = load_table(spark, sf_dir, "events", fanout=False)
    cut = F.lit(INCR_CUTOFF).cast("timestamp")

    def summarize(part: DataFrame) -> DataFrame:
        return part.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr(CENTS)).alias("sum_cents"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )

    state = summarize(ev.filter(F.col("ts") < cut))
    delta = summarize(ev.filter(F.col("ts") >= cut))
    return merge_summaries(
        [state, delta],
        keys=["event_type"],
        sum_cols=["n_events", "sum_cents"],
        min_cols=["first_ts"],
        max_cols=["last_ts"],
    )


def q_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-conversations curve (operators/sequence.
    interval_concurrency): sweep-line over conversation [first_turn,
    last_turn + 1min) intervals — boundary deltas pre-aggregated per
    instant, global cumulative sum via the order-monotone CHUNKED
    prefix sum (no single-task window). Oracle: the same sweep as one
    DuckDB window cumsum."""
    from fluent_plugin_record_reformer_spark.operators.sequence import (
        interval_concurrency,
    )

    t = _transcripts(spark, sf_dir)
    convs = t.groupBy("conv_id").agg(
        F.min("ts").alias("s"),
        (F.max("ts") + F.expr("INTERVAL 1 MINUTE")).alias("e"),
    )
    iv = convs.withColumn("g", F.lit("all"))
    out = interval_concurrency(
        iv, group_col="g", start_col="s", end_col="e"
    )
    return out.select("ts", "concurrent")


def q_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period movement: daily event counts with the prior
    day's count attached via lag() — run over the PRE-AGGREGATED
    (type, day) series, so the window touches |types|x|days| rows,
    never raw events (the only correct place for a lag window at
    100 TB). First day per type keeps a null prev (nothing to compare
    against), exactly as the oracle's LAG does."""
    ev = load_table(spark, sf_dir, "events", fanout=False)
    # day as STRING on both engines: a DATE column round-trips to
    # pandas as date (Spark) vs midnight Timestamp (DuckDB) and would
    # hash differently at the driver
    daily = ev.groupBy(
        "event_type", F.to_date("ts").cast("string").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("day")
    return daily.withColumn("prev_n", F.lag("n_events").over(w))


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram: exact integer bin ids from one codegen'd
    floor-divide (identical IEEE arithmetic both engines), counts and
    exact-cents mass per bin — a single partial-aggregated groupBy."""
    ev = load_table(spark, sf_dir, "events", fanout=False)
    bin_ = F.floor(F.col("value") / F.lit(25.0)).cast("long")
    return (
        ev.groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr(CENTS)).alias("sum_cents"),
        )
    )


def q_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL normalization round-trip: construct each tool turn's
    request URL, then parse host/path/query-param back with Spark's
    builtin parse_url (JVM, codegen-adjacent) and aggregate per
    endpoint. The oracle re-parses the same constructed URLs with
    regexes — misparses cannot hide behind the construction."""
    t = _transcripts(spark, sf_dir).filter(F.col("tool").isNotNull())
    url = F.concat(
        F.lit("https://api.example.com/v1/"),
        F.col("tool"),
        F.lit("?conv="),
        F.col("conv_id"),
        F.lit("&turn="),
        F.col("turn_idx").cast("string"),
    )
    parsed = t.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("conv")).alias("conv"),
    )
    return parsed.groupBy("host", "path").agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.count_distinct("conv").alias("n_convs"),
    )


def q_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics: the distribution of per-key load (rows
    per user within each event type) — n_keys, the hottest key's row
    count, and EXACT p50/p90/p99 of the per-key counts via the chunked
    distributed order statistics. This is the measurement that decides
    salting factors and AQE skew thresholds before a 100 TB shuffle;
    both joined frames are already aggregated (|types| x |users| and
    |types| rows), so the diagnostic never re-scans raw data twice."""
    from fluent_plugin_record_reformer_spark.operators.aggregate import (
        exact_quantiles,
    )

    ev = load_table(spark, sf_dir, "events", fanout=False)
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    q = exact_quantiles(counts, "n_rows", ["event_type"], qs=(0.5, 0.9, 0.99))
    s = counts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n_rows").alias("max_rows"),
    )
    return q.join(s, "event_type").select(
        "event_type", "n_keys", "max_rows", "p50", "p90", "p99"
    )


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier flags (operators/aggregate.mad_outliers):
    |cents − median| > 3·MAD with EXACT integer medians from the
    chunked order statistics — a bot's own spend cannot drag the
    threshold that should catch it. Every row's flag is reproduced
    bit-for-bit by the oracle's identical rank rule."""
    from fluent_plugin_record_reformer_spark.operators.aggregate import (
        mad_outliers,
    )

    ev = load_table(spark, sf_dir, "events", fanout=False).select(
        "event_id", "event_type", F.expr(CENTS).alias("cents")
    )
    # cents of a bounded price column = bounded integer domain, so the
    # histogram-median path applies: both exact medians come from
    # |groups| x |distinct cents| histogram rows (map-side collapsed),
    # zero full-row range shuffles (guide §2.3/§8; identical output,
    # pinned by test_mad_histogram_path_equals_chunked)
    return mad_outliers(
        ev, value_col="cents", group_cols=["event_type"], k=3,
        low_cardinality=True,
    )


EQUI_BINS = 8


def q_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth (quantile) binning (operators/aggregate.
    equi_depth_bins): ~n/8 rows per bucket per event type with bucket
    spans — the feature-bucketing primitive equi-width histograms
    can't provide on skewed data. Bucket ids come from the chunked
    global rank; the oracle applies the identical ceil(r·b/n) rule
    (deliberately NOT ntile(), whose split rule differs)."""
    from fluent_plugin_record_reformer_spark.operators.aggregate import (
        equi_depth_bins,
    )

    ev = load_table(spark, sf_dir, "events", fanout=False).select(
        "event_type", F.expr(CENTS).alias("cents")
    )
    return equi_depth_bins(
        ev, value_col="cents", group_cols=["event_type"], bins=EQUI_BINS
    )


def q_anomaly_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship log-anomaly pipeline, ONE lazy plan: mask lines to
    templates (codegen'd chain) → per-(template, day) rates (hash
    agg) → robust MAD flags on each template's daily series (chunked
    exact medians) — "which log shape spiked, on which day" over the
    full firehose with no UDF, no driver action, and a bot-resistant
    threshold. Every flag is reproduced bit-for-bit by the oracle."""
    from fluent_plugin_record_reformer_spark.operators.aggregate import (
        mad_outliers,
    )
    from fluent_plugin_record_reformer_spark.operators.templates import (
        template_col,
    )

    t = _transcripts(spark, sf_dir)
    daily = (
        t.select(
            template_col("text").alias("template"),
            F.to_date("ts").cast("string").alias("day"),
        )
        .groupBy("template", "day")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    return mad_outliers(
        daily, value_col="n_lines", group_cols=["template"], k=3
    )


def q_time_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted gauge sums per event type (operators/sequence.
    time_weighted_sums): each observation weighted by how long it held
    (LOCF) — exact integer Σ cents·Δµs and Σ Δµs, from which the
    time-weighted mean is one division. An unweighted mean over-counts
    chatty periods; this is the standard telemetry correction."""
    from fluent_plugin_record_reformer_spark.operators.sequence import (
        time_weighted_sums,
    )

    ev = load_table(spark, sf_dir, "events", fanout=False).select(
        "event_type", "ts", "event_id", F.expr(CENTS).alias("cents")
    )
    return time_weighted_sums(
        ev,
        key_col="event_type",
        ts_col="ts",
        value_col="cents",
        order_tiebreak=["event_id"],
    )


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest dedup (operators/dedup.lsh_incremental_near_dup):
    near-dups of the 'new batch' (doc_id % 10 == 0) against the
    standing corpus ONLY — per LSH bucket, just the new x old cross
    product; the corpus never re-pairs against itself (at a 10^12-doc
    corpus that re-pairing would dwarf the actual ingest). Exact
    carried-set Jaccard, mirrored by the oracle's side-filtered
    bucket join."""
    from fluent_plugin_record_reformer_spark.operators.dedup import (
        lsh_incremental_near_dup,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 0)
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0)
    return lsh_incremental_near_dup(
        corpus,
        batch,
        num_hashes=MINHASH_K,
        bands=LSH_BANDS,
        shingle_n=SHINGLE_N,
    )


def q_multiline_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiline log reassembly (operators/parse.assemble_multiline):
    stack-trace-style blocks (head + indented frames, constructed
    deterministically from error events) stitched back into one
    message per incident via the per-source head-cumsum — the fluentd
    concat problem, batch-side. The oracle rebuilds the same lines
    and reassembles them with the identical window/string_agg, so any
    mis-segmentation breaks the hash."""
    from fluent_plugin_record_reformer_spark.operators.parse import (
        assemble_multiline,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "error"
    )
    k = F.explode(F.sequence(F.lit(0), F.lit(2)))
    staged = ev.select(
        F.concat(
            F.lit("app-"), F.pmod(F.col("user_id"), F.lit(4)).cast("string")
        ).alias("src"),
        F.col("event_id"),
        F.col("value"),
        k.alias("k"),
    )
    lines = staged.select(
        "src",
        (F.col("event_id") * 3 + F.col("k")).alias("ord"),
        F.when(
            F.col("k") == 0,
            F.format_string("ERR id=%d value=%.2f", F.col("event_id"), F.col("value")),
        )
        .otherwise(
            F.format_string(
                "\tat com.example.stage%d(ev%d)", F.col("k"), F.col("event_id")
            )
        )
        .alias("line"),
    )
    return assemble_multiline(
        lines, line_col="line", source_col="src", order_col="ord"
    )


def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest data-contract check (operators/curation.
    validate_expectations): four assertions over the transcript batch
    — role in vocabulary, non-empty text, ts inside the load window,
    non-negative turn index — ALL evaluated as conditional sums in one
    scan/one hash aggregate, then unpivoted to a row per rule. Null
    verdicts count as violations (null-hostile contracts by design)."""
    from fluent_plugin_record_reformer_spark.operators.curation import (
        validate_expectations,
    )

    t = _transcripts(spark, sf_dir)
    rules = {
        "role_in_vocab": F.col("role").isin("user", "assistant", "system"),
        "text_nonempty": F.length("text") > 0,
        "ts_in_window": (F.col("ts") >= F.lit("2024-01-01"))
        & (F.col("ts") < F.lit("2025-01-01")),
        "turn_idx_nonneg": F.col("turn_idx") >= 0,
    }
    return validate_expectations(t, rules)


# argmax packing: (n_chars, doc_id-tiebreak) folded into ONE BIGINT so
# the per-cluster keeper is a plain max() — a LONG agg buffer stays
# HashAggregate, where max_by/struct-max fall back to SortAggregate.
# Exact while n_chars * 2^40 < 2^63 and doc_id < 2^40 (both hold by
# orders of magnitude at any document scale we target).
_PACK = 1 << 40


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup endgame: detect (LSH) → cluster (connected
    components) → SELECT THE SURVIVOR — per cluster keep the longest
    document (doc_id as deterministic tiebreak), reported with member
    counts. Keeper selection is a packed-integer argmax (one hash
    aggregate, no per-cluster sort, no SortAggregate fallback); the
    oracle reaches the same keeper via its recursive-CTE components +
    a rank window."""
    from fluent_plugin_record_reformer_spark.operators.dedup import dup_clusters

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_near_dup(
        docs, num_hashes=MINHASH_K, bands=LSH_BANDS, shingle_n=SHINGLE_N,
        threshold=0.5,
    )
    clusters = dup_clusters(pairs)
    memb = clusters.join(docs.select("doc_id", "n_chars"), "doc_id")
    key = F.col("n_chars").cast("long") * F.lit(_PACK) - F.col("doc_id")
    agg = memb.groupBy("cluster_id").agg(
        F.max(key).alias("_k"),
        F.count(F.lit(1)).alias("n_members"),
    )
    # decode: n = ceil(k / PACK) (exact: k < 2^53 at our n_chars),
    # id = n*PACK - k
    keep_chars = F.floor((F.col("_k") + F.lit(_PACK - 1)) / F.lit(_PACK)).cast(
        "long"
    )
    return agg.select(
        "cluster_id",
        (keep_chars * F.lit(_PACK) - F.col("_k")).alias("keep_doc"),
        keep_chars.alias("keep_chars"),
        "n_members",
    )


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent preceding click/view (last-observation-carried-forward via
    ``last(..., ignorenulls=True)`` over the per-user event order —
    one shuffle by user, external sort, NO self-join and no as-of
    probe per purchase). Unattributed purchases (no touch yet) keep a
    null source and are counted, never dropped. Output: per
    (touch_type) attributed purchase counts + exact cents."""
    ev = load_table(spark, sf_dir, "events", fanout=False)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type").isin("click", "view"), F.col("event_type")
        ),
        ignorenulls=True,
    ).over(w)
    purchases = (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .withColumn("touch", F.coalesce("touch", F.lit("none")))
    )
    return purchases.groupBy("touch").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.expr(CENTS)).alias("sum_cents"),
    )


SLIDING_DISTINCT_WIN_S = 6 * 3600
SLIDING_DISTINCT_SLIDE_S = 3 * 3600


def q_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window DISTINCT users (the dashboard "active users per
    6h window, every 3h"): ``F.window`` assigns each event its two
    covering windows, count_distinct per window runs the standard
    two-phase expand — never a per-window self-join. The oracle
    enumerates the covering windows by epoch arithmetic."""
    ev = load_table(spark, sf_dir, "events", fanout=False)
    win = F.window(
        F.col("ts"),
        f"{SLIDING_DISTINCT_WIN_S} seconds",
        f"{SLIDING_DISTINCT_SLIDE_S} seconds",
    )
    return (
        ev.groupBy(win.alias("win"))
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(F.col("win.start").alias("window_start"), "n_users")
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "transcripts": q_transcripts,
    "tag_decompose": q_tag_decompose,
    "reform_flagship": q_reform_flagship,
    "reform_renew": q_reform_renew,
    "renew_time_key": q_renew_time_key,
    "tag_expr": q_tag_expr,
    "route_fanout": q_route_fanout,
    "per_sink_counts": q_per_sink_counts,
    "salted_agg": q_salted_agg,
    "grok_parse": q_grok_parse,
    "enrich_roles": q_enrich_roles,
    "enrich_tools": q_enrich_tools,
    "python_expr": q_python_expr,
    "events_hourly": q_events_hourly,
    "pipeline_e2e": q_pipeline_e2e,
    "dedup_exact": q_dedup_exact,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "simhash": q_simhash,
    "fingerprint": q_fingerprint,
    "language_id": q_language_id,
    "knn_brute": q_knn_brute,
    "knn_ann": q_knn_ann,
    "embed_near_dup": q_embed_near_dup,
    "knn_ivf": q_knn_ivf,
    "conv_stats": q_conv_stats,
    "gap_quantiles": q_gap_quantiles,
    "dup_clusters": q_dup_clusters,
    "decontaminate": q_decontaminate,
    "pii_scrub": q_pii_scrub,
    "domain_quota": q_domain_quota,
    "token_mix": q_token_mix,
    "pack_sequences": q_pack_sequences,
    "weighted_sample": q_weighted_sample,
    "curation_e2e": q_curation_e2e,
    "conv_sessions": q_conv_sessions,
    "top_convs": q_top_convs,
    "kmv_distinct": q_kmv_distinct,
    "deterministic_sample": q_deterministic_sample,
    "media_features": q_media_features,
    "pricing_summary": q_pricing_summary,
    "top_orders": q_top_orders,
    "nation_revenue": q_nation_revenue,
    "parse_errors": q_parse_errors,
    "apache_logs": q_apache_logs,
    "syslog_logs": q_syslog_logs,
    "rfc5424_logs": q_rfc5424_logs,
    "postfix_logs": q_postfix_logs,
    "tomcat_logs": q_tomcat_logs,
    "repetition": q_repetition,
    "heavy_hitters": q_heavy_hitters,
    "ngram_jaccard": q_ngram_jaccard,
    "prefix_jaccard": q_prefix_jaccard,
    "asof_tools": q_asof_tools,
    "range_join": q_range_join,
    "time_rollup": q_time_rollup,
    "sink_top_talkers": q_sink_top_talkers,
    "sliding_rate": q_sliding_rate,
    "funnel": q_funnel,
    "scd2_dim": q_scd2_dim,
    "doc_surprisal": q_doc_surprisal,
    "tfidf": q_tfidf,
    "rate_anomaly": q_rate_anomaly,
    "cohort_retention": q_cohort_retention,
    "markov_transitions": q_markov_transitions,
    "quantile_sketch": q_quantile_sketch,
    "stratified_sample": q_stratified_sample,
    "reservoir_sample": q_reservoir_sample,
    "dense_series": q_dense_series,
    "inverted_index": q_inverted_index,
    "skew_join": q_skew_join,
    "doc_chunks": q_doc_chunks,
    "textrank": q_textrank,
    "log_templates": q_log_templates,
    "role_tool_matrix": q_role_tool_matrix,
    "ip_enrich": q_ip_enrich,
    "edit_near_dup": q_edit_near_dup,
    "zorder_cells": q_zorder_cells,
    "rolling_spend": q_rolling_spend,
    "incremental_agg": q_incremental_agg,
    "concurrency": q_concurrency,
    "trending": q_trending,
    "value_histogram": q_value_histogram,
    "url_parse": q_url_parse,
    "skew_stats": q_skew_stats,
    "mad_outliers": q_mad_outliers,
    "equi_depth": q_equi_depth,
    "anomaly_e2e": q_anomaly_e2e,
    "time_weighted": q_time_weighted,
    "incremental_dedup": q_incremental_dedup,
    "multiline_logs": q_multiline_logs,
    "expectations": q_expectations,
    "dedup_survivors": q_dedup_survivors,
    "attribution": q_attribution,
    "sliding_distinct": q_sliding_distinct,
}


def _docs_dedup_ctes() -> str:
    """Shared CTEs: tokens -> shingles -> base hashes -> minhash
    signature -> bands (mirrors operators/dedup.minhash_lsh stages)."""
    toks = om.sql_word_tokens("text")
    sh = om.sql_shingles("t", SHINGLE_N)
    base = om.sql_shingle_base_hash("s")
    sig = ", ".join(om.sql_minhash_affine("barr", i) for i in range(MINHASH_K))
    rows = MINHASH_K // LSH_BANDS
    bands = ", ".join(
        f"{om.sql_band_key('sig', j, rows)} AS bk{j}" for j in range(LSH_BANDS)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band_idx, bk{j} AS bucket FROM bands"
        for j in range(LSH_BANDS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {toks} AS t FROM documents
), shing AS (
  SELECT doc_id, {sh} AS s FROM toks
), based AS (
  SELECT doc_id, {base} AS barr,
         list_distinct({om.sql_hash60_list("s")}) AS sset FROM shing
), sigs AS (
  SELECT doc_id, [{sig}] AS sig, sset FROM based
), bands AS ( SELECT doc_id, {bands} FROM sigs
), banded AS ( {band_rows} )
"""


# recursive-CTE connected components over the >=0.5-Jaccard LSH pairs,
# ending in `labeled(doc_id, cluster_id)` — shared by the dup_clusters
# and dedup_survivors oracles
CLUSTER_CTES = (
    "WITH RECURSIVE "
    + _docs_dedup_ctes().split("WITH", 1)[1]
    + """
, cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b USING (band_idx, bucket)
  WHERE a.doc_id < b.doc_id
), jp AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.id_a
  JOIN sigs sb ON sb.doc_id = c.id_b
  WHERE round(len(list_intersect(sa.sset, sb.sset))::DOUBLE /
        (len(sa.sset) + len(sb.sset) - len(list_intersect(sa.sset, sb.sset))),
        4) >= 0.5
), edges AS (
  SELECT id_a AS a, id_b AS b FROM jp
  UNION ALL SELECT id_b AS a, id_a AS b FROM jp
), verts AS (SELECT DISTINCT a AS v FROM edges),
reach AS (
  SELECT v, v AS r FROM verts
  UNION
  SELECT e.b AS v, reach.r FROM reach JOIN edges e ON e.a = reach.v
), labeled AS (
  SELECT v AS doc_id, min(r) AS cluster_id FROM reach GROUP BY v
)
"""
)

ORACLE_MINHASH = (
    _docs_dedup_ctes()
    + """
, pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b USING (band_idx, bucket)
  WHERE a.doc_id < b.doc_id
)
SELECT p.id_a, p.id_b,
       round(len(list_intersect(sa.sset, sb.sset))::DOUBLE /
             (len(sa.sset) + len(sb.sset) - len(list_intersect(sa.sset, sb.sset))),
             4) AS jaccard
FROM pairs p
JOIN sigs sa ON sa.doc_id = p.id_a
JOIN sigs sb ON sb.doc_id = p.id_b
"""
)

ORACLE_SIMHASH = f"""
WITH toks AS (
  SELECT doc_id, {om.sql_word_tokens("text")} AS t FROM documents
), v AS (
  SELECT doc_id, {om.sql_simhash_votes("t", 16)} AS votes FROM toks
)
SELECT doc_id, {om.sql_votes_collapse("votes", 16)} AS simhash FROM v
"""

ORACLE_FINGERPRINT = f"""
WITH toks AS (
  SELECT doc_id, text, {om.sql_word_tokens("text")} AS t FROM documents
), shing AS (
  SELECT doc_id, text, {om.sql_shingles("t", SHINGLE_N)} AS s FROM toks
)
SELECT doc_id,
       {om.sql_poly_fingerprint("text")} AS poly_fp,
       {om.sql_minhash60("s", 0)} AS winnow_fp
FROM shing
"""

ORACLE_KNN_BRUTE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings WHERE vec_id < 3
), scored AS (
  SELECT q.query_id, e.vec_id,
         round({om.sql_cosine("e.embedding", "q.query_vec", 64)}, 4) AS cos_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT *, CAST(row_number() OVER
      (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 5
"""

ORACLE_KNN_ANN = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS query_vec,
         {om.sql_signbit_bucket("embedding", 6)} AS bucket
  FROM embeddings WHERE vec_id < 3
), v AS (
  SELECT vec_id, embedding, {om.sql_signbit_bucket("embedding", 6)} AS bucket
  FROM embeddings
), scored AS (
  SELECT q.query_id, v.vec_id,
         round({om.sql_cosine("v.embedding", "q.query_vec", 64)}, 4) AS cos_sim
  FROM v JOIN q USING (bucket)
  WHERE v.vec_id <> q.query_id
), ranked AS (
  SELECT *, CAST(row_number() OVER
      (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 5
"""

ORACLES: dict[str, str] = {
    "transcripts": TRANSCRIPTS_CTE + "SELECT * FROM transcripts",
    "tag_decompose": TRANSCRIPTS_CTE
    + """
    SELECT conv_id, turn_idx, tag,
           coalesce(tool,'none')                     AS last_part,
           'transcripts.' || role                    AS prefix1,
           role || '.' || coalesce(tool,'none')      AS suffix2
    FROM tagged
    """,
    "reform_flagship": TRANSCRIPTS_CTE
    + f"""
    SELECT conv_id, turn_idx,
           'reformed.transcripts.' || role AS tag,
           '{HOSTNAME}'                    AS hostname,
           tag                             AS input_tag,
           coalesce(tool,'none')           AS last_tag,
           text || ', yay!'                AS message
    FROM tagged
    """,
    "reform_renew": TRANSCRIPTS_CTE
    + """
    SELECT 'renewed.transcripts' AS tag, conv_id, turn_idx,
           turn_idx AS idx_native, role AS who
    FROM tagged
    """,
    "renew_time_key": TRANSCRIPTS_CTE
    + """
    SELECT conv_id, turn_idx, 'timeshift.' || tag AS tag,
           to_timestamp(CAST(floor(epoch(ts)) AS BIGINT) + 3600)::TIMESTAMP AS shifted_ts
    FROM tagged
    """,
    "route_fanout": TRANSCRIPTS_CTE
    + """
    SELECT CASE WHEN role = 'user' THEN 'user_turns'
                WHEN role = 'assistant' AND tool = 'auth' THEN 'assistant_auth'
                WHEN role = 'assistant' THEN 'assistant_rest'
                ELSE 'ops' END AS route,
           count(*) AS n_rows
    FROM tagged GROUP BY 1
    """,
    "per_sink_counts": TRANSCRIPTS_CTE
    + """
    SELECT CASE WHEN role = 'user' THEN 'user_turns'
                WHEN role = 'assistant' AND tool = 'auth' THEN 'assistant_auth'
                WHEN role = 'assistant' THEN 'assistant_rest'
                ELSE 'ops' END AS route,
           CAST(substr(conv_id, 6, 4) AS INTEGER) % 8 AS conv_bucket,
           role, tool,
           CAST(hour(ts) AS INTEGER) AS hour,
           count(*) AS n_turns
    FROM tagged GROUP BY 1, 2, 3, 4, 5
    """,
    "salted_agg": TRANSCRIPTS_CTE
    + """
    SELECT role, count(*) AS n_turns, max(turn_idx) AS max_turn
    FROM transcripts GROUP BY role
    """,
    "grok_parse": TRANSCRIPTS_CTE
    + r"""
    SELECT conv_id, turn_idx,
           regexp_extract(text, 'event=(\w+) value=([+-]?\d+(?:\.\d+)?) props=(.*)', 1) AS etype,
           CAST(regexp_extract(text, 'event=(\w+) value=([+-]?\d+(?:\.\d+)?) props=(.*)', 2) AS DOUBLE) AS val,
           regexp_extract(text, 'event=(\w+) value=([+-]?\d+(?:\.\d+)?) props=(.*)', 3) AS props_raw
    FROM transcripts
    """,
    "enrich_roles": TRANSCRIPTS_CTE
    + """
    SELECT t.role, d.role_kind, d.role_rank, count(*) AS n_turns
    FROM transcripts t
    JOIN (VALUES ('user','human',0), ('assistant','model',1),
                 ('system','platform',2), ('tool','machine',3))
         AS d(role, role_kind, role_rank)
      ON t.role = d.role
    GROUP BY 1, 2, 3
    """,
    "enrich_tools": TRANSCRIPTS_CTE
    + """
    SELECT t.tool, d.tool_family, d.networked, count(*) AS n_turns
    FROM transcripts t
    LEFT JOIN (VALUES ('search','retrieval',TRUE), ('browser','retrieval',TRUE),
                      ('python','compute',FALSE), ('calculator','compute',FALSE),
                      ('checkout','commerce',FALSE), ('auth','identity',FALSE))
         AS d(tool, tool_family, networked) ON t.tool = d.tool
    GROUP BY 1, 2, 3
    """,
    "python_expr": TRANSCRIPTS_CTE
    + """
    SELECT conv_id, turn_idx, CAST(length(text) AS INTEGER) AS text_len
    FROM transcripts
    """,
    "events_hourly": """
    SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    "pipeline_e2e": TRANSCRIPTS_CTE
    + r"""
    , parsed AS (
      SELECT tagged.*,
             regexp_extract(text, 'event=(\w+) value=([+-]?\d+(?:\.\d+)?) props=(.*)', 1) AS etype,
             CAST(regexp_extract(text, 'event=(\w+) value=([+-]?\d+(?:\.\d+)?) props=(.*)', 2) AS DOUBLE) AS val
      FROM tagged
    ), enriched AS (
      SELECT p.*, d.role_kind
      FROM parsed p
      LEFT JOIN (VALUES ('user','human'), ('assistant','model'),
                        ('system','platform'), ('tool','machine'))
           AS d(role, role_kind) ON p.role = d.role
    )
    SELECT CASE WHEN 'reformed.transcripts.' || role = 'reformed.transcripts.user' THEN 'user_sink'
                WHEN 'reformed.transcripts.' || role = 'reformed.transcripts.assistant' THEN 'assistant_sink'
                ELSE 'ops_sink' END AS route,
           etype,
           etype || ' by ' || role_kind AS message,
           CAST(substr(conv_id, 6, 4) AS INTEGER) % 8 AS conv_bucket,
           CAST(hour(ts) AS INTEGER) AS hour,
           count(*) AS n_turns,
           round(sum(val), 2) AS sum_val
    FROM enriched
    GROUP BY 1, 2, 3, 4, 5
    """,
    "dedup_exact": """
    SELECT text, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY text
    """,
    "token_count": r"""
    SELECT doc_id,
           len(str_split_regex(trim(text), '\s+')) AS n_ws_tokens,
           len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens
    FROM documents
    """,
    "quality_score": r"""
    SELECT doc_id,
           length(text) AS n_chars_m,
           round(len(regexp_extract_all(text, '[^\w\s]')) / CAST(length(text) AS DOUBLE), 4) AS punct_ratio,
           round(len(regexp_extract_all(text, '\b(the|and|of|to|a|in)\b'))
                 / CAST(greatest(len(regexp_extract_all(text, '[a-z]+')), 1) AS DOUBLE), 4) AS stop_ratio
    FROM documents
    """,
    "minhash_lsh_pairs": ORACLE_MINHASH,
    "simhash": ORACLE_SIMHASH,
    "fingerprint": ORACLE_FINGERPRINT,
    "language_id": f"""
    SELECT doc_id, lang,
           {language_id_oracle_sql("text")} AS lang_pred
    FROM documents
    """,
    "knn_brute": ORACLE_KNN_BRUTE,
    "knn_ann": ORACLE_KNN_ANN,
    "embed_near_dup": f"""
WITH v AS (
  SELECT vec_id, embedding,
         {om.sql_signbit_bucket("embedding", 8)} AS bucket
  FROM embeddings
), ok AS (
  SELECT bucket FROM v GROUP BY bucket HAVING count(*) <= 128
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({om.sql_cosine("a.embedding", "b.embedding", 64)}, 4) AS cos_sim
FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE a.bucket IN (SELECT bucket FROM ok)
  AND round({om.sql_cosine("a.embedding", "b.embedding", 64)}, 4) >= 0.2
""",
    "knn_ivf": f"""
WITH {om.sql_kmeans_ctes(k=16, iters=2, dim=64)[0]}
, c AS (
  SELECT centroid_id, centroid_vec FROM {om.sql_kmeans_ctes(k=16, iters=2, dim=64)[1]}
), va AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {om.sql_cosine("e.embedding", "c.centroid_vec", 64)} DESC,
                      c.centroid_id ASC) AS rnk
  FROM embeddings e CROSS JOIN c
), lists AS (
  SELECT vec_id, embedding, centroid_id FROM va WHERE rnk = 1
), q AS (
  SELECT vec_id AS query_id, embedding AS query_vec
  FROM embeddings WHERE vec_id < 3
), qa AS (
  SELECT q.query_id, q.query_vec, c.centroid_id,
         row_number() OVER (PARTITION BY q.query_id
             ORDER BY {om.sql_cosine("q.query_vec", "c.centroid_vec", 64)} DESC,
                      c.centroid_id ASC) AS rnk
  FROM q CROSS JOIN c
), probes AS (
  SELECT query_id, query_vec, centroid_id FROM qa WHERE rnk <= 2
), scored AS (
  SELECT p.query_id, l.vec_id,
         round({om.sql_cosine("l.embedding", "p.query_vec", 64)}, 4) AS cos_sim
  FROM lists l JOIN probes p USING (centroid_id)
  WHERE l.vec_id <> p.query_id
), ranked AS (
  SELECT *, CAST(row_number() OVER
      (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 5
""",
    "conv_stats": TRANSCRIPTS_CTE
    + """
    , gaps AS (
      SELECT conv_id, role, ts,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT))
                 OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap_s
      FROM transcripts
    )
    SELECT conv_id,
           count(*) AS n_turns,
           CAST(floor(epoch(max(ts))) AS BIGINT)
             - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_s,
           CAST(sum(gap_s) AS BIGINT) AS sum_gap_s,
           count(gap_s) AS n_gaps,
           CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant
    FROM gaps GROUP BY conv_id
    """,
    "asof_tools": TRANSCRIPTS_CTE
    + """
    , dim(tool, effective_from, tier) AS (VALUES
    """
    + ",\n      ".join(
        f"('{t}', TIMESTAMP '{ts}', '{tier}')" for t, ts, tier in TOOL_VERSIONS
    )
    + """
    ), j AS (
      SELECT t.tool AS tool, d.tier AS tier
      FROM transcripts t ASOF LEFT JOIN dim d
        ON t.tool = d.tool AND t.ts >= d.effective_from
    )
    SELECT tool, tier, CAST(count(*) AS BIGINT) AS n_turns
    FROM j GROUP BY 1, 2
    """,
    "funnel": """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' AND user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
    )
    SELECT CAST(1 AS INTEGER) AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
    UNION ALL
    SELECT CAST(2 AS INTEGER), CAST(count(*) AS BIGINT) FROM s2
    UNION ALL
    SELECT CAST(3 AS INTEGER), CAST(count(*) AS BIGINT) FROM s3
    """,
    "sliding_rate": """
    WITH e AS (
      SELECT event_type, CAST(floor(epoch(ts) / 10800) AS BIGINT) AS k0
      FROM events
    ), x AS (
      -- size = 2x slide: every event is in exactly windows k0-1 and k0
      SELECT event_type, k0 - s.k AS k FROM e, (VALUES (0), (1)) s(k)
    )
    SELECT make_timestamp(k * 10800 * 1000000) AS w_start,
           make_timestamp((k * 10800 + 21600) * 1000000) AS w_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM x GROUP BY 1, 2, 3
    """,
    "sink_top_talkers": TRANSCRIPTS_CTE
    + """
    , counts AS (
      SELECT CASE WHEN role = 'user' THEN 'user_turns'
                  WHEN role = 'assistant' AND tool = 'auth' THEN 'assistant_auth'
                  WHEN role = 'assistant' THEN 'assistant_rest'
                  ELSE 'ops' END AS route,
             role || '/' || coalesce(tool, 'none') AS key,
             CAST(count(*) AS BIGINT) AS cnt
      FROM tagged GROUP BY 1, 2
    ), ranked AS (
      SELECT *, CAST(row_number() OVER
          (PARTITION BY route ORDER BY cnt DESC, key ASC) AS INTEGER) AS rank
      FROM counts
    )
    SELECT route, key, cnt, rank FROM ranked WHERE rank <= 3
    """,
    "time_rollup": """
    WITH d AS (
      SELECT event_type AS etype, strftime(ts, '%Y-%m-%d') AS day,
             CAST(hour(ts) AS INTEGER) AS hour, value
      FROM events
    )
    SELECT etype, day, hour,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_val
    FROM d GROUP BY ROLLUP (etype, day, hour)
    """,
    "range_join": """
    WITH iv AS (
      SELECT event_id AS win_id, ts AS win_start,
             ts + INTERVAL 2 HOUR AS win_end
      FROM events WHERE event_type = 'error' AND event_id % 97 = 0
    )
    SELECT e.event_type AS event_type,
           CAST(count(*) AS BIGINT) AS n_hits,
           CAST(count(DISTINCT i.win_id) AS BIGINT) AS n_windows,
           round(sum(e.value), 2) AS sum_val
    FROM events e JOIN iv i ON e.ts BETWEEN i.win_start AND i.win_end
    GROUP BY 1
    """,
    "ngram_jaccard": f"""
    WITH toks AS (
      SELECT doc_id, {om.sql_word_tokens("text")} AS t FROM documents
    ), shing AS (
      SELECT doc_id, {om.sql_shingles("t", SHINGLE_N)} AS s FROM toks
    ), per AS (
      SELECT doc_id, {om.sql_minhash60("s", 0)} AS wfp,
             list_distinct({om.sql_hash60_list("s")}) AS sset
      FROM shing
    ), blk AS (
      SELECT wfp FROM per GROUP BY wfp HAVING count(*) BETWEEN 2 AND 64
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sset, b.sset))::DOUBLE /
                 (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset))),
                 4) AS jaccard
    FROM per a
    JOIN per b ON a.wfp = b.wfp AND a.doc_id < b.doc_id
    JOIN blk ON blk.wfp = a.wfp
    WHERE round(len(list_intersect(a.sset, b.sset))::DOUBLE /
                (len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset))),
                4) >= 0.0
    """,
    # NAIVE all-pairs — the Spark side's prefix filter is an exact
    # candidate scheme, so it must reproduce this bit-for-bit
    "prefix_jaccard": f"""
    WITH toks AS (
      SELECT doc_id, {om.sql_word_tokens("text")} AS t FROM documents
    ), shing AS (
      SELECT doc_id, {om.sql_shingles("t", SHINGLE_N)} AS s FROM toks
    ), sets AS (
      SELECT doc_id, list_distinct({om.sql_hash60_list("s")}) AS sset
      FROM shing
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.sset, b.sset)) AS BIGINT) AS inter_size,
             CAST(len(a.sset) + len(b.sset)
                  - len(list_intersect(a.sset, b.sset)) AS BIGINT) AS union_size
      FROM sets a JOIN sets b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, inter_size, union_size FROM pairs
    WHERE 100 * inter_size >= {PREFIX_JACCARD_PCT} * union_size
    """,
    "heavy_hitters": """
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents
    ), c AS (
      SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY token
    )
    SELECT token, cnt, TRUE AS provably_exact
    FROM c ORDER BY cnt DESC, token ASC LIMIT 15
    """,
    "repetition": """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, 1 AS n, unnest(t) AS g FROM toks
      UNION ALL
      SELECT doc_id, 2, unnest([array_to_string(list_slice(t, i, i+1), ' ')
                                for i in range(1, len(t))]) FROM toks
      UNION ALL
      SELECT doc_id, 3, unnest([array_to_string(list_slice(t, i, i+2), ' ')
                                for i in range(1, len(t)-1)]) FROM toks
    ), cnt AS (
      SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY 1, 2, 3
    ), per_n AS (
      SELECT doc_id, n, sum(c) AS tot,
             sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
      FROM cnt GROUP BY 1, 2
    ), stats AS (
      SELECT doc_id,
             CAST(coalesce(sum(CASE WHEN n=1 THEN tot END), 0) AS BIGINT) AS n_tokens,
             CAST(coalesce(sum(CASE WHEN n=1 THEN dup END), 0) AS BIGINT) AS n_dup_tokens,
             CAST(coalesce(sum(CASE WHEN n=2 THEN tot END), 0) AS BIGINT) AS n_bigrams,
             CAST(coalesce(sum(CASE WHEN n=2 THEN dup END), 0) AS BIGINT) AS n_dup_bigrams,
             CAST(coalesce(sum(CASE WHEN n=3 THEN tot END), 0) AS BIGINT) AS n_trigrams,
             CAST(coalesce(sum(CASE WHEN n=3 THEN dup END), 0) AS BIGINT) AS n_dup_trigrams
      FROM per_n GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(s.n_tokens, 0) AS n_tokens,
           coalesce(s.n_dup_tokens, 0) AS n_dup_tokens,
           coalesce(s.n_bigrams, 0) AS n_bigrams,
           coalesce(s.n_dup_bigrams, 0) AS n_dup_bigrams,
           coalesce(s.n_trigrams, 0) AS n_trigrams,
           coalesce(s.n_dup_trigrams, 0) AS n_dup_trigrams,
           (coalesce(s.n_bigrams, 0) > 0
            AND coalesce(s.n_dup_bigrams, 0) * 100 >= coalesce(s.n_bigrams, 0) * 20)
             AS repetitive
    FROM documents d LEFT JOIN stats s USING (doc_id)
    """,
    "apache_logs": """
    SELECT CASE event_type WHEN 'view' THEN 'GET' WHEN 'click' THEN 'POST'
                WHEN 'purchase' THEN 'PUT' WHEN 'signup' THEN 'DELETE'
                ELSE 'HEAD' END AS verb,
           CAST(200 + (event_id % 3) * 100 AS INT) AS response,
           CAST(count(*) AS BIGINT) AS n_requests,
           CAST(sum(event_id % 5000) AS BIGINT) AS sum_bytes,
           CAST(count(DISTINCT printf('10.%d.%d.%d', user_id % 256,
                event_id % 256, (user_id + event_id) % 256)) AS BIGINT) AS n_ips,
           strftime(min(ts), '%d/%b/%Y:%H:%M:%S') || ' +0000' AS first_ts
    FROM events GROUP BY 1, 2
    """,
    "syslog_logs": """
    SELECT 'svc-' || event_type AS program,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(DISTINCT user_id % 50) AS BIGINT) AS n_hosts,
           CAST(count(DISTINCT user_id % 100) AS BIGINT) AS n_msgs,
           strftime(min(ts), '%b %-d %H:%M:%S') AS first_ts,
           CAST(sum(event_id % 30000 + 1) AS BIGINT) AS sum_pid,
           CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_fac,
           CAST(sum(CASE WHEN event_id % 2 = 0 THEN event_id % 8 END) AS BIGINT)
             AS sum_prio,
           CAST(0 AS BIGINT) AS n_iso
    FROM events GROUP BY 1
    """,
    "rfc5424_logs": """
    SELECT 'app-' || event_type AS app,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(DISTINCT user_id % 50) AS BIGINT) AS n_hosts,
           CAST(sum(event_id % 192) AS BIGINT) AS sum_pri,
           CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_proc,
           CAST(sum(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sd,
           strftime(min(ts), '%Y-%m-%dT%H:%M:%SZ') AS first_ts,
           CAST(count(*) AS BIGINT) AS n_msgs
    FROM events GROUP BY 1
    """,
    "postfix_logs": """
    SELECT CASE event_type WHEN 'view' THEN 'sent' WHEN 'click' THEN 'sent'
                WHEN 'purchase' THEN 'deferred' WHEN 'signup' THEN 'bounced'
                ELSE 'expired' END AS status,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(DISTINCT user_id % 1000) AS BIGINT) AS n_recipients,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_queueids,
           CAST(count(DISTINCT printf('10.0.%d.%d', event_id % 256,
                user_id % 256)) AS BIGINT) AS n_relays,
           CAST(sum((event_id % 20) * 100 + event_id % 100) AS BIGINT)
             AS sum_delay_cents,
           CAST(sum(event_id % 30000 + 1) AS BIGINT) AS sum_pid,
           CAST(count(DISTINCT user_id % 50) AS BIGINT) AS n_hosts,
           strftime(min(ts), '%b %-d %H:%M:%S') AS first_ts,
           CAST(count(*) AS BIGINT) AS n_resp
    FROM events GROUP BY 1
    """,
    "tomcat_logs": """
    SELECT CASE event_type WHEN 'view' THEN 'INFO' WHEN 'click' THEN 'DEBUG'
                WHEN 'purchase' THEN 'WARN' WHEN 'signup' THEN 'ERROR'
                ELSE 'FATAL' END AS level,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(DISTINCT event_id % 7) AS BIGINT) AS n_classes,
           CAST(count(DISTINCT printf('user=%d action=%s', user_id % 100,
                event_type)) AS BIGINT) AS n_msgs,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') || ' +00:00' AS first_ts
    FROM events GROUP BY 1
    """,
    "decontaminate": f"""
WITH toks AS (
  SELECT doc_id, {om.sql_word_tokens("text")} AS t FROM documents
), shing AS (
  SELECT doc_id, {om.sql_shingles("t", SHINGLE_N)} AS s FROM toks
), dh AS (
  SELECT DISTINCT doc_id, unnest({om.sql_hash60_list("s")}) AS h FROM shing
), bh AS (
  SELECT DISTINCT h FROM dh WHERE doc_id % 97 = 0
), agg AS (
  SELECT d.doc_id,
         count(*) AS n_shingles,
         CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated
  FROM dh d LEFT JOIN bh b ON d.h = b.h
  GROUP BY d.doc_id
)
SELECT doc_id, n_shingles, n_contaminated,
       (CAST(n_contaminated AS DOUBLE) / n_shingles) >= 0.2 AS contaminated
FROM agg
""",
    "pii_scrub": f"""
SELECT doc_id,
       {pii_scrub_oracle_sql(
           "text || ' mail u' || CAST(doc_id AS VARCHAR) || '@ex.com'"
           " || ' ip 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)"
           " || ' tel +1 555-000-1234'"
       )} AS scrubbed
FROM documents WHERE doc_id < 100
""",
    "domain_quota": """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn <= 30
""",
    "token_mix": r"""
WITH counted AS (
  SELECT source, doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens
  FROM documents
), cum AS (
  SELECT source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS c
  FROM counted
)
SELECT source,
       count(*) AS n_docs_kept,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens_kept
FROM cum WHERE c <= 2000 GROUP BY source
""",
    "conv_sessions": TRANSCRIPTS_CTE
    + """
    , marked AS (
      SELECT conv_id, turn_idx, ts,
             CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                    - lag(CAST(floor(epoch(ts)) AS BIGINT))
                      OVER (PARTITION BY conv_id ORDER BY turn_idx)
                  > 1800
                  OR lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) IS NULL
             THEN 1 ELSE 0 END AS new_s
      FROM transcripts
    ), sess AS (
      SELECT conv_id, ts,
             sum(new_s) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS session_idx
      FROM marked
    ), per_session AS (
      SELECT conv_id, session_idx,
             count(*) AS n_turns,
             CAST(floor(epoch(max(ts))) AS BIGINT)
               - CAST(floor(epoch(min(ts))) AS BIGINT) AS dur_s
      FROM sess GROUP BY conv_id, session_idx
    )
    SELECT conv_id,
           count(*) AS n_sessions,
           max(n_turns) AS longest_session_turns,
           CAST(max(dur_s) AS BIGINT) AS longest_session_s
    FROM per_session GROUP BY conv_id
    """,
    "curation_e2e": rf"""
WITH gated AS (
  SELECT * FROM documents
  WHERE {language_id_oracle_sql("text")} = 'en'
    AND CAST(len(regexp_extract_all(text, '\b(the|and|of|to|a|in)\b')) AS DOUBLE)
        / greatest(len(regexp_extract_all(text, '[a-z]+')), 1) >= 0.05
), keepers AS (
  SELECT min(doc_id) AS doc_id, arg_min(source, doc_id) AS source, text
  FROM gated GROUP BY text
), sampled AS (
  SELECT * FROM keepers WHERE {sample_gate_sql("doc_id", 0.5, seed=5)}
)
SELECT source, count(*) AS n_docs,
       CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_tokens
FROM sampled GROUP BY source
""",
    "weighted_sample": f"""
WITH weighted AS (
  SELECT source, doc_id,
         (CASE WHEN source = 'src0' THEN 0.5
               WHEN source = 'src1' THEN 0.25 ELSE 0.1 END)
           * least(CAST(n_chars AS DOUBLE) / 400.0, 1.0) AS w
  FROM documents
)
SELECT source, count(*) AS n_kept, min(doc_id) AS first_kept
FROM weighted
WHERE {weighted_gate_sql("doc_id", "w", seed=11)}
GROUP BY source
""",
    "pack_sequences": r"""
WITH counted AS (
  SELECT source, doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens
  FROM documents
), laid AS (
  SELECT source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
           - n_tokens AS start_off
  FROM counted
)
SELECT source,
       CAST(floor(start_off / 512) AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(min(start_off % 512) AS BIGINT) AS first_offset
FROM laid GROUP BY source, bin_id
""",
    "gap_quantiles": TRANSCRIPTS_CTE
    + """
    , gapq AS (
      SELECT role,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT))
                 OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap_s
      FROM transcripts
    )
    """
    + agg_exact_quantiles_oracle_sql(
        "gap_s", ["role"], "gapq", qs=(0.5, 0.9, 0.99), cte=True
    ),
    "dup_clusters": CLUSTER_CTES
    + """
SELECT doc_id, cluster_id FROM labeled
""",
    "attribution": f"""
    WITH t AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type IN ('click', 'view')
                        THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events
    )
    SELECT coalesce(touch, 'none') AS touch,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum({CENTS}) AS BIGINT) AS sum_cents
    FROM t WHERE event_type = 'purchase' GROUP BY 1
    """,
    "sliding_distinct": f"""
    WITH e AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / {SLIDING_DISTINCT_SLIDE_S}) AS BIGINT)
               AS k0
      FROM events
    ), x AS (
      SELECT user_id, k0 - s.k AS k FROM e, (VALUES (0), (1)) s(k)
    )
    SELECT make_timestamp(k * {SLIDING_DISTINCT_SLIDE_S} * 1000000)
             AS window_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM x GROUP BY 1
    """,
    "dedup_survivors": CLUSTER_CTES
    + """
, memb AS (
  SELECT l.cluster_id, l.doc_id, d.n_chars
  FROM labeled l JOIN documents d USING (doc_id)
), ranked2 AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC
         ) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS nm
  FROM memb
)
SELECT cluster_id, doc_id AS keep_doc,
       CAST(n_chars AS BIGINT) AS keep_chars,
       CAST(nm AS BIGINT) AS n_members
FROM ranked2 WHERE rn = 1
""",
    "tag_expr": TRANSCRIPTS_CTE
    + """
    SELECT conv_id, turn_idx, 'routed.' || tool AS tag
    FROM tagged WHERE tool IS NOT NULL
    """,
    "top_convs": TRANSCRIPTS_CTE
    + """
    SELECT conv_id, count(*) AS n_turns
    FROM transcripts GROUP BY conv_id
    ORDER BY n_turns DESC, conv_id ASC
    LIMIT 10
    """,
    "kmv_distinct": TRANSCRIPTS_CTE
    + f"""
    SELECT k.role, k.approx_distinct, e.exact_distinct
    FROM ( {kmv_oracle_sql("conv_id", ["role"], "transcripts", k=64)} ) k
    JOIN (SELECT role, count(DISTINCT conv_id) AS exact_distinct
          FROM transcripts GROUP BY role) e USING (role)
    """,
    "deterministic_sample": TRANSCRIPTS_CTE
    + f"""
    SELECT role, count(*) AS n_turns, count(DISTINCT conv_id) AS n_convs
    FROM transcripts
    WHERE {sample_gate_sql("conv_id", 0.10, seed=7)}
    GROUP BY role
    """,
    "media_features": """
    WITH media AS (
      SELECT t.range AS media_id,
             CAST(t.range % 64 + 32 AS INTEGER) AS width,
             CAST(t.range % 48 + 24 AS INTEGER) AS height,
             md5(md5(CAST(t.range AS VARCHAR))) AS dd
      FROM range(0, 200) t
      WHERE t.range % 2 = 0
    )
    SELECT media_id, width, height,
           round(CAST(('0x' || substr(dd, 1, 2))::BIGINT AS DOUBLE) / 255.0, 6) AS mean_r,
           round(CAST(('0x' || substr(dd, 3, 2))::BIGINT AS DOUBLE) / 255.0, 6) AS mean_g,
           substr(dd, 1, 16) AS phash
    FROM media
    """,
    "pricing_summary": """
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_base_price,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY 1, 2
    """,
    "top_orders": """
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    "nation_revenue": """
    SELECT r_name, n_name,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY 1, 2
    """,
    "parse_errors": TRANSCRIPTS_CTE
    + r"""
    , parsed AS (
      SELECT role,
             nullif(regexp_extract(text, 'event=(purchase|signup) value=([+-]?\d+(?:\.\d+)?) .*', 1), '') AS petype,
             CAST(nullif(regexp_extract(text, 'event=(purchase|signup) value=([+-]?\d+(?:\.\d+)?) .*', 2), '') AS DECIMAL(18,2)) AS pval
      FROM transcripts
    )
    SELECT role,
           count(*) AS n_turns,
           count(petype) AS n_parsed,
           CAST(sum(CASE WHEN petype IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
           CAST(sum(coalesce(pval, CAST(0 AS DECIMAL(18,2)))) * 100 AS BIGINT) AS sum_val_cents
    FROM parsed GROUP BY role
    """,
    "scd2_dim": """
    WITH chg AS (
      SELECT user_id % 40 AS entity, ts, min(event_type) AS status
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT entity, ts, status,
             lag(status) OVER (PARTITION BY entity ORDER BY ts) AS prev,
             row_number() OVER (PARTITION BY entity ORDER BY ts) AS rn
      FROM chg
    ), surv AS (
      SELECT entity, ts, status FROM lagged
      WHERE rn = 1 OR status IS DISTINCT FROM prev
    ), versions AS (
      SELECT entity, status, ts AS valid_from,
             lead(ts) OVER (PARTITION BY entity ORDER BY ts) AS valid_to
      FROM surv
    )
    SELECT status,
           count(*) AS n_versions,
           CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
           CAST(sum(CASE WHEN valid_to IS NOT NULL
                         THEN date_diff('second', valid_from, valid_to)
                         ELSE 0 END) AS BIGINT) AS sum_dur_s,
           min(valid_from) AS first_seen
    FROM versions GROUP BY status
    """,
    "doc_surprisal": """
    WITH toks AS (
      SELECT doc_id, source,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents
    ), vocab AS (
      SELECT token, count(*) AS cnt FROM toks GROUP BY token
      ORDER BY cnt DESC, token LIMIT 16
    ), tot AS (SELECT count(*) AS t FROM toks),
    per_doc AS (
      SELECT doc_id, source, count(*) AS n_tokens,
             CAST(sum(
               (CAST(floor(log2((SELECT t FROM tot))) AS BIGINT) + 1)
               - coalesce(CAST(floor(log2(v.cnt)) AS BIGINT) + 1, 1)
             ) AS BIGINT) AS sum_bits
      FROM toks LEFT JOIN vocab v USING (token)
      GROUP BY doc_id, source
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(sum(sum_bits) AS BIGINT) AS sum_bits,
           CAST(sum(CASE WHEN sum_bits * 2 > 17 * n_tokens
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(sum(sum_bits) AS DOUBLE) / sum(n_tokens) AS avg_bits
    FROM per_doc GROUP BY source
    """,
    "tfidf": """
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), tf AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks
      WHERE term IN ('filter', 'scan', 'slow', 'vector') GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), nd AS (SELECT count(*) AS n_docs FROM documents),
    ranked AS (
      SELECT term, doc_id, tf,
             row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rnk
      FROM tf
    )
    SELECT r.term, r.doc_id, r.tf, d.df,
           round(r.tf * (ln((n_docs + 1) / CAST(df + 1 AS DOUBLE)) + 1), 6) AS tfidf,
           CAST(r.rnk AS INTEGER) AS rnk
    FROM ranked r JOIN dfreq d USING (term) CROSS JOIN nd
    WHERE r.rnk <= 3
    """,
    "rate_anomaly": """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type,
             CAST(sum(cnt) AS BIGINT) AS s,
             CAST(sum(cnt * cnt) AS BIGINT) AS ss,
             CAST(count(*) AS BIGINT) AS n
      FROM hourly GROUP BY 1
    )
    SELECT event_type,
           count(*) AS n_hours,
           CAST(sum(cnt) AS BIGINT) AS sum_cnt,
           max(cnt) AS max_cnt,
           CAST(sum(CASE WHEN (cnt * n - s) * (cnt * n - s)
                              > 4 * (ss * n - s * s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anom
    FROM hourly JOIN stats USING (event_type)
    GROUP BY 1
    """,
    "cohort_retention": """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), firsts AS (
      SELECT user_id, min(d) AS cohort_d FROM days GROUP BY 1
    )
    SELECT date_diff('day', DATE '2024-01-01', cohort_d) // 7 AS cohort_week,
           date_diff('day', cohort_d, d) // 7 AS offset_week,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_active,
           count(*) AS n_user_days
    FROM days JOIN firsts USING (user_id)
    GROUP BY 1, 2
    """,
    "markov_transitions": """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_state
      FROM events
    )
    SELECT event_type AS from_state, to_state,
           CAST(count(*) AS BIGINT) AS n_transitions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys
    FROM seq WHERE to_state IS NOT NULL
    GROUP BY 1, 2
    """,
    "quantile_sketch": bottomk_quantile_sql(
        "value",
        "event_id",
        ["event_type"],
        "events",
        k=QSKETCH_K,
        quantiles=(0.5, 0.9, 0.99),
        seed=QSKETCH_SEED,
    ),
    "stratified_sample": f"""
    WITH kept AS ({stratified_gate_sql(
        "event_id",
        ["event_type"],
        "events",
        target_per_stratum=STRAT_TARGET,
        seed=STRAT_SEED,
    )})
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(event_id) AS BIGINT) AS sum_ids
    FROM kept GROUP BY 1
    """,
    "dense_series": f"""
    WITH counts AS (
      SELECT event_type,
             CAST(floor(epoch_us(ts) / {DENSE_BUCKET_S * 1_000_000}) AS BIGINT) AS bkt,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
    ), spans AS (
      SELECT event_type, min(bkt) AS lo, max(bkt) AS hi FROM counts GROUP BY 1
    ), grid AS (
      SELECT event_type, unnest(generate_series(lo, hi)) AS bkt FROM spans
    )
    SELECT g.event_type,
           make_timestamp(g.bkt * {DENSE_BUCKET_S * 1_000_000}) AS bucket_start,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
    FROM grid g LEFT JOIN counts c USING (event_type, bkt)
    """,
    "reservoir_sample": reservoir_oracle_sql(
        ["source", "doc_id", "lang", "n_chars"],
        ["source"],
        "doc_id",
        "(SELECT doc_id, lang, source, n_chars FROM documents)",
        k=RESERVOIR_K,
        seed=RESERVOIR_SEED,
        rank_as="sample_rank",
    ),
    "inverted_index": f"""
    WITH toks AS (
      SELECT doc_id AS _doc,
             unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      FROM documents
    ), tf AS (
      SELECT term, _doc, CAST(count(*) AS BIGINT) AS _tf
      FROM toks GROUP BY 1, 2
    ), totals AS (
      SELECT term, CAST(count(*) AS BIGINT) AS doc_freq,
             CAST(sum(_tf) AS BIGINT) AS total_tf
      FROM tf GROUP BY 1
    ), ranked AS (
      SELECT term, _doc, _tf,
             row_number() OVER (
               PARTITION BY term ORDER BY _tf DESC, _doc
             ) AS _rnk
      FROM tf
    ), post AS (
      SELECT term,
             string_agg(_doc || ':' || _tf, ',' ORDER BY _rnk) AS postings
      FROM ranked WHERE _rnk <= {INVIDX_POSTINGS} GROUP BY term
    )
    SELECT t.term, t.doc_freq, t.total_tf, p.postings
    FROM totals t JOIN post p USING (term)
    """,
    # the UNSALTED join: parity with the salted Spark plan proves the
    # salt+replicate rewrite is result-identical
    "skew_join": """
    WITH facts AS (
      SELECT event_id, event_type, CAST(ts AS DATE) AS d FROM events
    ), dim AS (
      SELECT event_type, d, CAST(count(*) AS BIGINT) AS day_cnt
      FROM facts GROUP BY 1, 2
    )
    SELECT f.event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(day_cnt) AS BIGINT) AS sum_cnt_sq,
           CAST(count(DISTINCT f.d) AS BIGINT) AS n_days
    FROM facts f JOIN dim USING (event_type, d)
    GROUP BY 1
    """,
    "doc_chunks": f"""
    WITH toks AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), st AS (
      SELECT doc_id, t,
             unnest(list_filter(
               range(1, len(t) + 1, {CHUNK_TOKENS - CHUNK_OVERLAP}),
               s -> s = 1 OR s - {CHUNK_TOKENS - CHUNK_OVERLAP}
                    + {CHUNK_TOKENS} <= len(t)
             )) AS start
      FROM toks WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST((start - 1) // {CHUNK_TOKENS - CHUNK_OVERLAP} + 1 AS INT)
             AS chunk_idx,
           array_to_string(
             list_slice(t, start, start + {CHUNK_TOKENS - 1}), ' '
           ) AS chunk_text,
           CAST(least({CHUNK_TOKENS}, len(t) - start + 1) AS INT)
             AS n_tokens
    FROM st
    """,
    "textrank": (lambda base, d, s, iters: f"""
    WITH toks AS (
      SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t
      FROM documents
    ), pos AS (
      SELECT t, unnest(range(1, len(t))) AS i
      FROM toks WHERE len(t) >= 2
    ), pairs AS (
      SELECT t[i] AS a, t[i + 1] AS b FROM pos WHERE t[i] <> t[i + 1]
    ), directed AS (
      SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
    ), edges AS (
      SELECT a AS src, b AS dst, CAST(count(*) AS BIGINT) AS w
      FROM directed GROUP BY 1, 2
    ), nodes AS (
      SELECT DISTINCT src AS node FROM edges
      UNION SELECT DISTINCT dst AS node FROM edges
    ), wout AS (
      SELECT src, sum(w) AS wt FROM edges GROUP BY 1
    ), ew AS (
      SELECT e.src, e.dst, e.w, wout.wt FROM edges e JOIN wout USING (src)
    ), r0 AS (
      SELECT node, CAST({s} AS BIGINT) AS rank FROM nodes
    )""" + "".join(f""", r{t + 1} AS (
      SELECT n.node,
             CAST({base} + {d} * coalesce(c.sm, 0) // 100 AS BIGINT) AS rank
      FROM nodes n LEFT JOIN (
        SELECT ew.dst AS node, sum(r{t}.rank * ew.w // ew.wt) AS sm
        FROM ew JOIN r{t} ON r{t}.node = ew.src GROUP BY 1
      ) c USING (node)
    )""" for t in range(iters)) + f"""
    SELECT node AS term, rank FROM r{iters}
    """)(
        (TEXTRANK_SCALE * (100 - TEXTRANK_D)) // 100,
        TEXTRANK_D,
        TEXTRANK_SCALE,
        TEXTRANK_ITERS,
    ),
    # DuckDB regexp_replace needs the 'g' flag to match Spark's
    # replace-all default — sql_template_expr pins it.
    "log_templates": f"""
    {TRANSCRIPTS_CTE}
    SELECT {sql_template_expr("text")} AS template,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_keys
    FROM transcripts GROUP BY 1
    """,
    # Spark's pinned pivot leaves an empty cell null; NULLIF(count,0)
    # reproduces that (a present cell's count is always >= 1).
    "role_tool_matrix": f"""
    {TRANSCRIPTS_CTE}
    SELECT role,
           NULLIF(CAST(count(CASE WHEN coalesce(tool, 'none') = 'auth'
                       THEN 1 END) AS BIGINT), 0) AS n_auth,
           NULLIF(CAST(count(CASE WHEN coalesce(tool, 'none') = 'checkout'
                       THEN 1 END) AS BIGINT), 0) AS n_checkout,
           NULLIF(CAST(count(CASE WHEN coalesce(tool, 'none') = 'none'
                       THEN 1 END) AS BIGINT), 0) AS n_none
    FROM transcripts GROUP BY 1
    """,
    "ip_enrich": f"""
    {TRANSCRIPTS_CTE}
    , ips AS (
      SELECT conv_id,
             {om.sql_seeded_hash60("conv_id", IP_SEED)} % 4294967296 AS src_ip
      FROM transcripts
    ), ranges(net_label, ip_lo, ip_hi) AS (
      VALUES {", ".join(f"('{l}', {lo}, {hi})" for l, lo, hi in IP_RANGES)}
    )
    SELECT net_label,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
    FROM ips JOIN ranges ON src_ip BETWEEN ip_lo AND ip_hi
    GROUP BY 1
    """,
    # the oracle is the NAIVE all-pairs levenshtein join (with only a
    # length prefilter); the Spark side's deletion-neighborhood
    # blocking must reproduce it exactly — zero recall loss by proof
    "edit_near_dup": f"""
    WITH s AS (
      SELECT DISTINCT substr(text, 1, {EDIT1_SLUG_LEN}) AS slug
      FROM documents WHERE text IS NOT NULL
    )
    SELECT a.slug AS slug_a, b.slug AS slug_b,
           CAST(levenshtein(a.slug, b.slug) AS INT) AS dist
    FROM s a JOIN s b
      ON a.slug < b.slug
     AND abs(length(a.slug) - length(b.slug)) <= 1
     AND levenshtein(a.slug, b.slug) <= 1
    """,
    "zorder_cells": f"""
    SELECT {sql_zvalue("user_id % 256", "hour(ts)", bits=ZORDER_BITS)} AS z_cell,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
    "rolling_spend": f"""
    SELECT event_id, user_id, ts, {CENTS} AS cents,
           CAST(sum({CENTS}) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {ROLLING_ROWS - 1} PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS roll3_cents
    FROM events
    """,
    # the oracle aggregates the FULL history in one pass — the merged
    # state+delta summaries must reproduce it exactly
    "incremental_agg": f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum({CENTS}) AS BIGINT) AS sum_cents,
           min(ts) AS first_ts,
           max(ts) AS last_ts
    FROM events GROUP BY 1
    """,
    "concurrency": f"""
    {TRANSCRIPTS_CTE}
    , convs AS (
      SELECT conv_id, min(ts) AS s,
             max(ts) + INTERVAL 1 MINUTE AS e
      FROM transcripts GROUP BY 1
    ), deltas AS (
      SELECT s AS t, 1 AS d FROM convs
      UNION ALL
      SELECT e AS t, -1 AS d FROM convs
    ), agg AS (
      SELECT t, sum(d) AS net FROM deltas GROUP BY 1
    )
    SELECT t AS ts,
           CAST(sum(net) OVER (ORDER BY t) AS BIGINT) AS concurrent
    FROM agg
    """,
    "trending": """
    WITH daily AS (
      SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n_events,
           CAST(lag(n_events) OVER (
             PARTITION BY event_type ORDER BY day
           ) AS BIGINT) AS prev_n
    FROM daily
    """,
    "value_histogram": f"""
    SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum({CENTS}) AS BIGINT) AS sum_cents
    FROM events GROUP BY 1
    """,
    "url_parse": f"""
    {TRANSCRIPTS_CTE}
    , urls AS (
      SELECT 'https://api.example.com/v1/' || tool
               || '?conv=' || conv_id
               || '&turn=' || CAST(turn_idx AS VARCHAR) AS url
      FROM transcripts WHERE tool IS NOT NULL
    ), parsed AS (
      SELECT regexp_extract(url, '^https://([^/]+)', 1) AS host,
             regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
             regexp_extract(url, 'conv=([^&]*)', 1) AS conv
      FROM urls
    )
    SELECT host, path,
           CAST(count(*) AS BIGINT) AS n_requests,
           CAST(count(DISTINCT conv) AS BIGINT) AS n_convs
    FROM parsed GROUP BY 1, 2
    """,
    "skew_stats": """
    WITH counts AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_rows
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT event_type, n_rows,
             row_number() OVER (PARTITION BY event_type ORDER BY n_rows) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM counts
    ), qs AS (
      SELECT event_type,
             CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN n_rows END) AS BIGINT) AS p50,
             CAST(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                      THEN n_rows END) AS BIGINT) AS p90,
             CAST(max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                      THEN n_rows END) AS BIGINT) AS p99
      FROM ranked GROUP BY 1
    ), stats AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(n_rows) AS BIGINT) AS max_rows
      FROM counts GROUP BY 1
    )
    SELECT qs.event_type, stats.n_keys, stats.max_rows,
           qs.p50, qs.p90, qs.p99
    FROM qs JOIN stats USING (event_type)
    """,
    "mad_outliers": f"""
    WITH base AS (
      SELECT event_id, event_type, {CENTS} AS cents FROM events
    ), r1 AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM base
    ), med AS (
      SELECT event_type,
             CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN cents END) AS BIGINT) AS group_median
      FROM r1 GROUP BY 1
    ), dev AS (
      SELECT b.event_id, b.event_type, b.cents, m.group_median,
             abs(b.cents - m.group_median) AS absdev
      FROM base b JOIN med m USING (event_type)
    ), r2 AS (
      SELECT event_type, absdev,
             row_number() OVER (PARTITION BY event_type ORDER BY absdev) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM dev
    ), mad AS (
      SELECT event_type,
             CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN absdev END) AS BIGINT) AS group_mad
      FROM r2 GROUP BY 1
    )
    SELECT d.event_id, d.event_type, d.cents, d.group_median,
           md.group_mad, d.absdev > 3 * md.group_mad AS is_outlier
    FROM dev d JOIN mad md USING (event_type)
    """,
    "equi_depth": f"""
    WITH base AS (
      SELECT event_type, {CENTS} AS cents FROM events
    ), ranked AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM base
    )
    SELECT event_type,
           CAST(ceil(rn * {EQUI_BINS} * 1.0 / n) AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(cents) AS BIGINT) AS lo,
           CAST(max(cents) AS BIGINT) AS hi
    FROM ranked GROUP BY 1, 2
    """,
    "anomaly_e2e": f"""
    {TRANSCRIPTS_CTE}
    , daily AS (
      SELECT {sql_template_expr("text")} AS template,
             strftime(ts, '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM transcripts GROUP BY 1, 2
    ), r1 AS (
      SELECT template, n_lines,
             row_number() OVER (PARTITION BY template ORDER BY n_lines) AS rn,
             count(*) OVER (PARTITION BY template) AS n
      FROM daily
    ), med AS (
      SELECT template,
             CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN n_lines END) AS BIGINT) AS group_median
      FROM r1 GROUP BY 1
    ), dev AS (
      SELECT d.template, d.day, d.n_lines, m.group_median,
             abs(d.n_lines - m.group_median) AS absdev
      FROM daily d JOIN med m USING (template)
    ), r2 AS (
      SELECT template, absdev,
             row_number() OVER (PARTITION BY template ORDER BY absdev) AS rn,
             count(*) OVER (PARTITION BY template) AS n
      FROM dev
    ), mad AS (
      SELECT template,
             CAST(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN absdev END) AS BIGINT) AS group_mad
      FROM r2 GROUP BY 1
    )
    SELECT d.template, d.day, d.n_lines, d.group_median,
           md.group_mad, d.absdev > 3 * md.group_mad AS is_outlier
    FROM dev d JOIN mad md USING (template)
    """,
    "time_weighted": f"""
    WITH base AS (
      SELECT event_type, ts, event_id, {CENTS} AS cents FROM events
    ), held AS (
      SELECT event_type, cents,
             epoch_us(lead(ts) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
             )) - epoch_us(ts) AS dur
      FROM base
    )
    SELECT event_type,
           CAST(sum(cents * dur) AS BIGINT) AS sum_weighted,
           CAST(sum(dur) AS BIGINT) AS sum_micros,
           CAST(count(*) AS BIGINT) AS n_holds
    FROM held WHERE dur IS NOT NULL GROUP BY 1
    """,
    "incremental_dedup": _docs_dedup_ctes()
    + """
, pairs AS (
  SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_old
  FROM banded a JOIN banded b USING (band_idx, bucket)
  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
)
SELECT p.id_new, p.id_old,
       round(len(list_intersect(sa.sset, sb.sset))::DOUBLE /
             (len(sa.sset) + len(sb.sset) - len(list_intersect(sa.sset, sb.sset))),
             4) AS jaccard
FROM pairs p
JOIN sigs sa ON sa.doc_id = p.id_new
JOIN sigs sb ON sb.doc_id = p.id_old
""",
    "multiline_logs": """
    WITH errs AS (
      SELECT event_id, user_id, value FROM events
      WHERE event_type = 'error'
    ), lines AS (
      SELECT 'app-' || CAST(user_id % 4 AS VARCHAR) AS src,
             event_id * 3 + k AS ord,
             CASE WHEN k = 0
                  THEN printf('ERR id=%d value=%.2f', event_id, value)
                  ELSE printf('\tat com.example.stage%d(ev%d)', k, event_id)
             END AS line
      FROM errs CROSS JOIN unnest([0, 1, 2]) AS t(k)
    ), seg AS (
      SELECT src, ord, line,
             sum(CASE WHEN regexp_matches(line, '^\\S') THEN 1 ELSE 0 END)
               OVER (PARTITION BY src ORDER BY ord) AS seg_idx
      FROM lines
    )
    SELECT src, CAST(seg_idx AS BIGINT) AS seg_idx,
           seg_idx > 0 AS has_head,
           CAST(count(*) AS BIGINT) AS n_lines,
           string_agg(line, chr(10) ORDER BY ord) AS message
    FROM seg GROUP BY src, seg_idx
    """,
    "expectations": f"""
    {TRANSCRIPTS_CTE}
    , wide AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
        CAST(sum(CASE WHEN role IN ('user', 'assistant', 'system')
                 THEN 0 ELSE 1 END) AS BIGINT) AS v_role,
        CAST(sum(CASE WHEN length(text) > 0 THEN 0 ELSE 1 END)
             AS BIGINT) AS v_text,
        CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-01'
                  AND ts < TIMESTAMP '2025-01-01'
                 THEN 0 ELSE 1 END) AS BIGINT) AS v_ts,
        CAST(sum(CASE WHEN turn_idx >= 0 THEN 0 ELSE 1 END)
             AS BIGINT) AS v_turn
      FROM transcripts
    )
    SELECT 'role_in_vocab' AS rule, v_role AS n_violations, n_rows FROM wide
    UNION ALL
    SELECT 'text_nonempty', v_text, n_rows FROM wide
    UNION ALL
    SELECT 'ts_in_window', v_ts, n_rows FROM wide
    UNION ALL
    SELECT 'turn_idx_nonneg', v_turn, n_rows FROM wide
    """,
}


def _utc(fn: Callable[[SparkSession, str], DataFrame]):
    """Pin the session timezone before planning: the driver supplies its
    own SparkSession, and ``unix_timestamp``/``date_format`` over the
    NTZ timestamps are session-TZ-dependent — the DuckDB oracle always
    treats naive timestamps as UTC."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _utc(q_reform_flagship)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _utc(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
