"""Training-corpus curation operators: benchmark decontamination, PII
scrubbing, per-domain quotas, token-budget mixing.

These are the selection/cleaning passes a training-data pipeline runs
between dedup and packing. All pure Column expressions / standard
shuffles — each has an exact DuckDB oracle in ``__spark_entry__``.

Scale shapes:
- decontaminate: benchmark n-gram hash set is BROADCAST (benchmarks are
  small — 10^5..10^7 shingles); docs stream through one exploded
  hash-join, re-aggregated per doc. No doc-side shuffle besides the
  per-doc count.
- pii_scrub: pure regexp_replace chain in the scan projection.
- domain_quota / token_budget_mix / pack_sequences: per-group running
  sums computed by ``distributed_running_sum`` — a two-phase layout
  (order-monotone chunks → local windows → broadcast chunk offsets)
  whose parallelism is n_groups × n_chunks, NOT n_groups. A plain
  ``Window.partitionBy(source)`` puts an entire source through ONE
  task; with a handful of sources at 100 TB that is a single-threaded
  scale-killer. The running-sum state machine runs on a SKINNY
  (group, order, count) projection and the heavy text column is
  joined back by the unique order key — trading a second column-pruned
  scan of the doc table for not shuffling text twice.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _exploded_shingle_hashes

# Applied IN ORDER (emails contain dots that would otherwise partly
# match the IP pattern). Patterns are deliberately in the common
# subset of Java regex (Spark) and RE2 (DuckDB).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
)


def pii_scrub(col: Column | str, patterns: Sequence[tuple[str, str]] = PII_PATTERNS) -> Column:
    """Redact PII-looking spans, in pattern order."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, repl in patterns:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_scrub_oracle_sql(expr: str, patterns: Sequence[tuple[str, str]] = PII_PATTERNS) -> str:
    """DuckDB mirror (global replace needs the explicit 'g' option)."""
    out = expr
    for pat, repl in patterns:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Benchmark contamination check: fraction of a doc's DISTINCT
    token-shingle hashes that appear in the benchmark set.

    Returns (id, n_shingles, n_contaminated, contaminated). The flag
    compares an exact int/int double division against the threshold —
    bit-identical across engines. The benchmark hash set is broadcast;
    the doc side is one explode + hash + join + per-doc count."""
    doc_h = _exploded_shingle_hashes(
        docs, text_col=text_col, id_col=id_col, shingle_n=shingle_n
    ).dropDuplicates([id_col, "_h60"])
    bench_h = (
        _exploded_shingle_hashes(
            benchmark, text_col=text_col, id_col=id_col, shingle_n=shingle_n
        )
        .select(F.col("_h60").alias("_bh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = doc_h.join(
        F.broadcast(bench_h), doc_h["_h60"] == bench_h["_bh"], "left"
    )
    agg = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_contaminated"),
    )
    ratio = F.col("n_contaminated").cast("double") / F.col("n_shingles")
    return agg.select(
        id_col,
        "n_shingles",
        "n_contaminated",
        (ratio >= F.lit(threshold)).alias("contaminated"),
    )


def _require_exchange_reuse(spark, op: str) -> None:
    """Fail fast when ``spark.sql.exchange.reuse`` is off: the chunked
    two-branch layouts are only correct when both branches physically
    share ONE range exchange. The range boundary sample is seeded by
    the rdd id, so independently materialized "identical" exchanges
    sample different boundaries once per-partition sampling kicks in
    (always, at scale) and the offsets join silently misaligns."""
    if str(spark.conf.get("spark.sql.exchange.reuse", "true")).lower() != "true":
        raise RuntimeError(
            f"{op} requires spark.sql.exchange.reuse=true: with reuse "
            "disabled the local and offsets branches materialize the "
            "range exchange independently, and its boundary sample is "
            "rdd-id-seeded — chunk assignments diverge between branches "
            "and results are silently corrupted"
        )


def distributed_running_sum(
    df: DataFrame,
    *,
    group_col: str,
    order_col: str,
    val: Column,
    chunks: int | None = None,
    out_col: str = "_cum",
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Per-group running sum of ``val`` in ``order_col`` order, with
    parallelism n_groups × n_chunks instead of one task per group.

    Layout (all deterministic — final sums are independent of where
    chunk boundaries land, so AQE coalescing or resampled range
    boundaries cannot change results):

    1. range-partition the skinny (group, order, val) projection by
       (group, order) into ``chunks`` ORDER-MONOTONE spans; the span id
       is ``spark_partition_id()`` (monotone in (group, order) because
       range boundaries compare tuples lexicographically);
    2. local running sum per (group, span) — each window partition is
       one span, not one whole group;
    3. per-span totals (tiny: n_groups × chunks rows) → exclusive
       prefix offsets per span via a window over the TINY frame;
    4. broadcast the offsets back; global cum = local cum + span offset.

    ``order_col`` must be unique within a group (callers use doc_id)
    for the result to be well-defined, the INPUT must be deterministic
    (file scans are), and ``spark.sql.exchange.reuse`` MUST be on — a
    hard correctness invariant, enforced with a fail-fast check, not
    just a speed assumption: the local-sum and chunk-total branches
    reference the same range exchange, and once the boundary sample
    actually samples (rows-per-partition > rangeExchange.
    sampleSizePerPartition — i.e. ALWAYS at scale) its seed is derived
    from the rdd id, so two independent materializations of "the same"
    exchange land DIFFERENT chunk boundaries and the offsets join
    silently misaligns (measured: nondeterministically wrong quantiles
    with reuse disabled at 4 chunks / 2000 rows). Returns one row per
    input row: (group_col, order_col, _val, out_col).

    ``broadcast_offsets``: the offsets frame is n_groups × chunks rows
    — tiny for bounded-cardinality groups (source, role: the
    pack_sequences / token_budget_mix / exact_quantiles callers), so
    the default pins the broadcast regardless of stats. Callers whose
    group key is UNBOUNDED (domain_quota groups by domain) must pass
    False: a forced broadcast of millions-of-groups × chunks rows
    would blow the driver/broadcast limit at exactly the scale the
    chunked layout exists for, and AQE's runtime size check picks
    broadcast-vs-shuffle correctly there."""
    spark = df.sparkSession
    _require_exchange_reuse(spark, "distributed_running_sum")
    if chunks is None:
        chunks = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    slim = df.select(F.col(group_col), F.col(order_col), val.alias("_val"))
    ranged = slim.repartitionByRange(
        chunks, F.col(group_col), F.col(order_col)
    ).withColumn("_chunk", F.spark_partition_id())
    # phase-2 totals read `ranged` pre-window; Spark's ReuseExchange
    # dedupes the range shuffle between the two branches
    totals = ranged.groupBy(group_col, "_chunk").agg(F.sum("_val").alias("_ctot"))
    w_off = Window.partitionBy(group_col).orderBy("_chunk")
    offsets = totals.select(
        group_col,
        "_chunk",
        (F.sum("_ctot").over(w_off) - F.col("_ctot")).alias("_coff"),
    )
    w_local = Window.partitionBy(group_col, "_chunk").orderBy(order_col)
    local = ranged.withColumn("_lcum", F.sum("_val").over(w_local))
    if broadcast_offsets:
        offsets = F.broadcast(offsets)
    return local.join(offsets, [group_col, "_chunk"]).select(
        group_col,
        order_col,
        "_val",
        (F.col("_lcum") + F.col("_coff")).alias(out_col),
    )


def domain_quota(
    df: DataFrame,
    *,
    domain_col: str = "source",
    quota: int,
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``quota`` rows per domain, chosen by a
    DETERMINISTIC order key (not arbitrary task order) so reruns and
    repartitions keep the same rows. The rank is a distributed running
    count (row_number == running sum of 1 under a unique order key), so
    no single task ever owns a whole domain; kept keys join back on the
    unique order key (AQE broadcasts the kept side when the quota cut
    is small)."""
    rn = distributed_running_sum(
        df,
        group_col=domain_col,
        order_col=order_col,
        val=F.lit(1).cast("long"),
        out_col="_qrn",
        # domain cardinality is unbounded by contract — never force the
        # offsets broadcast; AQE decides at runtime (ADVICE r3)
        broadcast_offsets=False,
    )
    kept = rn.filter(F.col("_qrn") <= quota).select(domain_col, order_col)
    return df.join(kept, [domain_col, order_col]).select(*df.columns)


def pack_sequences(
    df: DataFrame,
    *,
    seq_len: int,
    group_col: str = "source",
    text_col: str = "text",
    order_col: str = "doc_id",
) -> DataFrame:
    """Concat-then-split sequence packing: documents are laid out
    end-to-end in deterministic order within each group, and each doc
    is assigned the training sequence (bin) its FIRST token lands in —
    ``bin = floor(start_offset / seq_len)``.

    This is the standard "pack documents into fixed-length pretraining
    sequences" layout, computed with one window (running token sum)
    per group — no driver loop, no greedy bin state. A doc spanning a
    boundary belongs to the bin it starts in (the downstream tokenizer
    splits it); ``start_offset % seq_len`` tells it where.
    """
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    cum = distributed_running_sum(
        df, group_col=group_col, order_col=order_col, val=n_tokens.cast("long")
    )
    enriched = cum.select(
        group_col,
        order_col,
        F.col("_val").alias("n_tokens"),
        (F.col("_cum") - F.col("_val")).alias("_start"),
    )
    return (
        df.join(enriched, [group_col, order_col])
        .withColumn("bin_id", F.floor(F.col("_start") / seq_len).cast("long"))
        .withColumn("bin_offset", (F.col("_start") % seq_len).cast("long"))
        .drop("_start")
    )


def token_budget_mix(
    df: DataFrame,
    *,
    group_col: str = "source",
    budget: int,
    text_col: str = "text",
    order_col: str = "doc_id",
) -> DataFrame:
    """Data mixing: per group, keep docs (in deterministic order) while
    the RUNNING token total stays within ``budget`` — the standard
    per-source token-budget cut. A doc is kept iff the cumulative
    count INCLUDING it is <= budget (so one oversized head doc is
    dropped, not truncated)."""
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    cum = distributed_running_sum(
        df, group_col=group_col, order_col=order_col, val=n_tokens.cast("long")
    )
    kept = cum.filter(F.col("_cum") <= budget).select(
        group_col, order_col, F.col("_val").alias("n_tokens")
    )
    return df.join(kept, [group_col, order_col])


def repetition_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dup_bigram_pct: int = 20,
) -> DataFrame:
    """Repetition-based quality signals (the classic corpus filters à
    la Gopher's repetition rules): per document, the duplicated
    fraction of token occurrences and of word 2-/3-gram occurrences —
    a document dominated by repeated n-grams is boilerplate/spam.

    All outputs cross the oracle boundary as EXACT integers (totals and
    duplicated-occurrence counts per n; the ``repetitive`` flag is an
    integer cross-multiplication ``dup*100 >= tot*pct``), never rounded
    floats.

    Round-6 shape: ZERO shuffles. The output is one row per input row,
    and every count depends only on that row's own grams — so instead
    of the r5 tagged explode + two groupBys (which shuffled ~3x the
    token volume as gram strings twice), each document counts its own
    duplicates in a projection: sort the gram array, then an
    occurrence is duplicated iff it equals a sorted neighbor, so
    ``dup = T - #singletons`` with a singleton being an element equal
    to NEITHER neighbor. Exact string equality (no hashing), identical
    counts by construction: T = Σ c_g, singletons contribute c=1, so
    T - #singletons = Σ_{c_g>1} c_g — the old explode-and-count
    definition. The plan is Scan -> Project: embarrassingly parallel
    at any scale, nothing crosses the wire."""
    from ..functions.text import word_tokens

    def grams(toks: Column, n: int) -> Column:
        g = F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
        return F.when(F.size(toks) >= n, g).otherwise(
            F.array().cast("array<string>")
        )

    def dup_count(sorted_col: str) -> Column:
        """Duplicated-occurrence count over a SORTED gram array column:
        T minus the number of elements equal to neither neighbor.
        Takes a column NAME on purpose — an attribute reference is
        evaluated once per row, where an inline array_sort expression
        tree would be re-evaluated at every element_at site (the
        staging discipline of _regex_parse_single_pass)."""
        srt = F.col(sorted_col)
        t = F.size(srt)
        singletons = F.size(
            F.filter(
                F.sequence(F.lit(1), t),
                lambda i: (
                    (i == F.lit(1))
                    | (F.element_at(srt, i) != F.element_at(srt, i - 1))
                )
                & ((i == t) | (F.element_at(srt, i) != F.element_at(srt, i + 1))),
            )
        )
        # empty array: sequence(1,0) is [1,0]-descending in Spark —
        # guard explicitly rather than rely on it
        return F.when(t > 0, (t - singletons).cast("long")).otherwise(F.lit(0).cast("long"))

    base = df.select(F.col(id_col), word_tokens(F.col(text_col)).alias("_t"))
    # each stage its own projection: gram arrays, then their sorts,
    # then the counts — CollapseProject keeps multiply-referenced
    # non-cheap aliases staged instead of inlining them per use site
    staged = base.select(
        F.col(id_col),
        *[grams(F.col("_t"), n).alias(f"_g{n}") for n in (1, 2, 3)],
    )
    sorted_stage = staged.select(
        F.col(id_col),
        *[F.size(f"_g{n}").cast("long").alias(f"_t{n}") for n in (1, 2, 3)],
        *[F.array_sort(f"_g{n}").alias(f"_s{n}") for n in (1, 2, 3)],
    )
    out = sorted_stage.select(
        F.col(id_col),
        F.col("_t1").alias("n_tokens"),
        dup_count("_s1").alias("n_dup_tokens"),
        F.col("_t2").alias("n_bigrams"),
        dup_count("_s2").alias("n_dup_bigrams"),
        F.col("_t3").alias("n_trigrams"),
        dup_count("_s3").alias("n_dup_trigrams"),
    )
    return out.withColumn(
        "repetitive",
        (F.col("n_bigrams") > 0)
        & (F.col("n_dup_bigrams") * 100 >= F.col("n_bigrams") * dup_bigram_pct),
    )


def validate_expectations(
    df: DataFrame,
    rules: "dict[str, Column]",
) -> DataFrame:
    """Data-contract validation: one output row per rule with exact
    violation counts — the schema/range/regex assertions a pipeline
    runs on every ingest batch before promoting it.

    ``rules`` maps rule name → a BOOLEAN Column that is true when the
    row SATISFIES the rule (a null verdict counts as a violation —
    null-hostile contracts are the point of validating). All rules
    evaluate in ONE scan as conditional sums inside a single hash
    aggregate (no per-rule pass, no driver loop); the wide one-row
    aggregate then unpivots via ``stack`` — |rules| rows, zero extra
    shuffles. Partial aggregation makes the scan's shuffle one row
    per partition regardless of input size.
    """
    if not rules:
        raise ValueError("validate_expectations: need at least one rule")
    import re as _re

    bad = [n for n in rules if not _re.fullmatch(r"[A-Za-z0-9_.\- ]+", n)]
    if bad:
        # rule names are spliced into a stack() SQL literal
        raise ValueError(
            f"validate_expectations: rule name(s) {bad} contain characters "
            "outside [A-Za-z0-9_.- ]"
        )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (_, cond) in enumerate(rules.items()):
        aggs.append(
            F.sum(
                F.when(cond.isNull() | ~cond, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"_v{i}")
        )
    wide = df.agg(*aggs)
    names = list(rules)
    pairs = ", ".join(
        f"'{n}', _v{i}" for i, n in enumerate(names)
    )
    return wide.select(
        F.expr(f"stack({len(names)}, {pairs}) AS (rule, n_violations)"),
        F.col("_n").alias("n_rows"),
    ).select("rule", "n_violations", "n_rows")
