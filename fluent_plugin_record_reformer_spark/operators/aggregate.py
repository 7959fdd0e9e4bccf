"""Aggregate stage: per-sink rollups with explicit skew handling.

The north rule's per-sink aggregate: ``groupBy(bucket(conv_id), role,
tool, hour(ts)).count()``. Spark's hash aggregate already does
partial (map-side) combine, so plain counts scale; the explicit
salting here is for the genuinely skewed cases — a hot conv_id that
would pin one reducer at 100 TB — and for aggregation functions whose
partial states are re-aggregable.

Two-phase salted aggregation:
  phase 1: groupBy(keys + salt) partial aggs  (splits the hot key
           across `salt_buckets` reducers)
  phase 2: groupBy(keys) re-aggregate partials
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conv_bucket(conv_col: str = "conv_id", n_buckets: int = 32) -> Column:
    """Stable hash bucket of the conversation id — the partition-sizing
    key from the north rule (hash buckets, not raw conv_id, so sink
    partitions stay bounded no matter how conversations skew)."""
    return F.pmod(F.xxhash64(F.col(conv_col)), F.lit(n_buckets)).cast("int")


def per_sink_counts(
    df: DataFrame,
    route_col: str = "route",
    conv_col: str = "conv_id",
    time_col: str = "ts",
    n_buckets: int = 32,
) -> DataFrame:
    """groupBy(route, bucket(conv_id), role, tool, hour(ts)).count()."""
    return (
        df.groupBy(
            F.col(route_col),
            conv_bucket(conv_col, n_buckets).alias("conv_bucket"),
            F.col("role"),
            F.col("tool"),
            F.hour(F.col(time_col)).alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )


def _chunked_ranks(
    vals: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    broadcast_offsets: bool,
) -> tuple[DataFrame, DataFrame]:
    """Global per-group ranks of ``value_col`` WITHOUT a per-group
    single-task sort: range-partition (group, value) into
    order-monotone chunks, row_number within (group, chunk), add
    broadcast per-chunk count offsets (the distributed_running_sum
    layout; same hard invariants — deterministic input, exchange
    reuse enforced fail-fast).

    Returns ``(ranged, counted)``: ``ranged`` is the range-partitioned
    row stream (with ``_chunk``) whose physical exchange a caller may
    REUSE for a same-subtree output branch (how mad_outliers emits its
    row stream without a second scan); ``counted`` adds the global
    1-based rank ``_rn`` and group size ``_n``.
    """
    from pyspark.sql import Window

    from .curation import _require_exchange_reuse

    spark = vals.sparkSession
    _require_exchange_reuse(spark, "_chunked_ranks")
    chunks = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = vals.repartitionByRange(
        chunks, *[F.col(c) for c in group_cols], F.col(value_col)
    ).withColumn("_chunk", F.spark_partition_id())
    w_local = Window.partitionBy(*group_cols, "_chunk").orderBy(value_col)
    local = ranged.withColumn("_lrn", F.row_number().over(w_local))
    cnt = ranged.groupBy(*group_cols, "_chunk").agg(F.count(F.lit(1)).alias("_cc"))
    w_off = Window.partitionBy(*group_cols).orderBy("_chunk")
    off = cnt.select(
        *group_cols, "_chunk", (F.sum("_cc").over(w_off) - F.col("_cc")).alias("_coff")
    )
    tot = cnt.groupBy(*group_cols).agg(F.sum("_cc").alias("_n"))
    if broadcast_offsets:
        off, tot = F.broadcast(off), F.broadcast(tot)
    counted = (
        local.join(off, [*group_cols, "_chunk"])
        .join(tot, list(group_cols))
        .withColumn("_rn", F.col("_lrn") + F.col("_coff"))
    )
    return ranged, counted


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    *,
    out_prefix: str = "p",
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Exact per-group quantiles as k-th order statistics, fully
    distributed and ENGINE-PORTABLE (unlike ``percentile_approx``,
    whose sketch layout is engine-specific and can never pass a
    cross-engine value-hash gate).

    Quantile rule: value at rank ``ceil(q * n)`` (1-based) of the
    group's sorted values — ties in the sort order cannot change the
    selected VALUE, so no tiebreak column is needed.

    Scale shape: the global rank is computed CHUNKED, not by one
    window per group — range-partition (group, value) into
    order-monotone chunks, row_number within each (group, chunk),
    then add broadcast per-chunk count offsets. Parallelism is
    n_groups × n_chunks, so one giant group no longer serializes
    through a single sort task (the same layout as
    curation.distributed_running_sum; a tie straddling a chunk
    boundary permutes ranks WITHIN the tie run only, which cannot
    change the value at any rank). The sort is still the honest cost
    of EXACT quantiles — it is just no longer single-threaded per
    group. (Same hard invariants as distributed_running_sum:
    deterministic input AND spark.sql.exchange.reuse on — the rank and
    count branches must share ONE physical range exchange, since the
    boundary sample is rdd-id-seeded; enforced fail-fast.)

    NULL values are excluded (they carry no order), mirroring SQL
    aggregate semantics on both engines.

    ``broadcast_offsets``: the offsets/totals frames are n_groups ×
    chunks rows; the default pins their broadcast (right for bounded
    group keys like role). Pass False when group cardinality is
    unbounded — a forced broadcast of millions of groups would blow
    the broadcast limit; AQE then sizes the join at runtime.
    """
    vals = df.filter(F.col(value_col).isNotNull()).select(*group_cols, value_col)
    _, counted = _chunked_ranks(
        vals, group_cols, value_col, broadcast_offsets=broadcast_offsets
    )
    rank_of = {q: F.ceil(F.lit(q) * F.col("_n")).cast("long") for q in qs}
    picked = counted.filter(
        F.array_contains(F.array(*rank_of.values()), F.col("_rn"))
    )
    aggs = [
        F.max(F.when(F.col("_rn") == rank_of[q], F.col(value_col))).alias(
            f"{out_prefix}{int(round(q * 100))}"
        )
        for q in qs
    ]
    return picked.groupBy(*group_cols).agg(*aggs)


def exact_quantiles_oracle_sql(
    value_expr: str,
    group_cols: Sequence[str],
    from_clause: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    *,
    out_prefix: str = "p",
    cte: bool = False,
) -> str:
    """DuckDB mirror of :func:`exact_quantiles` (same rank rule).
    ``cte=True`` omits the leading WITH (for appending to an existing
    WITH chain)."""
    groups = ", ".join(group_cols)
    sel = f"{groups}, " if groups else ""
    by = f"GROUP BY {groups}" if groups else ""
    picks = ", ".join(
        f"max(CASE WHEN _rn = CAST(ceil({q} * _n) AS BIGINT) THEN _v END) "
        f"AS {out_prefix}{int(round(q * 100))}"
        for q in qs
    )
    part = f"PARTITION BY {groups}" if groups else ""
    lead = ", " if cte else "WITH "
    return f"""
{lead}ranked AS (
  SELECT {sel}{value_expr} AS _v,
         row_number() OVER ({part} ORDER BY {value_expr}) AS _rn,
         count(*) OVER ({part}) AS _n
  FROM {from_clause} WHERE {value_expr} IS NOT NULL
)
SELECT {sel}{picks} FROM ranked {by}
"""


# aggregation → (phase-1 partial expr, phase-2 merge expr builder)
_REAGG = {
    "count": (lambda c: F.count(F.lit(1)), lambda p: F.sum(p)),
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a random-ish (hash-derived,
    deterministic) salt splitting each group across reducers.

    ``aggs``: out_name → (fn, col) with fn in count/sum/min/max.
    Result equals the unsalted groupBy exactly — proven by the DuckDB
    oracle in __spark_entry__ (q_salted_agg vs plain GROUP BY).
    """
    # Salt from a high-cardinality deterministic hash so the SAME row
    # always lands in the same salt bucket (idempotent reruns), while
    # a hot key's rows spread over all buckets. monotonically_increasing_id
    # would break determinism across partitioning; hash of all columns
    # is stable.
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    partial_exprs = []
    merge_exprs = []
    for out, (fn, col) in aggs.items():
        if fn not in _REAGG:
            raise ValueError(f"aggregation `{fn}` is not re-aggregable")
        partial, merge = _REAGG[fn]
        partial_exprs.append(partial(F.col(col) if col else None).alias(f"__p_{out}"))
        merge_exprs.append(merge(F.col(f"__p_{out}")).alias(out))
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_exprs)
    return phase1.groupBy(*keys).agg(*merge_exprs)


def funnel_stages(
    df: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_events_per_user: int | None = 1_000_000,
) -> DataFrame:
    """Funnel analysis: how many users completed step 1, steps 1-2,
    ... steps 1-N IN ORDER (strictly increasing timestamps), as
    (stage, n_users) rows with n_1 >= n_2 >= ... >= n_N.

    Semantics (the standard earliest-completion greedy, provably
    equivalent to the staged-min formulation the oracle runs):
    t_1 = min ts of step 1; t_k = min ts of step k with ts > t_{k-1};
    a user's reached stage is the largest k with t_k defined.

    Scale shape — ONE scan, ONE shuffle: events filtered to the step
    types, collected per user as a time-sorted (ts, type) array, and
    folded left-to-right with an (stage, last_ts) accumulator. The
    fold is an interpreted HOF but runs over one user's bounded event
    array (the same per-key-array trade as asof_enrich); the
    alternative staged-join formulation scans and shuffles the event
    table once PER STEP. Equal timestamps never advance a stage
    (strict >), so array_sort tie order cannot affect the result.
    Stage counts come from exploding sequence(1, stage) — each user
    contributes one row per completed stage, partial-aggregated —
    left-joined to the full 1..N stage list so an uncompleted stage
    reports (stage, 0) rather than vanishing.

    Null semantics, matched exactly by the oracle's staged-min CTEs:
    rows with a null user or null timestamp are excluded (a funnel is
    undefined without an identity or an order).

    ``max_events_per_user`` bounds the per-user collected array: one
    pathological identity (a bot / load-test user) with 10^8 step
    events would otherwise concentrate into a single giant row and
    task. Like ``bucketed_range_join``'s span guard it fails fast
    IN-PLAN (assert_true) — a runaway identity is an upstream bug, not
    something to silently fold for minutes; ``None`` disables (only
    when per-user volume is known-bounded upstream)."""
    steps = list(steps)
    n = len(steps)
    if n == 0:
        raise ValueError("funnel_stages: steps must be non-empty")
    steps_arr = F.array(*[F.lit(s) for s in steps])
    ev = df.filter(
        F.col(type_col).isin(steps)
        & F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_et"),
    )
    arr = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list(F.struct("_ts", "_et"))).alias("_a")
    )
    ts_type = df.schema[ts_col].dataType  # keep the when-branch struct
    zero = F.struct(                      # types aligned for any ts dtype
        F.lit(0).cast("int").alias("stage"),
        F.lit(None).cast(ts_type).alias("t"),
    )

    def fold(acc, x):
        # CASE WHEN evaluates lazily, guarding element_at past the end
        nxt = F.when(
            acc["stage"] < F.lit(n), F.element_at(steps_arr, acc["stage"] + 1)
        )
        adv = (
            nxt.isNotNull()
            & (x["_et"] == nxt)
            & (acc["t"].isNull() | (x["_ts"] > acc["t"]))
        )
        return F.when(
            adv,
            F.struct((acc["stage"] + 1).cast("int").alias("stage"), x["_ts"].alias("t")),
        ).otherwise(acc)

    stage_col = F.aggregate("_a", zero, fold)["stage"]
    if max_events_per_user is not None:
        guard = F.assert_true(
            F.size("_a") <= F.lit(int(max_events_per_user)),
            F.concat(
                F.lit(
                    f"funnel_stages: a single {user_col} has more than "
                    f"{max_events_per_user} step events (bot/load-test "
                    "identity? raise max_events_per_user or filter it); "
                    "n_events="
                ),
                F.size("_a").cast("string"),
            ),
        )
        # tie the guard into used arithmetic (assert_true yields NULL
        # or throws); a when() with identical branches would be
        # constant-folded away and silently drop the guard. Guard on
        # the LEFT of the add: operands evaluate left-to-right, so the
        # size check throws BEFORE the fold touches the giant array —
        # guard-on-the-right would fold all 10^8 elements first and
        # only then fail (code-review r5)
        stage_col = F.coalesce(guard.cast("int"), F.lit(0)) + stage_col
    reached = arr.select(stage_col.alias("_stage"))
    counts = (
        reached.filter(F.col("_stage") > 0)
        .select(F.explode(F.sequence(F.lit(1), F.col("_stage"))).alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    all_stages = df.sparkSession.range(1, n + 1).select(
        F.col("id").cast("int").alias("stage")
    )
    return all_stages.join(F.broadcast(counts), "stage", "left").select(
        "stage", F.coalesce("n_users", F.lit(0).cast("long")).alias("n_users")
    )


def merge_summaries(
    frames: Sequence[DataFrame],
    *,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge mergeable per-key summaries — the checkpoint-resume /
    incremental-recompute primitive: yesterday's stored aggregate plus
    today's delta aggregate IS the full-history aggregate, without
    rescanning history.

    Every input frame carries the same columns: ``keys`` plus counter
    columns, where each counter is a MERGEABLE statistic (count/sum →
    sum-merge, min → min-merge, max → max-merge; carry avg as its
    (sum, count) pair, never as a ratio — a ratio is not mergeable).
    Output has identical column names, so the merge composes: state
    chains through arbitrarily many deltas, in any grouping, and the
    result is associative and order-free. This is the batch mirror of
    the engine's streaming-state discipline (bounded mergeable
    summaries), and the algebra behind the north rule's "resumable
    from checkpoint" contract: a rerun merges its partial output
    instead of recomputing the world.

    Scale shape: state frames are one row per key by construction, so
    the union + final hash groupBy touches |keys| x |frames| rows —
    partial aggregation collapses each side before the exchange, and
    nothing rescans raw events.
    """
    if not frames:
        raise ValueError("merge_summaries: need at least one frame")
    cols = frames[0].columns
    expected = set(keys) | set(sum_cols) | set(min_cols) | set(max_cols)
    for f in frames:
        if set(f.columns) != expected or len(f.columns) != len(cols):
            raise ValueError(
                f"merge_summaries: frames must share the summary schema "
                f"{sorted(expected)}; got {f.columns}"
            )
    unioned = frames[0].select(*cols)
    for f in frames[1:]:
        unioned = unioned.unionByName(f.select(*cols))
    aggs = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    return unioned.groupBy(*keys).agg(*aggs)


def _histogram_median(
    df: DataFrame, group_cols: Sequence[str], value_col: str, out_name: str
) -> DataFrame:
    """Exact per-group median via a VALUE HISTOGRAM — the low-
    cardinality sibling of the chunked-rank order statistic.

    ``groupBy(group, value).count()`` collapses the input map-side to
    |groups| x |distinct values| rows (guide §2.3: shuffle metadata,
    not payloads), then a cumulative count over the tiny histogram
    picks the smallest value whose running count reaches rank
    ceil(n/2) — the SAME rank-⌈n/2⌉ rule as exact_quantiles, so the
    selected value is identical bit-for-bit. The per-group window
    runs over histogram rows, not data rows: bounded by the value
    domain (the caller's contract), independent of row count.
    """
    from pyspark.sql import Window

    hist = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("_hc"))
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_hcum", F.sum("_hc").over(w)).withColumn(
        "_hn", F.sum("_hc").over(Window.partitionBy(*group_cols))
    )
    half = F.ceil(F.lit(0.5) * F.col("_hn")).cast("long")
    return (
        cum.filter(F.col("_hcum") >= half)
        .groupBy(*group_cols)
        .agg(F.min(value_col).alias(out_name))
    )


def mad_outliers(
    df: DataFrame,
    *,
    value_col: str,
    group_cols: Sequence[str],
    k: int = 3,
    out_col: str = "is_outlier",
    broadcast_offsets: bool = True,
    low_cardinality: bool = False,
) -> DataFrame:
    """Robust outlier flags via the median-absolute-deviation rule:
    a row is an outlier when ``|x - median| > k * MAD``, where MAD is
    the median of ``|x - median|`` within the row's group. Unlike
    z-scores, both center and spread are 50%-breakdown robust — one
    bot user cannot drag the threshold that is supposed to catch it
    (the failure mode of the 2σ rule on heavy-tailed log data).

    Exactness contract: ``value_col`` must be an exact integer
    (cast money to cents upstream). Medians are exact rank-⌈n/2⌉
    order statistics from :func:`exact_quantiles` (the chunked,
    engine-portable layout — no single-task sort per group), absolute
    deviations stay integers, and the flag comparison is pure integer
    arithmetic — so the oracle reproduces every flag bit-for-bit.

    Scale shape (default): two chunked rank passes (the honest cost
    of two exact medians), each a single scan — the MAD pass's range
    exchange is REUSED as the output row stream (its rank branch and
    the emitted rows share one physical shuffle; same-subtree
    ReusedExchange, the distributed_running_sum discipline), so the
    full job is exactly two scans of the input, two range shuffles,
    and two broadcast joins of |groups|-row frames. Rows whose
    ``value_col`` is NULL are excluded (they carry no order — the
    same contract as exact_quantiles).

    ``low_cardinality=True`` (r6): when the caller KNOWS the value
    domain is bounded (integer cents of bounded prices, small-range
    counts — guide §8's "use what you know that the optimizer does
    not"), both medians come from :func:`_histogram_median` instead:
    map-side partial aggregation collapses each pass to |groups| x
    |distinct values| histogram rows, no repartitionByRange, no
    sampling job, no full-row sort — the rows themselves only ever
    cross the wire zero times (flags are a projection over the input
    joined to two broadcast medians). Identical output by
    construction: same rank-⌈n/2⌉ rule, same column order. Do NOT set
    it for unbounded/continuous domains — the histogram would
    approach |rows| and the chunked-rank path wins.
    """
    base = df.filter(F.col(value_col).isNotNull())
    if low_cardinality:
        med = _histogram_median(
            base.select(*group_cols, value_col), group_cols, value_col, "_med"
        )
        med = F.broadcast(med) if broadcast_offsets else med
        with_dev = base.join(med, list(group_cols)).withColumn(
            "_absdev", F.abs(F.col(value_col) - F.col("_med"))
        )
        mad = _histogram_median(
            with_dev.select(*group_cols, "_absdev"), group_cols, "_absdev", "_mad"
        )
        mad = F.broadcast(mad) if broadcast_offsets else mad
        return (
            with_dev.join(mad, list(group_cols))
            .withColumn(out_col, F.col("_absdev") > F.lit(int(k)) * F.col("_mad"))
            .withColumnsRenamed({"_med": "group_median", "_mad": "group_mad"})
            .drop("_absdev")
        )
    med = exact_quantiles(
        base.select(*group_cols, value_col),
        value_col,
        group_cols,
        qs=(0.5,),
        out_prefix="_med",
        broadcast_offsets=broadcast_offsets,
    ).withColumnRenamed("_med50", "_med")
    med = F.broadcast(med) if broadcast_offsets else med
    with_dev = base.join(med, list(group_cols)).withColumn(
        "_absdev", F.abs(F.col(value_col) - F.col("_med"))
    )
    # one chunked rank pass over with_dev: `ranged` carries ALL
    # columns, so the emitted row stream reads the same exchange the
    # MAD rank computation does — no third scan, no recomputed median
    ranged, counted = _chunked_ranks(
        with_dev, group_cols, "_absdev", broadcast_offsets=broadcast_offsets
    )
    half = F.ceil(F.lit(0.5) * F.col("_n")).cast("long")
    mad = counted.groupBy(*group_cols).agg(
        F.max(F.when(F.col("_rn") == half, F.col("_absdev"))).alias("_mad")
    )
    mad = F.broadcast(mad) if broadcast_offsets else mad
    return (
        ranged.join(mad, list(group_cols))
        .withColumn(
            out_col, F.col("_absdev") > F.lit(int(k)) * F.col("_mad")
        )
        .withColumnsRenamed({"_med": "group_median", "_mad": "group_mad"})
        .drop("_absdev", "_chunk")
    )


def equi_depth_bins(
    df: DataFrame,
    *,
    value_col: str,
    group_cols: Sequence[str] = (),
    bins: int,
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Exact equi-depth (quantile) binning: per group, one row per
    bucket with its row count and value span — the feature-bucketing /
    equalized-histogram primitive (equi-WIDTH bins starve on skewed
    data; equi-depth puts ~n/bins rows in every bucket by
    construction).

    Bucket rule: row at global rank r (1-based) lands in
    ``ceil(r * bins / n)`` — pure integer arithmetic on the chunked
    rank (no single-task sort per group), identical in the oracle (we
    deliberately avoid SQL ``ntile()``, whose extras-first split rule
    differs from this formula). Emitting per-BUCKET aggregates rather
    than per-row bins keeps the output stable under rank ties: tied
    values straddling a bucket edge can swap which copy lands where,
    but bucket sizes and spans cannot change.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1: {bins}")
    vals = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, value_col
    )
    _, counted = _chunked_ranks(
        vals, list(group_cols), value_col, broadcast_offsets=broadcast_offsets
    )
    b = F.ceil(F.col("_rn") * F.lit(int(bins)) / F.col("_n")).cast("int")
    return (
        counted.withColumn("bin", b)
        .groupBy(*group_cols, "bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
        )
    )
