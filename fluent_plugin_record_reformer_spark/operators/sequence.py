"""Ordered-sequence analytics over per-key event streams.

The reference engine guarantees in-order event delivery within a tag
chunk (reference lib/fluent/plugin/out_record_reformer.rb `es.each`
loop — events are processed in arrival order); these operators
generalize that ordering guarantee to distributed history: each key's
events are totally ordered by an explicit (ts, tiebreak) pair, and
adjacent-pair statistics (Markov transitions, inter-event gaps) are
derived from that order.

Scale shape: ``lead()`` over ``Window.partitionBy(key)`` shuffles by
key once and sort-spills each partition — the sort is external
(spillable to disk), so unlike a ``collect_list`` sequence buffer a
pathological hot key degrades to disk I/O instead of an executor OOM.
That is why this module uses lag/lead windows and NEVER materializes a
per-key array.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def transitions(
    df: DataFrame,
    *,
    key_col: str,
    state_col: str,
    order_cols: Sequence[str],
    out_from: str = "from_state",
    out_to: str = "to_state",
) -> DataFrame:
    """Adjacent state pairs per key, in event order.

    Returns one row per consecutive event pair ``(key, from_state,
    to_state)`` — the raw material for a Markov transition matrix,
    funnel-free flow analysis, or anomaly scoring on improbable
    transitions. The last event of each key (no successor) is dropped.

    ``order_cols`` must be a DETERMINISTIC total order within a key
    (include a unique id as the final tiebreak column); otherwise the
    pairing — and any cross-engine comparison — is ambiguous on ties.
    """
    ordering = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*ordering)
    nxt = F.lead(state_col).over(w)
    return (
        df.select(key_col, state_col, *order_cols)
        .withColumn("_next", nxt)
        .filter(F.col("_next").isNotNull())
        .select(
            F.col(key_col),
            F.col(state_col).alias(out_from),
            F.col("_next").alias(out_to),
        )
    )


def transition_matrix(
    df: DataFrame,
    *,
    key_col: str,
    state_col: str,
    order_cols: Sequence[str],
) -> DataFrame:
    """First-order Markov transition counts over per-key sequences.

    One output row per observed ``(from_state, to_state)`` pair with
    the pair count and the number of distinct keys exhibiting it. The
    heavy input collapses through two hash aggregations (both with
    map-side partial agg); the only sort in the plan is the per-key
    window order that DEFINES the semantics.
    """
    t = transitions(
        df, key_col=key_col, state_col=state_col, order_cols=order_cols
    )
    return t.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.countDistinct(key_col).alias("n_keys"),
    )


def dense_counts(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    *,
    bucket_seconds: int,
    max_buckets_per_key: int | None = 100_000,
    count_col: str = "n_events",
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Zero-filled per-key time series: one row per (key, time bucket)
    for EVERY bucket between each key's first and last event, with
    ``count_col`` = 0 where the key was silent — the gap-filling
    resample behind rate dashboards, anomaly baselines, and
    "series must be dense" downstream models (a groupBy alone emits
    nothing for silent hours, so a naive consumer never sees the gap).

    Scale shape: counts partial-aggregate per (key, bucket) FIRST, so
    the explode that generates the dense grid runs over one row per
    key (the per-key min/max span), never over raw events; the grid
    left-joins back to the aggregated counts — both sides are already
    small. Buckets are exact integer epoch-micros floors (no float, no
    timezone arithmetic; the session is UTC-pinned either way).

    ``max_buckets_per_key`` fail-fast guards the grid fan-out in-plan
    (a key spanning years at 1s buckets is an upstream bug, not
    something to silently explode — same discipline as
    ``bucketed_range_join``); ``None`` disables.
    """
    clash = {"_bkt", "_lo", "_hi"} & set(df.columns)
    if clash:
        raise ValueError(
            f"dense_counts working columns clash with input: {sorted(clash)}"
        )
    keys = list(key_cols)
    b = int(bucket_seconds) * 1_000_000
    bkt = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(b)
    ).cast("long")
    counts = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(*keys, bkt.alias("_bkt"))
        .agg(F.count(F.lit(1)).alias(count_col))
    )
    spans = counts.groupBy(*keys).agg(
        F.min("_bkt").alias("_lo"), F.max("_bkt").alias("_hi")
    )
    lo = F.col("_lo")
    if max_buckets_per_key is not None:
        span = F.col("_hi") - F.col("_lo") + F.lit(1)
        guard = F.assert_true(
            span <= F.lit(int(max_buckets_per_key)),
            F.concat(
                F.lit(
                    f"dense_counts: key spans more than "
                    f"{max_buckets_per_key} buckets of {bucket_seconds}s "
                    f"(raise bucket_seconds or max_buckets_per_key); span="
                ),
                span.cast("string"),
            ),
        )
        # guard on the LEFT of the add (binary ops null-short-circuit
        # on a NULL left operand; _lo is non-null here, but the
        # convention is uniform across all in-plan guards)
        lo = F.coalesce(guard.cast("long"), F.lit(0)) + lo
    grid = spans.select(
        *keys, F.explode(F.sequence(lo, F.col("_hi"))).alias("_bkt")
    )
    dense = grid.join(counts, keys + ["_bkt"], "left")
    return dense.select(
        *keys,
        F.timestamp_micros(F.col("_bkt") * F.lit(b)).alias(bucket_col),
        F.coalesce(F.col(count_col), F.lit(0)).alias(count_col),
    )


def rolling_sum(
    df: DataFrame,
    *,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    window_rows: int,
    out_col: str = "rolling_sum",
) -> DataFrame:
    """Per-key trailing-window sum over the last ``window_rows`` events
    (inclusive of the current one), in event order — the moving
    aggregate behind burn-rate meters, trailing-spend counters, and
    smoothed rate series.

    Semantics are the SQL frame ``ROWS BETWEEN window_rows-1 PRECEDING
    AND CURRENT ROW`` over ``PARTITION BY key ORDER BY order_cols`` —
    which is exactly what the oracle runs. ``order_cols`` must be a
    deterministic total order within a key (end with a unique id).

    Scale shape: same contract as the rest of this module — ONE
    shuffle by key, a per-partition EXTERNAL sort (spillable; a hot
    key degrades to disk, not OOM), and a constant-size running frame:
    Spark's window evaluator holds only the ``window_rows`` frame rows
    per key, never the whole partition, so memory is O(window_rows).
    Sum over an exact-integer ``value_col`` (cast money to cents
    upstream) keeps the result bit-stable under any partitioning —
    floats in a sliding frame would accumulate rounding differently
    per split.
    """
    if window_rows < 1:
        raise ValueError(f"window_rows must be >= 1: {window_rows}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(F.col(value_col)).over(w))


def interval_concurrency(
    intervals: DataFrame,
    *,
    group_col: str,
    start_col: str,
    end_col: str,
    out_col: str = "concurrent",
) -> DataFrame:
    """Sweep-line concurrency: for each group, how many intervals are
    in flight after each boundary instant — the "concurrent sessions /
    conversations / connections over time" curve behind capacity
    planning and saturation alerts.

    Half-open semantics ``[start, end)``: an interval ending exactly
    when another starts never overlaps it. Output: one row per
    (group, distinct boundary time) with the concurrency ON
    ``[t, next boundary)``; the curve is piecewise constant between
    boundaries and ends at 0 (every +1 meets its -1).

    Scale shape — the classic sweep is a GLOBAL ordered cumulative
    sum, the one thing a naive ``Window.orderBy`` serializes onto a
    single task. Here: boundary deltas (+1 at start, -1 at end)
    pre-aggregate per (group, instant) — making the order key unique
    within each group — then flow through
    ``curation.distributed_running_sum``, the order-monotone chunked
    prefix sum (parallelism = chunks, offsets broadcast back). No
    single-task window, no interval explodes, exact integer counts.
    """
    from fluent_plugin_record_reformer_spark.operators.curation import (
        distributed_running_sum,
    )

    # Drop intervals with a NULL boundary BEFORE the delta union
    # (ADVICE r5): filtering null boundary rows individually after the
    # union would let a non-null start with a null end contribute a +1
    # with no matching -1, permanently inflating the curve and
    # breaking the every-(+1)-meets-its-(-1) invariant the docstring
    # promises.
    intervals = intervals.filter(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    )
    starts = intervals.select(
        F.col(group_col), F.col(start_col).alias("_t"), F.lit(1).alias("_d")
    )
    ends = intervals.select(
        F.col(group_col), F.col(end_col).alias("_t"), F.lit(-1).alias("_d")
    )
    deltas = (
        starts.unionByName(ends)
        .groupBy(group_col, "_t")
        .agg(F.sum("_d").alias("_net"))
    )
    cum = distributed_running_sum(
        deltas,
        group_col=group_col,
        order_col="_t",
        val=F.col("_net").cast("long"),
        out_col=out_col,
    )
    return cum.select(
        F.col(group_col),
        F.col("_t").alias("ts"),
        F.col(out_col).cast("long").alias(out_col),
    )


def time_weighted_sums(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Per-key time-weighted aggregation inputs for gauge-style
    metrics: each observation holds until the key's NEXT observation
    (last-observation-carried-forward), so its weight is that holding
    duration. Emits exact integer sums — ``sum_weighted = Σ value·Δµs``
    and ``sum_micros = Σ Δµs`` — from which callers derive the
    time-weighted mean as one division (the unweighted mean of a gauge
    over-counts chatty periods; this is the standard telemetry fix).

    The last observation of each key has no successor: zero duration,
    contributing nothing — equivalently, the average is over the key's
    observed span. Exactness contract: integer ``value_col`` (cents,
    bytes, permille); products stay in BIGINT (|value·Δµs| must fit —
    fine for year-scale spans times cent-scale gauges).

    Scale shape: one shuffle by key + the module's usual external
    per-key sort for ``lead()``; sums are order-free partial
    aggregations, so the result is bit-stable under any partitioning.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_tiebreak]
    w = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(F.unix_micros(F.col(ts_col).cast("timestamp"))).over(w)
    dur = nxt - F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (
        df.withColumn("_dur", dur)
        .filter(F.col("_dur").isNotNull())
        .groupBy(key_col)
        .agg(
            F.sum(F.col(value_col) * F.col("_dur")).alias("sum_weighted"),
            F.sum("_dur").alias("sum_micros"),
            F.count(F.lit(1)).alias("n_holds"),
        )
    )
