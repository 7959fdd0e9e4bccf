"""Interval (range) join without a cartesian product: facts whose
timestamp falls inside [start, end] of an intervals table.

Spark has no native range-join optimization: a plain
``facts.join(intervals, ts BETWEEN start AND end)`` has no equality
key, so Catalyst plans BroadcastNestedLoopJoin (or a cartesian) — an
O(|facts| x |intervals|) comparison that is the single most common
accidental scale-killer in log analytics (alert windows, maintenance
windows, session attribution).

The standard fix, implemented here: quantize time into fixed-width
buckets. Each interval is exploded to the buckets it covers, each fact
keys into exactly one bucket, and the join becomes a plain EQUALITY
join on the bucket id (hash-partitioned, AQE-skew-handled, works
shuffled OR broadcast) followed by the exact ``BETWEEN`` residual
filter. Cost: intervals are replicated ceil(span/bucket)+1 times —
pick ``bucket_seconds`` on the order of the TYPICAL interval span so
the replication factor stays O(1); a pathological interval that would
explode into more than ``max_span_buckets`` buckets fails fast
in-plan (assert_true) rather than silently materializing millions of
bucket rows.

This mirrors the bin-based range-join strategy documented publicly by
several engines (e.g. the Databricks range-join hint, kdb window
joins); the semantics (inclusive bounds both ends) match a plain SQL
``BETWEEN``, which is exactly what the oracle runs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interval_buckets(
    intervals: DataFrame,
    *,
    start_col: str,
    end_col: str,
    bucket_micros: int,
    bucket_seconds: int,
    max_span_buckets: int | None,
) -> DataFrame:
    """The interval side of the range join: each interval exploded to
    one row per covering bucket (`_bkt`). Split out so tests observe
    the REAL explode path (bucket-row counts, guard behavior) rather
    than re-deriving it.

    Inverted intervals (end < start) match nothing under BETWEEN, but
    would slip past the span guard (span <= 0 passes `<= max`) and
    F.sequence(lo, hi) with lo > hi emits a DESCENDING |lo-hi|+1
    element sequence — a single corrupt interval exploding into huge
    bucket fan-out, the exact runaway the guard exists for (ADVICE
    r4). Dropping them up front is semantics-preserving and also
    covers the max_span_buckets=None path."""
    intervals = intervals.filter(F.col(end_col) >= F.col(start_col))
    lo = F.floor(_micros(F.col(start_col)) / F.lit(bucket_micros)).cast("long")
    hi = F.floor(_micros(F.col(end_col)) / F.lit(bucket_micros)).cast("long")
    span = hi - lo + F.lit(1)
    if max_span_buckets is not None:
        # fail fast in-plan: a runaway interval is a bug upstream, not
        # something to silently explode into bucket rows
        guard = F.assert_true(
            span <= F.lit(int(max_span_buckets)),
            F.concat(
                F.lit(
                    f"bucketed_range_join: interval spans more than "
                    f"{max_span_buckets} buckets of {bucket_seconds}s "
                    f"(raise bucket_seconds or max_span_buckets); span="
                ),
                span.cast("string"),
            ),
        )
        # assert_true yields NULL (or throws); adding its coalesced 0
        # into `lo` keeps it in the plan — a `when` with identical
        # branches would be constant-folded away, silently dropping
        # the guard
        lo = lo + F.coalesce(guard.cast("long"), F.lit(0))
    return intervals.withColumn("_bkt", F.explode(F.sequence(lo, hi)))


def _micros(col: Column) -> Column:
    """Exact integer epoch microseconds. The cast normalizes
    TIMESTAMP_NTZ inputs (parquet default in this engine's UTC
    sessions) — applied identically to both join sides, so bucket ids
    agree; unix_timestamp() would truncate sub-second precision and
    a double cast isn't defined for NTZ at all."""
    return F.unix_micros(col.cast("timestamp"))


def bucketed_range_join(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    max_span_buckets: int | None = 4096,
) -> DataFrame:
    """Inner-join each fact row to every interval row with
    ``start <= ts <= end`` (inclusive both ends), as a bucket-equality
    hash join + residual filter. Output: all fact columns + all
    interval columns (names must not collide — alias beforehand).

    ``max_span_buckets`` bounds per-interval replication; ``None``
    disables the guard (only when spans are known-bounded upstream)."""
    if "_bkt" in facts.columns or "_bkt" in intervals.columns:
        raise ValueError(
            "bucketed_range_join uses '_bkt' as its working column; rename "
            "the existing '_bkt' column on the input before joining."
        )
    b = int(bucket_seconds) * 1_000_000  # integer micros: exact floor division
    iv = _interval_buckets(
        intervals,
        start_col=start_col,
        end_col=end_col,
        bucket_micros=b,
        bucket_seconds=bucket_seconds,
        max_span_buckets=max_span_buckets,
    )
    fb = facts.withColumn(
        "_bkt", F.floor(_micros(F.col(ts_col)) / F.lit(b)).cast("long")
    )
    joined = fb.join(iv, "_bkt").filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("_bkt")


def bucketed_range_join_long(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_size: int,
    max_span_buckets: int | None = 4096,
) -> DataFrame:
    """:func:`bucketed_range_join` over plain integers instead of
    timestamps: inner-join each fact to every interval row with
    ``lo <= value <= hi`` (inclusive), as a bucket-equality hash join
    plus the exact BETWEEN residual.

    The canonical use is CIDR / numeric-range dictionary lookup (GeoIP
    blocks, ID allocation ranges, shard maps): the interval table
    explodes each range across its covered ``value // bucket_size``
    buckets once, each fact computes a single bucket id, and the join
    is a plain equality join Catalyst can broadcast — never the
    BroadcastNestedLoopJoin a raw BETWEEN join plans.

    Same contracts as the timestamp variant: inverted intervals
    (``hi < lo``) match nothing and are dropped up front (they would
    otherwise explode through ``F.sequence``); a range spanning more
    than ``max_span_buckets`` buckets fails fast in-plan; output is
    all fact columns + all interval columns (alias collisions are the
    caller's job); ``_bkt`` is reserved.
    """
    if bucket_size < 1:
        raise ValueError(f"bucket_size must be >= 1: {bucket_size}")
    if "_bkt" in facts.columns or "_bkt" in intervals.columns:
        raise ValueError(
            "bucketed_range_join_long uses '_bkt' as its working column; "
            "rename the existing '_bkt' column on the input before joining."
        )
    b = F.lit(int(bucket_size))
    iv = intervals.filter(F.col(hi_col) >= F.col(lo_col))
    # floor(x / b) over doubles is exact while |x| < 2^53 — the same
    # envelope the timestamp variant's micros math already assumes
    lo = F.floor(F.col(lo_col) / b).cast("long")
    hi = F.floor(F.col(hi_col) / b).cast("long")
    span = hi - lo + F.lit(1)
    if max_span_buckets is not None:
        guard = F.assert_true(
            span <= F.lit(int(max_span_buckets)),
            F.concat(
                F.lit(
                    f"bucketed_range_join_long: interval spans more than "
                    f"{max_span_buckets} buckets of {bucket_size} "
                    f"(raise bucket_size or max_span_buckets); span="
                ),
                span.cast("string"),
            ),
        )
        # keep the guard on the LEFT of the tying add: BinaryExpression
        # short-circuits a NULL left operand without evaluating the
        # right, which would skip the assert exactly on bad rows
        lo = F.coalesce(guard.cast("long"), F.lit(0)) + lo
    iv = iv.withColumn("_bkt", F.explode(F.sequence(lo, hi)))
    fb = facts.withColumn(
        "_bkt", F.floor(F.col(value_col) / b).cast("long")
    )
    joined = fb.join(iv, "_bkt").filter(
        (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) <= F.col(hi_col))
    )
    return joined.drop("_bkt")


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    *,
    salt_col: str,
    salt_partitions: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-defeating equi-join: salt the fact side, replicate the dim.

    A shuffle join on a skewed key sends every row of the hot key to
    ONE reducer — at 100 TB one task processes a third of the table
    while a thousand idle. AQE's skew-join split helps only
    sort-merge-join stages it can observe; this operator bakes the fix
    into the logical plan: facts gain a deterministic salt
    ``pmod(xxhash64(salt_col), R)`` (a pure function of a fact column,
    so reruns shuffle identically), the dim is replicated R times via
    one ``explode(sequence(...))``, and the join key becomes
    ``on + [_salt]`` — the hot key now spreads over R reducers.

    Results are EXACTLY a plain ``facts.join(dim, on, how)``: every
    fact row carries one salt value and meets each matching dim row in
    precisely the replica bearing that salt (inner/left semantics
    preserved; dim-side duplicates still fan out once per duplicate).
    Cost: the dim shuffles R× its size — the right trade whenever the
    dim is far smaller than the fact table but too big to broadcast.

    ``salt_col`` should be high-cardinality (a unique id); salting BY
    the join key itself would put all of a hot key's rows in one salt
    bucket and change nothing.

    Only fact-preserving join types are accepted: with the dim
    replicated R times, an unmatched dim row would surface once PER
    REPLICA under right/full-outer semantics (R null-padded rows where
    a plain join emits one), so those modes raise instead of silently
    inflating.
    """
    if salt_partitions < 1:
        raise ValueError(f"salt_partitions must be >= 1: {salt_partitions}")
    normalized = how.lower().replace("_", "").replace("outer", "")
    if normalized not in {"inner", "left", "leftsemi", "semi", "leftanti", "anti"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: replicating the dim "
            "breaks right/full-outer row multiplicity (unmatched dim rows "
            f"would appear {salt_partitions}x). Use inner/left/semi/anti."
        )
    keys = list(on)
    if "_salt" in facts.columns or "_salt" in dim.columns:
        raise ValueError(
            "salted_join uses '_salt' as its working column; rename the "
            "existing '_salt' column on the input before joining."
        )
    r = F.lit(salt_partitions)
    sf = facts.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_col)), r))
    sd = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), r - F.lit(1)))
    )
    return sf.join(sd, keys + ["_salt"], how).drop("_salt")
