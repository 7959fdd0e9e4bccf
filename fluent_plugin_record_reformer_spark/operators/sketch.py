"""KMV (k-minimum-values) distinct-count sketch.

A deterministic, engine-portable alternative to HLL
``approx_count_distinct`` (whose register layout is engine-specific and
can never pass a cross-engine value-hash gate): hash every value to a
uniform 60-bit int (md5-derived, functions/hashing.py), keep the k
smallest DISTINCT hashes per group, and estimate

    D ≈ (k - 1) * 2^60 / h_(k)

where h_(k) is the k-th minimum. Standard KMV estimator (Bar-Yossef et
al.); relative error ~ 1/sqrt(k-2).

Scale shape: TWO-PHASE merge (see :func:`kmv_distinct`) — per-bucket
k-mins first, then a bounded merge of <= k * merge_buckets int64s per
group, so no aggregation state ever holds a whole group's distinct
hashes. The merge is lossless: the final k-mins (and therefore the
estimate) are identical to a single-phase sketch.

Determinism: both the hash and the k-min selection are exact integer
ops; the final estimate divides in IEEE doubles identically on Spark
and DuckDB, so the driver's value-hash gate holds bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SPACE = float(2**60)  # shingle_base-style 15-hex-char digests


def kmv_hash(col: Column | str) -> Column:
    """Uniform 60-bit hash of a value (md5 hex prefix -> int64)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    *,
    k: int = 64,
    out_col: str = "approx_distinct",
    merge_buckets: int = 64,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``.

    Exact when the group has fewer than k distinct values (the sketch
    degenerates to plain counting), the KMV estimate otherwise.

    TWO-PHASE (the classic sketch-merge shape): phase 1 keeps the k
    smallest distinct hashes per (group, salt) bucket — the salt is
    ``hash mod merge_buckets``, a pure function of the value — and
    phase 2 merges the per-bucket k-min lists and re-takes the k
    smallest. Because every global k-min is necessarily a k-min of its
    own bucket, the merged result is IDENTICAL to the single-phase
    sketch (the DuckDB oracle stays single-phase and still matches
    bit-for-bit), but no single aggregation state ever holds a whole
    group's distinct hashes: phase-1 state is bounded per bucket and
    phase-2 state is <= k * merge_buckets int64s per group — the shape
    that survives a 10^10-cardinality group at 100 TB.
    """
    # NULL values carry no identity: drop them on BOTH engines (Spark's
    # collect_set drops nulls implicitly, DuckDB's list(DISTINCT) keeps
    # them and a null would displace a real k-min after sorting).
    hashed = df.select(*group_cols, kmv_hash(value_col).alias("_h")).filter(
        F.col("_h").isNotNull()
    )
    part = hashed.groupBy(
        *group_cols, F.pmod(F.col("_h"), F.lit(merge_buckets)).alias("_salt")
    ).agg(F.slice(F.sort_array(F.collect_set("_h")), 1, k).alias("_kp"))
    # buckets partition the hash space, so the flattened lists are
    # already distinct — merge is sort + take-k
    mins = part.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("_kp"))), 1, k).alias("_kmin")
    )
    n = F.size("_kmin")
    kth = F.element_at("_kmin", k)
    estimate = F.when(n < k, n.cast("double")).otherwise(
        (F.lit(float(k - 1)) * F.lit(HASH_SPACE)) / kth.cast("double")
    )
    return mins.select(
        *group_cols, F.round(estimate).cast("long").alias(out_col)
    )


def deterministic_sample(
    df: DataFrame,
    value_col: str,
    fraction: float,
    *,
    seed: int = 0,
) -> DataFrame:
    """Hash-gate bernoulli sampling: keep a row iff
    ``hash(seed|value) < fraction * 2^60``.

    Unlike ``df.sample()`` (partition-RNG: resampling after a
    repartition or rerun yields a different set), this is a pure
    function of the VALUE — reruns, engine changes, and repartitions
    all select the same rows, which is what a training-data pipeline
    needs for reproducible subsets and for consistent joins between
    sampled tables (sample both sides by the join key and the sample
    stays join-closed)."""
    c = F.col(value_col)
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(str(seed)), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return df.filter(h < int(fraction * HASH_SPACE))


def weighted_sample(
    df: DataFrame,
    value_col: str,
    weight: Column,
    *,
    seed: int = 0,
) -> DataFrame:
    """Per-row-probability deterministic sampling: keep a row iff
    ``hash(seed|value) < weight * 2^60`` where ``weight`` is a
    per-row Column in [0,1] (e.g. a quality score, a per-source rate
    joined from a dim). Same determinism contract as
    :func:`deterministic_sample` — the gate is a pure function of the
    value, so reruns/repartitions/engines keep the SAME rows — but the
    keep probability varies row by row: quality-weighted
    downsampling in one codegen'd predicate."""
    c = F.col(value_col)
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(str(seed)), c.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return df.filter(h.cast("double") < weight.cast("double") * F.lit(HASH_SPACE))


def weighted_gate_sql(value_expr: str, weight_expr: str, *, seed: int = 0) -> str:
    """DuckDB mirror of the :func:`weighted_sample` predicate."""
    h = (
        f"CAST('0x' || substr(md5('{seed}' || '|' || "
        f"CAST({value_expr} AS VARCHAR)), 1, 15) AS BIGINT)"
    )
    return f"CAST({h} AS DOUBLE) < CAST({weight_expr} AS DOUBLE) * {HASH_SPACE!r}"


def sample_gate_sql(value_expr: str, fraction: float, *, seed: int = 0) -> str:
    """DuckDB mirror of the deterministic_sample predicate."""
    h = (
        f"CAST('0x' || substr(md5('{seed}' || '|' || "
        f"CAST({value_expr} AS VARCHAR)), 1, 15) AS BIGINT)"
    )
    return f"{h} < {int(fraction * HASH_SPACE)}"


def kmv_oracle_sql(
    value_expr: str, group_cols: Sequence[str], from_clause: str, *, k: int = 64
) -> str:
    """DuckDB mirror of :func:`kmv_distinct` (same hash, same k-min,
    same double arithmetic)."""
    h = (
        f"CAST('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, 15) AS BIGINT)"
    )
    groups = ", ".join(group_cols)
    sel_groups = f"{groups}, " if groups else ""
    by = f"GROUP BY {groups}" if groups else ""
    return f"""
WITH hashed AS (
  SELECT {sel_groups}{h} AS _h FROM {from_clause}
), mins AS (
  SELECT {sel_groups}list_slice(list_sort(list(DISTINCT _h)), 1, {k}) AS _kmin
  FROM hashed WHERE _h IS NOT NULL {by}
)
SELECT {sel_groups}CAST(round(
         CASE WHEN len(_kmin) < {k} THEN CAST(len(_kmin) AS DOUBLE)
              ELSE ({k - 1}.0 * {HASH_SPACE!r}) / CAST(_kmin[{k}] AS DOUBLE)
         END) AS BIGINT) AS approx_distinct
FROM mins
"""
