"""KMV (k-minimum-values) distinct-count sketch.

A deterministic, engine-portable alternative to HLL
``approx_count_distinct`` (whose register layout is engine-specific and
can never pass a cross-engine value-hash gate): hash every value to a
uniform 60-bit int (md5-derived, functions/hashing.py), keep the k
smallest DISTINCT hashes per group, and estimate

    D ≈ (k - 1) * 2^60 / h_(k)

where h_(k) is the k-th minimum. Standard KMV estimator (Bar-Yossef et
al.); relative error ~ 1/sqrt(k-2).

Scale shape (see :func:`kmv_distinct`): a cardinality-adaptive
THRESHOLD PRE-FILTER — keep only hashes below ~prefilter_factor * k *
2^60 / D̂ (D̂ from Spark's HLL, used ONLY as a heuristic, never in any
result) — so the per-group aggregation state is ~prefilter_factor * k
int64s REGARDLESS of group cardinality, with an exactness guard: any
group where the pre-filter provably might have clipped a true k-min
(fewer than k survivors AND rows were dropped) is recomputed via the
salted two-phase merge (state D/merge_buckets per bucket — the honest
bound of that path). Either way the final k-mins, and therefore the
estimate, are bit-identical to a single-phase sketch.

Determinism: both the hash and the k-min selection are exact integer
ops; the final estimate divides in IEEE doubles identically on Spark
and DuckDB, so the driver's value-hash gate holds bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import seeded_hash60
from ..functions.oracle_mirrors import sql_seeded_hash60

HASH_SPACE = float(2**60)  # shingle_base-style 15-hex-char digests


def kmv_hash(col: Column | str) -> Column:
    """Uniform 60-bit hash of a value (md5 hex prefix -> int64)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def _estimate_from_kmin(kmin: Column, k: int) -> Column:
    n = F.size(kmin)
    kth = F.element_at(kmin, k)
    return F.when(n < k, n.cast("double")).otherwise(
        (F.lit(float(k - 1)) * F.lit(HASH_SPACE)) / kth.cast("double")
    )


def _salted_kmin(
    hashed: DataFrame, group_cols: Sequence[str], *, k: int, merge_buckets: int
) -> DataFrame:
    """Salted two-phase k-min (the fallback path): phase 1 keeps the k
    smallest distinct hashes per (group, salt) bucket, phase 2 merges
    the per-bucket lists. Every global k-min is a k-min of its own
    bucket, so the merge is lossless. Phase-1 aggregation state is the
    bucket's full distinct set BEFORE the slice — D/merge_buckets
    values per bucket, reduced merge_buckets-fold but NOT bounded at
    k — which is why this is only the guard path, not the main one."""
    part = hashed.groupBy(
        *group_cols, F.pmod(F.col("_h"), F.lit(merge_buckets)).alias("_salt")
    ).agg(F.slice(F.sort_array(F.collect_set("_h")), 1, k).alias("_kp"))
    # buckets partition the hash space, so the flattened lists are
    # already distinct — merge is sort + take-k
    return part.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("_kp"))), 1, k).alias("_kmin")
    )


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    *,
    k: int = 64,
    out_col: str = "approx_distinct",
    merge_buckets: int = 64,
    prefilter_factor: float = 8.0,
) -> DataFrame:
    """Per-group approximate distinct count of ``value_col``.

    Exact when the group has fewer than k distinct values (the sketch
    degenerates to plain counting), the KMV estimate otherwise.

    BOUNDED-STATE shape: the k-th minimum of a D-cardinality group sits
    near k * 2^60 / D, so first estimate D̂ per group with Spark's HLL
    (``approx_count_distinct`` — a HEURISTIC that only positions the
    pre-filter; it never reaches any result, so the cross-engine gate
    is untouched), then keep only hashes below
    ``prefilter_factor * k * 2^60 / D̂``. Survivors number
    ~prefilter_factor * k per group regardless of cardinality, so the
    per-group ``collect_set`` state is genuinely bounded (~512 int64s
    at the defaults) where the salted two-phase merge still held
    D/merge_buckets values per bucket.

    Exactness guard: if a group ends with fewer than k survivors AND
    the pre-filter dropped rows (i.e. a true k-min might have been
    clipped — possible only if HLL over-estimated D by more than
    prefilter_factor, vanishingly rare but not impossible), that group
    is recomputed via :func:`_salted_kmin`. The guard is FULLY LAZY:
    the redo branch sits in the plan leftsemi-joined to the broadcast
    flagged-group set and is unioned unconditionally — no driver
    action at construction, and with AQE an empty flagged set
    collapses the redo subtree to an empty relation at runtime.
    Either path yields k-mins bit-identical to a single-phase sketch,
    so the DuckDB oracle stays single-phase.

    Cost note: the HLL pre-pass is a second scan over the hashed
    values; both aggregations are map-side partial. At 100 TB that is
    the right trade — an extra cheap pass instead of unbounded
    aggregation state.
    """
    if not group_cols:
        return kmv_distinct(
            df.withColumn("_g", F.lit(1)),
            value_col,
            ["_g"],
            k=k,
            out_col=out_col,
            merge_buckets=merge_buckets,
            prefilter_factor=prefilter_factor,
        ).drop("_g")
    # NULL values carry no identity: drop them on BOTH engines (Spark's
    # collect_set drops nulls implicitly, DuckDB's list(DISTINCT) keeps
    # them and a null would displace a real k-min after sorting).
    hashed = df.select(*group_cols, kmv_hash(value_col).alias("_h")).filter(
        F.col("_h").isNotNull()
    )
    # HLL pre-pass over the RAW value, not the md5 (r6): the estimate
    # only positions the pre-filter threshold, and distinct(value) ==
    # distinct(md5(value)) for HLL purposes — so the expensive digest
    # runs once per row (the main pass) instead of twice. The final
    # answer is unchanged by construction for ANY threshold: either a
    # group keeps >= k survivors (its k-mins are exact) or the lazy
    # fallback recomputes it exactly (the guard below).
    est = df.filter(F.col(value_col).isNotNull()).groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col).alias("_dest")
    )
    # clamp in DOUBLE before the long cast — a tiny D̂ would overflow
    # bigint otherwise (factor * k * 2^60 / 10 > Long.MAX)
    threshold = (
        F.least(
            F.lit(float(HASH_SPACE)),
            F.lit(float(prefilter_factor * k)) * F.lit(HASH_SPACE) / F.col("_dest"),
        )
        .cast("long")
        .alias("_thr")
    )
    # AQE broadcasts the per-group threshold frame when groups are few
    # (the usual case); many-group inputs shuffle-join but then each
    # group is small and the guard never fires
    with_thr = hashed.join(est.select(*group_cols, threshold), list(group_cols))
    surv = with_thr.groupBy(*group_cols).agg(
        F.slice(
            F.sort_array(F.collect_set(F.when(F.col("_h") < F.col("_thr"), F.col("_h")))),
            1,
            k,
        ).alias("_kmin"),
        F.sum(F.when(F.col("_h") >= F.col("_thr"), 1).otherwise(0)).alias("_ndrop"),
    )
    needs_fb = (F.size("_kmin") < k) & (F.col("_ndrop") > 0)
    # LAZY guard (VERDICT r3 #3 / ADVICE): no driver action at
    # construction. The fallback branch is ALWAYS in the plan — the
    # salted redo leftsemi-joined against the broadcast flagged-group
    # set — and unioned unconditionally. Flagged groups are 0 in
    # practice (requires HLL to over-estimate by > prefilter_factor),
    # and the broadcast probe materializes over the REUSED survivor
    # exchange, so when it comes back empty AQE's empty-relation
    # propagation collapses the whole redo subtree (the second
    # ``hashed`` scan never runs). The old shape ran the full
    # two-aggregation job once for an eager ``limit(1).count()`` probe
    # and AGAIN when the uncached returned frame was acted on.
    flagged = surv.filter(needs_fb).select(*group_cols)
    good = surv.filter(~needs_fb).select(*group_cols, "_kmin")
    redo = _salted_kmin(
        hashed.join(F.broadcast(flagged), list(group_cols), "leftsemi"),
        group_cols,
        k=k,
        merge_buckets=merge_buckets,
    )
    out = good.unionByName(redo)
    return out.select(
        *group_cols,
        F.round(_estimate_from_kmin(F.col("_kmin"), k)).cast("long").alias(out_col),
    )


def grouped_reservoir(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    k: int,
    *,
    seed: int = 0,
    rank_col: str | None = None,
) -> DataFrame:
    """EXACT deterministic k-per-group sample: the k rows with the
    smallest ``seeded_hash60(key)`` in each group (all rows if the
    group is smaller) — a reservoir sample whose reservoir is a pure
    function of the data.

    Complements :func:`stratified_sample` (expected counts, one
    codegen'd predicate, no per-group rank): when the contract is
    "exactly k per group", the classic shape — ``row_number() OVER
    (PARTITION BY group ORDER BY hash)`` on the raw table — shuffles
    and sorts EVERY row into one task per group. This routes through
    :func:`~..corpus.grouped_topk` instead: per-partition candidate
    top-k (bounded at k x groups x partitions rows) then an exact rank
    over that tiny set, the same bounded-state shape as the inverted
    index's posting cap. Uniformity: the seeded 60-bit digest is a
    uniform permutation of the key space, so "k smallest hashes" is a
    uniform without-replacement sample; determinism is the same
    value-pure contract as :func:`deterministic_sample` (reruns,
    repartitions, and engines pick the SAME rows).

    ``key_col`` should be unique per row (ties beyond the 60-bit hash
    break on the full row struct, deterministically). ``rank_col``
    optionally exposes the 1-based sample rank.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    from .corpus import grouped_topk

    gcols = list(group_cols)
    clash = {"_h", "_row", "_rr_rank"} & set(df.columns)
    if clash:
        raise ValueError(
            f"grouped_reservoir working columns clash with input: {sorted(clash)}"
        )
    order = F.struct(
        _seeded_hash(key_col, seed).alias("_h"),
        F.struct(*[F.col(c) for c in df.columns]).alias("_row"),
    )
    top = grouped_topk(
        df, group_cols=gcols, order_struct=order, k=k, rank_col="_rr_rank"
    )
    rest = [
        F.col("_row")[c].alias(c) for c in df.columns if c not in set(gcols)
    ]
    tail = [F.col("_rr_rank").alias(rank_col)] if rank_col else []
    return top.select(*gcols, *rest, *tail)


def reservoir_oracle_sql(
    select_cols: Sequence[str],
    group_cols: Sequence[str],
    key_expr: str,
    from_clause: str,
    *,
    k: int,
    seed: int = 0,
    rank_as: str | None = None,
) -> str:
    """DuckDB mirror of :func:`grouped_reservoir`: row_number over
    (group, hash asc, key asc) capped at k. The key tiebreak matches
    the Spark side's row-struct tiebreak whenever ``key_expr`` is the
    struct's leading field (which it is for any table whose key column
    comes first)."""
    h = seeded_hash_sql(key_expr, seed)
    groups = ", ".join(group_cols)
    cols = ", ".join(select_cols)
    # CAST to INT: DuckDB's row_number is BIGINT, Spark's is INT
    rank_sel = f", CAST(_rank AS INT) AS {rank_as}" if rank_as else ""
    return f"""
SELECT {cols}{rank_sel} FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {groups} ORDER BY {h}, {key_expr}
  ) AS _rank
  FROM {from_clause}
) WHERE _rank <= {k}
"""


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
    h = _seeded_hash(value_col, seed)
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
    h = _seeded_hash(value_col, seed)
    return df.filter(h.cast("double") < weight.cast("double") * F.lit(HASH_SPACE))


def weighted_gate_sql(value_expr: str, weight_expr: str, *, seed: int = 0) -> str:
    """DuckDB mirror of the :func:`weighted_sample` predicate."""
    h = seeded_hash_sql(value_expr, seed)
    return f"CAST({h} AS DOUBLE) < CAST({weight_expr} AS DOUBLE) * {HASH_SPACE!r}"


def sample_gate_sql(value_expr: str, fraction: float, *, seed: int = 0) -> str:
    """DuckDB mirror of the deterministic_sample predicate."""
    h = seeded_hash_sql(value_expr, seed)
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


# The sampling gate hash and its DuckDB mirror — canonical definitions
# in functions.hashing / functions.oracle_mirrors (shared with the
# winnow digest in dedup; one construction, one mirror, no drift).
_seeded_hash = seeded_hash60
seeded_hash_sql = sql_seeded_hash60


def bottomk_quantile_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    *,
    key_col: str,
    k: int = 256,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    seed: int = 0,
) -> DataFrame:
    """Mergeable approximate quantiles via a DETERMINISTIC bottom-k
    uniform row sample.

    Rows whose ``hash(seed|key)`` is among the k smallest per group
    form a uniform without-replacement sample of the group (the hash
    is a pure function of the row key, so the sample — unlike
    ``df.sample()`` or ``percentile_approx`` internals — is identical
    across reruns, repartitions, and engines, and a DuckDB oracle can
    reproduce it bit-for-bit). The q-quantile estimate is the sample
    value at rank ``max(1, ceil(q * n_sample))``; classical sample-
    quantile theory bounds the rank error by ~sqrt(q(1-q)/k) — ~3% at
    the k=256 default — and the estimate is EXACT whenever the group
    holds at most k rows (the sample is then the whole group).

    Scale shape: bottom-k selection runs through
    :func:`~..corpus.grouped_topk` — per-(partition, group) bounded
    local bottom-k, then an exact window over only the k x groups x
    partitions candidates — so no window ever touches the raw table
    and the final per-group state is exactly k (value, hash) structs.
    This is the sketch counterpart of ``exact_quantiles``: one cheap
    pass with bounded state versus the chunked-rank exact path.

    Output: ``group_cols``, ``n_sample``, and one ``q<percent>``
    column per requested quantile (e.g. ``q50``, ``q90``, ``q99``).
    """
    from .corpus import grouped_topk

    gcols = list(group_cols)
    h = _seeded_hash(key_col, seed)
    base = df.select(
        *gcols, F.col(value_col).alias("_v"), h.alias("_h")
    ).filter(F.col("_v").isNotNull())
    samp = grouped_topk(
        base,
        group_cols=gcols,
        order_struct=F.struct(F.col("_h"), F.col("_v")),
        k=k,
        rank_col="_rnk",
    )
    vals = samp.groupBy(*gcols).agg(
        F.sort_array(F.collect_list("_v")).alias("_vals")
    )
    n = F.size("_vals")
    cols = [F.col(c) for c in gcols] + [n.alias("n_sample")]
    for q in quantiles:
        rank = F.greatest(F.lit(1), F.ceil(F.lit(float(q)) * n).cast("int"))
        cols.append(
            F.element_at("_vals", rank).alias(f"q{int(round(q * 100))}")
        )
    return vals.select(*cols)


def bottomk_quantile_sql(
    value_expr: str,
    key_expr: str,
    group_cols: Sequence[str],
    from_clause: str,
    *,
    k: int = 256,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    seed: int = 0,
) -> str:
    """DuckDB mirror of :func:`bottomk_quantile_sketch` (same hash,
    same bottom-k set, same rank arithmetic)."""
    h = seeded_hash_sql(key_expr, seed)
    groups = ", ".join(group_cols)
    sel_groups = f"{groups}, " if groups else ""
    part = f"PARTITION BY {groups} " if groups else ""
    by = f"GROUP BY {groups}" if groups else ""
    qcols = ", ".join(
        f"_vals[greatest(1, CAST(ceil({q!r} * len(_vals)) AS INT))]"
        f" AS q{int(round(q * 100))}"
        for q in quantiles
    )
    return f"""
WITH hashed AS (
  SELECT {sel_groups}{value_expr} AS _v, {h} AS _h
  FROM {from_clause} WHERE {value_expr} IS NOT NULL
), ranked AS (
  SELECT *, row_number() OVER ({part}ORDER BY _h, _v) AS _rnk FROM hashed
), sampled AS (
  SELECT {sel_groups}list_sort(list(_v)) AS _vals
  FROM ranked WHERE _rnk <= {k} {by}
)
SELECT {sel_groups}len(_vals) AS n_sample, {qcols} FROM sampled
"""


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_cols: Sequence[str],
    *,
    target_per_stratum: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic stratified sampling: downsample every stratum to
    ~``target_per_stratum`` expected rows (strata already at or below
    the target are kept whole) — the standard rebalancing move before
    training on source-skewed corpora.

    Two-phase: per-stratum counts (a tiny partial-aggregated groupBy)
    set the keep rate ``least(1, target / count)``, broadcast back
    onto the raw rows, and the same value-pure hash gate as
    :func:`deterministic_sample` decides each row — so the selected
    set is a pure function of (seed, key, strata counts): identical
    across reruns, repartitions, and engines. Counts are expected
    values, not exact (a hash gate cannot hit an exact target without
    a per-stratum rank, i.e. a full sort — the wrong trade at scale;
    binomial deviation is ~sqrt(target)).

    The rate join is NULL-SAFE: rows whose strata column is NULL form
    their own stratum and are sampled like any other, instead of
    silently vanishing through null-rejecting join equality.
    """
    gcols = list(strata_cols)
    clash = {"_rate", *(f"_g_{c}" for c in gcols)} & set(df.columns)
    if clash:
        raise ValueError(
            f"stratified_sample working columns clash with input: {sorted(clash)}"
        )
    rates = df.groupBy(*gcols).agg(F.count(F.lit(1)).alias("_cnt"))
    rate = F.least(
        F.lit(1.0), F.lit(float(target_per_stratum)) / F.col("_cnt")
    )
    rates = rates.withColumn("_rate", rate).select(
        *[F.col(c).alias(f"_g_{c}") for c in gcols], "_rate"
    )
    cond = None
    for c in gcols:
        eq = df[c].eqNullSafe(F.col(f"_g_{c}"))
        cond = eq if cond is None else (cond & eq)
    joined = df.join(F.broadcast(rates), on=cond)
    h = _seeded_hash(key_col, seed)
    return joined.filter(
        h.cast("double") < F.col("_rate") * F.lit(HASH_SPACE)
    ).drop("_rate", *[f"_g_{c}" for c in gcols])


def stratified_gate_sql(
    key_expr: str,
    strata_cols: Sequence[str],
    from_clause: str,
    *,
    target_per_stratum: int,
    seed: int = 0,
) -> str:
    """DuckDB mirror of :func:`stratified_sample` — returns a full
    ``SELECT * FROM ... WHERE <gate>`` over the joined rate. The join
    mirrors the Spark side's null-safe equality (``IS NOT DISTINCT
    FROM``) so NULL strata sample instead of dropping."""
    groups = ", ".join(strata_cols)
    on = " AND ".join(
        f"d.{c} IS NOT DISTINCT FROM r.{c}" for c in strata_cols
    )
    h = seeded_hash_sql(key_expr, seed)
    return f"""
SELECT d.* FROM {from_clause} d
JOIN (
  SELECT {groups},
         least(1.0, {float(target_per_stratum)!r} / count(*)) AS _rate
  FROM {from_clause} GROUP BY {groups}
) r ON {on}
WHERE CAST({h} AS DOUBLE) < _rate * {HASH_SPACE!r}
"""
