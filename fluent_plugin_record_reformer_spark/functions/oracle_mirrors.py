"""DuckDB-SQL mirrors of the portable hashing/text/similarity column
functions (functions/hashing.py, functions/text.py,
operators/dedup.py, operators/similarity.py).

Every generator returns a SQL *expression string* that reproduces the
corresponding Spark Column BIT-FOR-BIT on DuckDB — this is what makes
the driver's value-hash correctness gate meaningful for the dedup /
similarity / fingerprint operators. Fold order is kept identical
(left-to-right with an explicit prepended zero, matching Spark's
``F.aggregate`` semantics) so even float sums agree to the last ULP.
"""

from __future__ import annotations

from .hashing import MINHASH_P, POLY_BASE, POLY_MOD, affine_consts
from .text import WORD_RE


def sql_word_tokens(text_expr: str) -> str:
    return f"regexp_extract_all(lower({text_expr}), '{WORD_RE}')"


def sql_shingles(tokens_expr: str, n: int) -> str:
    grams = (
        f"list_transform(range(1, len({tokens_expr}) - {n - 2}), "
        f"i -> array_to_string(list_slice({tokens_expr}, i, i + {n - 1}), ' '))"
    )
    whole = f"[array_to_string({tokens_expr}, ' ')]"
    return f"CASE WHEN len({tokens_expr}) >= {n} THEN {grams} ELSE {whole} END"


def sql_seeded_hash60(value_expr: str, seed: int) -> str:
    """DuckDB mirror of ``functions.hashing.seeded_hash60`` — the one
    canonical seeded 60-bit int64 digest behind every hash gate."""
    return (
        f"CAST('0x' || substr(md5('{seed}' || '|' || "
        f"CAST({value_expr} AS VARCHAR)), 1, 15) AS BIGINT)"
    )


def sql_minhash60(shingles_expr: str, seed: int) -> str:
    """Mirror of the int64 winnow digest: ``seeded_hash60`` min over a
    shingle list."""
    return (
        f"list_min(list_transform({shingles_expr}, "
        f"s -> {sql_seeded_hash60('s', seed)}))"
    )


def sql_hash60_list(shingles_expr: str) -> str:
    """Mirror of dedup._hash60 over a shingle list: md5 -> 15 hex chars
    -> int64 (the 60-bit hash carried as the doc's shingle set)."""
    return (
        f"list_transform({shingles_expr}, "
        f"s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT))"
    )


def sql_shingle_base_hash(shingles_expr: str) -> str:
    """Mirror of hashing.shingle_base_hash over a shingle list."""
    return (
        f"list_transform({shingles_expr}, "
        f"s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % {MINHASH_P})"
    )


def sql_minhash_affine(base_expr: str, i: int) -> str:
    """Mirror of the affine universal-hash minhash row i."""
    a, b = affine_consts(i)
    return (
        f"list_min(list_transform({base_expr}, "
        f"x -> (x * {a} + {b}) % {MINHASH_P}))"
    )


def sql_band_key(sig_expr: str, band: int, rows_per_band: int) -> str:
    lo = band * rows_per_band + 1
    hi = band * rows_per_band + rows_per_band
    return (
        f"md5('{band}' || '|' || "
        f"array_to_string(list_slice({sig_expr}, {lo}, {hi}), '|'))"
    )


def sql_poly_fingerprint(text_expr: str) -> str:
    codes = f"list_transform(string_split({text_expr}, ''), c -> ascii(c))"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {codes}), "
        f"(acc, c) -> (acc * {POLY_BASE} + c) % {POLY_MOD})"
    )


def sql_simhash_votes(tokens_expr: str, bits: int = 16) -> str:
    """Mirror of dedup.simhash_votes: fold the token md5 digests into a
    vote vector (use in a CTE, then collapse with sql_votes_collapse)."""
    # +-1 vote for bit b of the token's int64 digest — exact shift/and
    vote = (
        "((((CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) >> b) & 1) * 2) - 1)"
    )
    votes_of_token = f"list_transform(range(0, {bits}), b -> {vote})"
    token_votes = f"list_transform({tokens_expr}, t -> {votes_of_token})"
    zero = f"list_transform(range(0, {bits}), b -> CAST(0 AS BIGINT))"
    return (
        f"list_reduce(list_prepend({zero}, {token_votes}), "
        f"(acc, v) -> list_transform(range(1, {bits + 1}), i -> acc[i] + v[i]))"
    )


def sql_votes_collapse(votes_col: str, bits: int = 16) -> str:
    """Mirror of dedup.votes_to_simhash over a vote-vector column."""
    return " + ".join(
        f"(CASE WHEN {votes_col}[{b + 1}] > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )


def sql_dot(a_expr: str, b_expr: str, dim: int) -> str:
    prods = (
        f"list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a_expr}[i] AS DOUBLE) * CAST({b_expr}[i] AS DOUBLE))"
    )
    return f"list_reduce(list_prepend(0.0, {prods}), (acc, x) -> acc + x)"


def sql_l2_norm(a_expr: str, dim: int) -> str:
    sqs = (
        f"list_transform(range(1, {dim + 1}), "
        f"i -> CAST({a_expr}[i] AS DOUBLE) * CAST({a_expr}[i] AS DOUBLE))"
    )
    return f"sqrt(list_reduce(list_prepend(0.0, {sqs}), (acc, x) -> acc + x))"


def sql_cosine(a_expr: str, b_expr: str, dim: int) -> str:
    return (
        f"({sql_dot(a_expr, b_expr, dim)} / "
        f"({sql_l2_norm(a_expr, dim)} * {sql_l2_norm(b_expr, dim)}))"
    )


def sql_kmeans_ctes(
    *,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    quant: int = 1 << 20,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[str, str]:
    """Mirror of similarity.train_kmeans_centroids: the Lloyd
    iterations unrolled as CTEs. Returns (cte_sql_without_WITH,
    final_centroid_cte_name). Bit-identical to the Spark trainer: same
    init slice, same cosine-argmax assignment with centroid-id
    tiebreak, same floor(x*2^20) int64 sums, same single int/int
    double division per coordinate."""
    parts = [
        f"c0 AS (SELECT {id_col} AS centroid_id, {vec_col} AS centroid_vec "
        f"FROM {table} WHERE {id_col} < {k})"
    ]
    for t in range(iters):
        cos = sql_cosine(f"e.{vec_col}", "c.centroid_vec", dim)
        parts.append(
            f"""a{t} AS (
  SELECT e.{id_col}, e.{vec_col}, c.centroid_id,
         row_number() OVER (PARTITION BY e.{id_col}
             ORDER BY {cos} DESC, c.centroid_id ASC) AS rnk
  FROM {table} e CROSS JOIN c{t} c)"""
        )
        parts.append(
            f"""m{t} AS (
  SELECT a.centroid_id, d.range AS d,
         CAST(sum(CAST(floor(a.{vec_col}[d.range] * {quant}.0) AS BIGINT)) AS DOUBLE)
           / (count(*) * {quant}) AS v
  FROM (SELECT * FROM a{t} WHERE rnk = 1) a, range(1, {dim + 1}) d
  GROUP BY 1, 2)"""
        )
        parts.append(
            f"c{t + 1} AS (SELECT centroid_id, list(v ORDER BY d) AS centroid_vec "
            f"FROM m{t} GROUP BY centroid_id)"
        )
    return ",\n".join(parts), f"c{iters}"


def sql_signbit_bucket(vec_expr: str, planes: int) -> str:
    bits = " || ".join(
        f"(CASE WHEN {vec_expr}[{d + 1}] >= 0 THEN '1' ELSE '0' END)"
        for d in range(planes)
    )
    return f"({bits})"
