"""Deduplication operators over a document table: exact, MinHash+LSH,
SimHash, and n-gram-Jaccard verification of LSH candidates.

Design for 10^12-row scale:

- Signatures are pure Column expressions (md5-family hashes,
  functions/hashing.py) computed in the scan projection — no Python,
  no shuffle.
- The ONLY shuffles are (a) the exact-dedup groupBy on the text hash
  and (b) the LSH band-bucket self-join; both shuffle keys are
  uniformly-distributed hashes, so no salting is needed except for
  pathological bucket skew (identical-doc floods), which
  ``lsh_candidate_pairs(max_bucket=...)`` caps: a bucket with more
  members than the cap is itself proof of duplication and is reported
  wholesale rather than expanded into O(n^2) pairs.
- Candidate verification joins tokens back by doc id — at scale,
  carry the (small) distinct-token arrays through the band explode
  instead if token re-read is the bottleneck.

Reference anchor: the reference has no dedup (it is a per-event
transform, out_record_reformer/core.rb:98-112); these operators are the
training-data-pipeline extension required by the task brief, expressed
with the same compile-to-Columns philosophy as the reform spec compiler
(plans/compiler.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    MINHASH_P,
    affine_consts,
    seeded_md5,
    shingle_base_hash,
)
from ..functions.text import shingles, word_tokens
from ..sources.tables import ensure_compute_parallelism


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: hash-groupBy on the raw text, keeper =
    min id. (groupBy on md5(text) instead of text if rows are huge —
    same plan shape, 16-byte shuffle keys.)"""
    return df.groupBy(text_col).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def minhash_signature(
    text: Column, *, num_hashes: int = 16, shingle_n: int = 3
) -> Column:
    """Array of ``num_hashes`` lexicographic-min md5 digests over the
    document's token n-gram shingles — a valid MinHash signature (each
    seeded digest order is a uniform permutation of shingle space)."""
    sh = shingles(word_tokens(text), shingle_n)

    def hash_with_seed(i: int):
        # NB: must be a ONE-parameter lambda — a second (default) param
        # would make F.transform pass the array index into it.
        return lambda s: seeded_md5(s, i)

    return F.array(
        *[F.array_min(F.transform(sh, hash_with_seed(i))) for i in range(num_hashes)]
    )


def band_keys(signature: Column, *, bands: int, rows_per_band: int) -> Column:
    """LSH banding: md5 of each band's slice of the signature. Two docs
    land in the same bucket of band j iff their signature rows
    j*r..j*r+r-1 all match. Signature values are stringified for the
    digest (plain decimal — identical in both engines)."""
    as_str = F.transform(signature, lambda x: x.cast("string"))
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(j)),
                    F.array_join(
                        F.slice(as_str, j * rows_per_band + 1, rows_per_band), "|"
                    ),
                )
            )
            for j in range(bands)
        ]
    )


def minhash_lsh(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """id -> exploded (band_idx, bucket) rows, ready for the bucket
    self-join. bands * rows_per_band == num_hashes."""
    assert num_hashes % bands == 0
    r = num_hashes // bands

    # One md5 per shingle (the expensive part), reduced to int64; the
    # num_hashes signature rows are cheap affine permutations
    # (a_i*x + b_i) mod P — the standard universal-hash MinHash family.
    # vs md5-per-seed this cuts digest work num_hashes-fold (measured
    # 30s -> ~4s at sf0.1).
    #
    # Staged projections: shingles -> base hashes -> signature -> band
    # keys. Each stage references the previous ALIASED column; inlining
    # would blow the (interpreted, HOF) expression tree up ~64x
    # (measured: 500 docs took 54s inlined, <2s staged). CollapseProject
    # keeps non-cheap multi-referenced aliases in their own projection,
    # so the stages survive Catalyst.
    def affine(i: int):
        a, b = affine_consts(i)
        return lambda x: (x * a + b) % MINHASH_P

    toks = ensure_compute_parallelism(df).select(
        F.col(id_col), word_tokens(F.col(text_col)).alias("_toks")
    )
    sh = toks.select(
        F.col(id_col), shingles(F.col("_toks"), shingle_n).alias("_sh")
    )
    base = sh.select(
        F.col(id_col),
        F.transform(F.col("_sh"), shingle_base_hash).alias("_base"),
    )
    sig = base.select(
        F.col(id_col),
        F.array(
            *[
                F.array_min(F.transform(F.col("_base"), affine(i)))
                for i in range(num_hashes)
            ]
        ).alias("_sig"),
    )
    keys = band_keys(F.col("_sig"), bands=bands, rows_per_band=r)
    return sig.select(
        F.col(id_col),
        F.posexplode(keys).alias("band_idx", "bucket"),
    )


def lsh_candidate_pairs(
    banded: DataFrame,
    *,
    id_col: str = "doc_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any band bucket.

    One groupBy over the banded rows, pairs generated per bucket from
    the sorted member list — NOT a self-join, which would evaluate the
    whole signature pipeline once per join side (measured 2x cost) and
    shuffle the big side twice. Buckets are tiny by construction
    (uniform md5 keys), so collect_list per bucket is safe; ``max_bucket``
    caps pathological identical-doc floods (such a bucket is itself
    proof of duplication — report it wholesale, don't expand O(n^2)
    pairs)."""
    members = banded.groupBy("band_idx", "bucket").agg(
        F.sort_array(F.collect_list(id_col)).alias("_ids")
    )
    if max_bucket is not None:
        members = members.filter(F.size("_ids") <= max_bucket)
    pair_structs = F.flatten(
        F.transform(
            F.col("_ids"),
            lambda x, i: F.transform(
                F.slice(F.col("_ids"), i + 2, F.size(F.col("_ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        members.filter(F.size("_ids") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keep >= threshold.

    |A u B| = |A| + |B| - |A n B| on distinct shingle sets, so only
    array_distinct + array_intersect sizes cross the join.
    """
    sets = (
        ensure_compute_parallelism(df)
        .select(F.col(id_col), word_tokens(F.col(text_col)).alias("_toks"))
        .select(
            F.col(id_col),
            F.array_distinct(shingles(F.col("_toks"), shingle_n)).alias("_set"),
        )
    )
    a = sets.select(F.col(id_col).alias("id_a"), F.col("_set").alias("_set_a"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("_set").alias("_set_b"))
    inter = F.size(F.array_intersect("_set_a", "_set_b"))
    union = F.size("_set_a") + F.size("_set_b") - inter
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter.cast("double") / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_votes(text: Column, *, bits: int = 16) -> Column:
    """SimHash vote vector: ONE fold over the token array computing the
    md5 digest once per token (reduced to int64) and accumulating all
    ``bits`` per-bit +-1 votes with exact shift/and arithmetic (token
    multiplicity = weight). No explode, no shuffle, no string ops per
    bit — DuckDB mirror uses the identical (h >> b) & 1."""
    toks = word_tokens(text)
    vote_arrays = F.transform(
        toks,
        lambda t: _int_votes(
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"), bits
        ),
    )
    zero = F.array(*[F.lit(0).cast("long") for _ in range(bits)])
    return F.aggregate(
        vote_arrays, zero, lambda acc, v: F.zip_with(acc, v, lambda a, x: a + x)
    )


def _int_votes(h: Column, bits: int) -> Column:
    return F.array(
        *[(F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1) for b in range(bits)]
    )


def votes_to_simhash(votes: Column, *, bits: int = 16) -> Column:
    """Collapse a vote vector to the integer simhash (bit b set iff the
    majority of token hashes had bit b set)."""
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.when(F.element_at(votes, b + 1) > 0, F.lit(2**b)).otherwise(
            F.lit(0)
        )
    return out


def with_simhash(
    df: DataFrame, *, text_col: str = "text", out_col: str = "simhash", bits: int = 16
) -> DataFrame:
    """Add a simhash column via staged projections: token digests
    (one md5+int64 per token) -> per-bit scalar vote folds -> collapse.

    Identical result to ``simhash_votes`` but each bit's fold carries a
    scalar accumulator; the single-fold variant accumulates a
    ``bits``-element array per token (zip_with allocation per element),
    which measures ~2x slower in interpreted HOF evaluation."""
    hcol, vcol = f"__{out_col}_h", f"__{out_col}_votes"

    def vote_fold(b: int):
        return lambda acc, h: acc + (
            F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1
        )

    staged = (
        ensure_compute_parallelism(df)
        .withColumn(
            hcol,
            F.transform(
                word_tokens(F.col(text_col)),
                lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
            ),
        )
        .withColumn(
            vcol,
            F.array(
                *[
                    F.aggregate(F.col(hcol), F.lit(0).cast("long"), vote_fold(b))
                    for b in range(bits)
                ]
            ),
        )
    )
    return (
        staged.withColumn(out_col, votes_to_simhash(F.col(vcol), bits=bits))
        .drop(hcol, vcol)
    )
