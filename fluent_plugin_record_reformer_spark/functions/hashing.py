"""Portable, deterministic hashing primitives.

Everything here must produce BIT-IDENTICAL results in Spark and in the
DuckDB oracle, so the building blocks are md5 (identical hex output in
both engines) and exact int64 arithmetic — never engine-specific hash()
/ xxhash64 (different algorithms per engine).

All functions are pure Column expressions: JVM-side, whole-stage
codegen, no Python in the hot path. At 100 TB the md5-per-shingle cost
is the dominant CPU term of the dedup stage; md5 was chosen over
cheaper non-cryptographic hashes only because it is the one keyed hash
both engines implement identically — on a real cluster swap
``seeded_md5`` for ``xxhash64(seed, col)`` (same call shape).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Modulus for the polynomial rolling hash: largest prime < 2^30 squared
# stays far inside int64 (acc < 1e9+7, acc*31 + 127 < 2^35).
POLY_MOD = 1_000_000_007
POLY_BASE = 31


def seeded_md5(col: Column | str, seed: int | Column = 0) -> Column:
    """``md5(seed || '|' || value)`` — one cheap keyed-hash family.

    Lexicographic MIN over these hex digests is a valid min-hash (the
    digest order is a uniform permutation of the value space), which
    lets MinHash signatures avoid hex->int conversion entirely — both
    engines compare the hex strings identically.
    """
    seed_col = F.lit(str(seed)) if isinstance(seed, int) else seed.cast("string")
    return F.md5(F.concat_ws("|", seed_col, F.col(col) if isinstance(col, str) else col))


def seeded_hash60(col: Column | str, seed: int) -> Column:
    """Seeded uniform 60-bit int64 digest: ``seeded_md5`` of the
    string-cast value, first 15 hex chars, hex->int64. THE canonical
    construction behind every cross-engine hash gate in the repo
    (deterministic/weighted/stratified sampling, the winnow min-hash
    digest) — one definition here, one DuckDB mirror
    (``oracle_mirrors.sql_seeded_hash60``), so the seven former
    hand-kept copies cannot drift apart bit by bit.

    A LONG digest matters twice over: the int64 prefix of the seeded
    md5 is its own uniform permutation of the value space (MIN over it
    is a valid min-hash), and a LONG min/max buffer is mutable, so
    aggregations over it plan HashAggregate instead of the
    immutable-string-buffer SortAggregate fallback.

    NULL input hashes to NULL (ADVICE r5): Spark's concat_ws skips
    NULL arguments, so without the explicit guard a NULL key would
    hash to the constant md5 of the seed alone and could pass a
    sampling gate — while the DuckDB mirror's ``||`` concatenation
    yields NULL and the row is dropped by WHERE. Pinning NULL -> NULL
    makes both engines drop the row identically.
    """
    c = F.col(col) if isinstance(col, str) else col
    digest = F.conv(
        F.substring(seeded_md5(c.cast("string"), seed), 1, 15), 16, 10
    ).cast("long")
    return F.when(c.isNull(), F.lit(None).cast("long")).otherwise(digest)


def poly_fingerprint(col: Column | str) -> Column:
    """Polynomial rolling hash over the characters of a string:
    ``h = fold(chars, 0, (acc, c) -> (acc*31 + ascii(c)) % (1e9+7))``.

    The classic Rabin-Karp document fingerprint. Exact int64 arithmetic
    -> identical in any engine with a list fold (DuckDB mirror:
    ``list_reduce(list_prepend(0, codes), ...)``).
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * POLY_BASE + F.ascii(ch)) % POLY_MOD,
    )


# Universal-hash family for MinHash signatures: one md5 per value
# reduced to int64, then h_i(x) = (a_i*x + b_i) mod MINHASH_P. With
# x, a_i, b_i < P (~2^30), products stay < 2^60 — exact in int64 on
# both engines.
MINHASH_P = 1_000_000_007


def affine_consts(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i) for the i-th universal hash (Knuth
    multiplicative constant spreads the seeds)."""
    return ((i * 2654435761 + 1) % MINHASH_P, (i * 40503 + 17) % MINHASH_P)


def shingle_base_hash(col: Column) -> Column:
    """md5 -> first 15 hex chars (60 bits) -> int64, reduced mod P.
    DuckDB mirror: ``CAST('0x' || substr(md5(s),1,15) AS BIGINT) % P``."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % MINHASH_P
    )
