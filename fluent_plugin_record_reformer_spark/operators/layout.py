"""Multi-dimensional data layout: Z-order (Morton) clustering for
write-time file organization.

Why this is a first-class operator at 100 TB: parquet scans prune
files and row groups by column min/max statistics. A table sorted by
ONE column (the usual ``ts``) prunes beautifully on that column and
not at all on any other — a ``user_id BETWEEN`` predicate still reads
every file. Interleaving the bits of two (or more) low-cardinality
bucket keys into a single Z-value and range-partition-sorting by it
keeps every file's min-max envelope narrow in BOTH dimensions, so
two-dimensional slice queries prune most files. This is the publicly
documented technique behind Delta Lake's OPTIMIZE ZORDER BY and
kd-tree-free multi-dim clustering generally.

Everything here is pure integer bit arithmetic on Columns
(whole-stage codegen; the identical expressions exist in DuckDB for
the oracle) — no UDF, no driver work. The write path is an ordinary
``repartitionByRange(z).write`` — one range shuffle, the same cost as
any global sort-write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) ladder spreading a 16-bit int across 32 bits
# (classic "magic numbers" bit-twiddling, public domain construction)
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread(col: Column, bits: int) -> Column:
    """Spread the low ``bits`` bits of ``col`` so bit i lands at
    position 2i (room for a second dimension's bits in between)."""
    c = col.bitwiseAND(F.lit((1 << bits) - 1))
    for shift, mask in _SPREAD_STEPS:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def zvalue(x: Column, y: Column, *, bits: int = 8) -> Column:
    """Morton/Z-order interleave of two non-negative bucket ids, each
    truncated to its low ``bits`` bits (bits <= 16). Bit layout:
    x0 y0 x1 y1 ... — points close in BOTH x and y are close in z."""
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16]: {bits}")
    xl = x.cast("long")
    yl = y.cast("long")
    return _spread(xl, bits).bitwiseOR(F.shiftleft(_spread(yl, bits), 1))


def sql_zvalue(x_expr: str, y_expr: str, *, bits: int = 8) -> str:
    """DuckDB mirror of :func:`zvalue` — the same shift/mask ladder
    over BIGINT (DuckDB's &, |, << are bitwise on integers)."""
    def spread(e: str) -> str:
        c = f"(CAST({e} AS BIGINT) & {(1 << bits) - 1})"
        for shift, mask in _SPREAD_STEPS:
            c = f"(({c} | ({c} << {shift})) & {mask})"
        return c

    return f"({spread(x_expr)} | ({spread(y_expr)} << 1))"


def zorder_layout(
    df: DataFrame,
    x: Column,
    y: Column,
    *,
    bits: int = 8,
    num_files: int = 8,
    z_col: str = "_z",
) -> DataFrame:
    """Arrange ``df`` for a Z-ordered write: compute the interleaved
    key and range-partition + sort by it, so each output file covers a
    compact Z-range — i.e. a small min-max envelope in BOTH source
    dimensions. Follow with ``.drop(z_col).write.parquet(...)`` (or
    keep the column for debugging). One range shuffle; the per-file
    sort keeps row-group stats tight WITHIN files too."""
    if z_col in df.columns:
        raise ValueError(
            f"zorder_layout uses {z_col!r} as its working column; rename it "
            "on the input or pass a different z_col"
        )
    zed = df.withColumn(z_col, zvalue(x, y, bits=bits))
    return zed.repartitionByRange(num_files, F.col(z_col)).sortWithinPartitions(
        F.col(z_col)
    )
