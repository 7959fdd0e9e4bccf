"""Route stage: tag-pattern fan-out to sinks.

The reference re-emits each reformed event into fluentd's router
(``core.rb:110``); downstream ``<match pattern>`` blocks pick events
by tag glob (``example/example.conf:7,18``, ``README.md:23``). Here a
:class:`RouteTable` compiles those globs to Column predicates with
fluentd's FIRST-MATCH-WINS semantics, and the fan-out writes ALL sinks
in ONE pass via ``partitionBy`` on the route column — at 100 TB, N
filtered writes would mean N full scans; one partitioned write means
one.

fluentd glob semantics (public fluentd match rules):
- ``*``  matches exactly one tag part: ``a.*`` matches ``a.b``,
  not ``a`` or ``a.b.c``
- ``**`` matches zero or more parts: ``a.**`` matches ``a``, ``a.b``,
  ``a.b.c``
- ``{x,y}`` alternation is supported inside a part
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNMATCHED = "__unmatched__"


def glob_to_regex(pattern: str) -> str:
    """Compile one fluentd tag glob to an anchored Java regex.

    Part-based construction so ``**`` truly matches ZERO or more parts
    in every position: ``**.a`` matches ``a`` and ``x.a``; ``a.**``
    matches ``a`` and ``a.b.c``; ``a.**.b`` matches ``a.b`` and
    ``a.x.b`` (the char-based predecessor compiled a leading ``**.`` to
    ``.*\\.``, wrongly requiring at least one part — caught by the
    differential property test against an independent part matcher).
    """
    parts = pattern.split(".")

    def part_regex(p: str) -> str:
        if p == "*":
            return r"[^.]+"  # exactly one part (no dots)
        if p.startswith("{") and p.endswith("}"):
            return "(" + "|".join(re.escape(a) for a in p[1:-1].split(",")) + ")"
        return re.escape(p)

    out: list[str] = []
    for i, p in enumerate(parts):
        first, last = i == 0, i == len(parts) - 1
        if p == "**":
            if last:
                # zero or more trailing parts; the separator is optional
                out.append(r".*" if first else r"(\..+)?")
            elif first:
                out.append(r"(?:[^.]+\.)*")  # zero or more leading parts
            else:
                out.append(r"(?:\.[^.]+)*")  # zero or more middle parts
                out.append(r"\.")  # separator owed to the NEXT part
            continue
        if not first and parts[i - 1] != "**":
            # a preceding ** already emitted the owed separator
            out.append(r"\.")
        out.append(part_regex(p))
    return "^" + "".join(out) + "$"


@dataclass(frozen=True)
class Route:
    name: str  # sink name (also the partition value)
    pattern: str  # fluentd tag glob


class RouteTable:
    """Ordered routes, first match wins (fluentd router semantics)."""

    def __init__(self, routes: Sequence[Route]):
        self.routes = list(routes)

    def route_column(self, tag_col: str = "tag") -> Column:
        """One CASE expression assigning each event its sink name —
        a single codegen'd pass, no per-route scans."""
        col = F.lit(UNMATCHED)
        expr: Optional[Column] = None
        for r in self.routes:
            cond = F.col(tag_col).rlike(glob_to_regex(r.pattern))
            expr = F.when(cond, F.lit(r.name)) if expr is None else expr.when(cond, F.lit(r.name))
        return expr.otherwise(col) if expr is not None else col

    def assign(self, df: DataFrame, tag_col: str = "tag", route_col: str = "route") -> DataFrame:
        return df.withColumn(route_col, self.route_column(tag_col))

    def only(self, df: DataFrame, name: str, tag_col: str = "tag") -> DataFrame:
        """Events for one sink (respecting first-match precedence)."""
        return self.assign(df, tag_col).filter(F.col("route") == name).drop("route")


def write_fanout(
    df: DataFrame,
    table: RouteTable,
    base_path: str,
    tag_col: str = "tag",
    fmt: str = "parquet",
    extra_partition_cols: Sequence[str] = (),
    drop_unmatched: bool = True,
    mode: str = "append",
) -> None:
    """Single-pass fan-out: assign route, then ONE partitioned write.

    ``extra_partition_cols`` (e.g. an hour bucket) adds Iceberg-style
    hidden-partitioning structure so downstream per-sink readers get
    partition pruning for free.
    """
    routed = table.assign(df, tag_col)
    if drop_unmatched:
        routed = routed.filter(F.col("route") != UNMATCHED)
    (
        routed.write.mode(mode)
        .partitionBy("route", *extra_partition_cols)
        .format(fmt)
        .save(base_path)
    )


def read_sink(spark, base_path: str, name: str) -> DataFrame:
    """Read one sink back (partition-pruned scan of route=<name>)."""
    return spark.read.parquet(base_path).filter(F.col("route") == name)
