"""Log-template mining: collapse raw log lines to their constant
skeleton ("template") by masking variable tokens, then aggregate per
template.

This is the batch analog of what Drain / Spell / logmine do online:
group the firehose by message *shape* so operators see "5 templates,
one of them spiking" instead of 10^9 distinct lines. The reference
engine's users do this downstream of record_reformer's parse stage
(grok fields are the per-template extraction; the template itself is
the cluster id) — see reference lib/fluent/plugin/out_record_reformer.rb
placeholder expansion, which this engine generalizes to analytics.

Design for 100 TB:

- The masking pass is a chain of ``regexp_replace`` Columns — pure
  JVM, whole-stage-codegen, one pass per rule over each line, no
  Python, no UDF.
- The aggregation is an ordinary hash groupBy on the (low-cardinality)
  template string: map-side partial aggregation collapses each of the
  ~10^5 input partitions to its few hundred local templates before the
  shuffle, so the exchange carries |templates| x |partitions| rows,
  not |lines|.
- No per-line window, no collect, no sort: the plan is
  Scan -> Project(regexp chain) -> HashAggregate(partial) -> Exchange
  -> HashAggregate(final).

The rule regexes are deliberately restricted to syntax shared by
Java's regex (Spark executors) and RE2 (DuckDB oracle): no
lookaround, no backreferences. Masks are applied IN ORDER — earlier,
more specific rules (UUID, IP, hex) must run before the generic
number rule, or `1.2.3.4` would decay into `<NUM>.<NUM>.<NUM>.<NUM>`.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) applied in order. Kept Java+RE2 compatible;
# replacements contain no '$' or '\' (both engines' replacement-string
# metacharacters).
DEFAULT_MASK_RULES: tuple[tuple[str, str], ...] = (
    (
        r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        r"-[0-9a-fA-F]{12}",
        "<UUID>",
    ),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    (r"\b0x[0-9a-fA-F]+\b", "<HEX>"),
    (r"[0-9]+(?:\.[0-9]+)?", "<NUM>"),
)


def template_col(
    text: Column | str,
    rules: Sequence[tuple[str, str]] = DEFAULT_MASK_RULES,
) -> Column:
    """The masked template of ``text`` as a pure Column expression
    (chained ``regexp_replace``; codegen'd, zero Python)."""
    col = F.col(text) if isinstance(text, str) else text
    for pattern, repl in rules:
        col = F.regexp_replace(col, pattern, repl)
    return col


def mine_templates(
    df: DataFrame,
    *,
    text_col: str = "text",
    key_col: str | None = None,
    rules: Sequence[tuple[str, str]] = DEFAULT_MASK_RULES,
) -> DataFrame:
    """One row per distinct template: ``(template, n_lines[, n_keys])``.

    ``key_col`` (e.g. conv_id / host) additionally reports how many
    distinct keys emitted the template — the "is this one noisy host
    or the whole fleet?" question. Distinct-counting routes through
    the standard two-phase expand Spark plans for count_distinct
    (partial per-key dedup before the shuffle).
    """
    t = df.select(
        template_col(text_col, rules).alias("template"),
        *([F.col(key_col)] if key_col else []),
    )
    aggs = [F.count(F.lit(1)).alias("n_lines")]
    if key_col:
        aggs.append(F.count_distinct(F.col(key_col)).alias("n_keys"))
    return t.groupBy("template").agg(*aggs)


def sql_template_expr(
    text_expr: str,
    rules: Sequence[tuple[str, str]] = DEFAULT_MASK_RULES,
) -> str:
    """DuckDB mirror of :func:`template_col`. DuckDB's
    ``regexp_replace`` replaces only the FIRST match unless the 'g'
    flag is passed — Spark's always replaces all — so the mirror pins
    'g' explicitly."""
    expr = text_expr
    for pattern, repl in rules:
        lit = pattern.replace("'", "''")
        expr = f"regexp_replace({expr}, '{lit}', '{repl}', 'g')"
    return expr
