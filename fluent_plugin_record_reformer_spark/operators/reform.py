"""The reform operator: project + merge + tag rewrite + time rewrite.

Re-creates the reference's per-event ``reform`` / post-reform steps
(``core.rb:104-141``) as ONE lazy projection over the DataFrame:

1. tag rewrite from the spec's tag template (``core.rb:134``)
2. output record: ``renew_record ? {} : input`` + re-added
   ``keep_keys`` + merged spec map, spec keys overwriting in place
   (``core.rb:136-138``; Ruby Hash#merge! keeps original key order for
   overwritten keys — so does the Python dict used here)
3. drop events whose new tag is null (``core.rb:105``, test :568-578)
4. ``renew_time_key``: event time := record[key] as unix seconds,
   reading the OUTPUT record (``core.rb:106-108``)
5. ``remove_keys`` applied LAST (``core.rb:109``, CHANGELOG 0.8.3 —
   so renew_time_key can read a field that is then removed)

Everything is built-in Column expressions → Catalyst whole-stage
codegen; ``python_exprs`` fields alone use an Arrow pandas UDF.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.python_expr import python_expr_column
from ..plans.compiler import (
    ReformContext,
    compile_value,
    static_template_value,
    template_column,
)
from ..plans.spec import SpecError, TransformSpec


def _quoted(name: str) -> Column:
    return F.col("`%s`" % name.replace("`", ""))


def reform(
    df: DataFrame, spec: TransformSpec, ctx: Optional[ReformContext] = None
) -> DataFrame:
    """Apply one TransformSpec to an event frame.

    ``df`` must carry ``ctx.tag_col`` (string routing key) and
    ``ctx.time_col`` (timestamp); every other column is a record field.
    Returns a frame with the same meta columns (tag rewritten, time
    possibly renewed) + the reformed record columns.
    """
    ctx = ctx or ReformContext()
    columns = df.columns
    record_cols = [c for c in columns if c not in (ctx.tag_col, ctx.time_col)]

    if spec.tag_python_expr:
        # Expression-driven tag rewrite (core.rb:80 runs the tag
        # template through the ruby expander when enable_ruby): a
        # failing or null expression yields a null tag — the event is
        # DROPPED by the nil-tag filter below (core.rb:105, test
        # :568-578), never emitted with a broken tag.
        new_tag = python_expr_column(
            df,
            spec.tag_python_expr,
            tag_col=ctx.tag_col,
            time_col=ctx.time_col,
            hostname=ctx.hostname or "",
        ).cast("string")
    else:
        new_tag = template_column(
            spec.tag, ctx, columns, auto_typecast=spec.auto_typecast
        ).cast("string")

    # -- output record (core.rb:136-138) ------------------------------
    out: dict[str, Column] = {}
    if spec.renew_record:
        for k in spec.keep_keys:
            col = ctx.record_column(k, columns)
            if col is None:
                ctx.warn("keep_keys: `%s` not in input" % k)
                col = F.lit(None).cast("string")
            out[k] = col
    else:
        for c in record_cols:
            out[c] = _quoted(c)

    for key_template, value in spec.record.items():
        key = static_template_value(str(key_template), ctx)
        if key is None:
            raise SpecError(
                "record key `%s` needs per-row placeholders; output field "
                "names must resolve at compile time in a fixed-schema "
                "engine (use static_tag for tag-derived keys)" % key_template
            )
        out[key] = compile_value(value, ctx, columns, auto_typecast=spec.auto_typecast)

    for key, expr in spec.python_exprs.items():
        out[key] = python_expr_column(
            df, expr, tag_col=ctx.tag_col, time_col=ctx.time_col, hostname=ctx.hostname or ""
        )

    # -- renew_time_key (core.rb:106-108): to_i → unix seconds ---------
    # Ruby #to_i parity (core.rb:107): "123.45".to_i == 123 (truncate
    # toward zero, NOT bigint-parse-or-nothing), "12abc".to_i == 12
    # (leading-integer parse), non-numeric strings == 0. A NULL field
    # keeps the original event time — the columnar analog of "key not
    # in record" (a fixed schema can't distinguish absent from null).
    time_expr: Column = _quoted(ctx.time_col)
    if spec.renew_time_key and spec.renew_time_key in out:
        raw = out[spec.renew_time_key]
        # Dispatch on the STATIC type (driver-side analysis of the one
        # column, no job): Ruby String#to_i is a leading-integer parse
        # ("1e3".to_i == 1, "Infinity".to_i == 0, "123.45".to_i == 123),
        # while numeric #to_i truncates toward zero. Casting strings
        # through double first would silently apply float semantics.
        from pyspark.sql.types import StringType

        raw_type = df.select(raw.alias("__renew_probe")).schema[0].dataType
        if isinstance(raw_type, StringType):
            to_i = F.coalesce(
                F.regexp_extract(
                    raw, r"^\s*([+-]?\d+)", 1
                ).try_cast("long"),  # String#to_i: leading integer only
                F.lit(0).cast("long"),  # "abc".to_i == 0, "1e3" → 1 via regex
            )
        else:
            to_i = F.coalesce(
                raw.try_cast("double").cast("long"),  # numeric truncation
                F.lit(0).cast("long"),
            )
        time_expr = F.when(
            raw.isNotNull(), F.timestamp_seconds(to_i)
        ).otherwise(time_expr)

    # -- remove_keys LAST (core.rb:109) --------------------------------
    for k in spec.remove_keys:
        out.pop(k, None)

    # Two-step projection, computing every output under a fresh temp
    # name first. A single select with an output aliased back to an
    # input name (tag AS tag) trips Spark's lateral-column-alias
    # resolution INSIDE higher-order-function lambdas: deferred lambda
    # analysis binds `tag` to the same-select alias (the rewritten tag)
    # while the rest of the expression bound to the child — mixed old/
    # new references (caught by hypothesis: ${tag_suffix[0]} computed
    # suffixes of the OUTPUT tag, and crashed slice() with negative
    # lengths when part counts differed).
    tmp = {f"__reform_{i}": (k, col) for i, (k, col) in enumerate(out.items())}
    step1 = df.select(
        new_tag.alias("__reform_tag"),
        time_expr.alias("__reform_time"),
        *[col.alias(t) for t, (_, col) in tmp.items()],
    )
    projected = step1.select(
        F.col("__reform_tag").alias(ctx.tag_col),
        F.col("__reform_time").alias(ctx.time_col),
        *[F.col(t).alias(k) for t, (k, _) in tmp.items()],
    )
    # nil-tag drop (core.rb:105)
    return projected.filter(F.col("`%s`" % ctx.tag_col).isNotNull())
