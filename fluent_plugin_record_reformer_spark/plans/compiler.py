"""Template → Spark ``Column`` compiler.

The reference resolves placeholders per event against a dict built for
every record (``core.rb:199-222``). This compiler performs that
resolution ONCE, driver-side, emitting vectorized ``Column``
expressions that Catalyst folds into whole-stage codegen — the
columnar inversion of the reference's row-at-a-time loop.

Semantics preserved (with file:line into /root/reference):

- null placeholder values stringify to ``""`` inside templates (Ruby
  ``gsub`` of nil, ``core.rb:236-239``) → ``coalesce(cast(c,string),'')``
- unknown placeholders → warning + ``""`` (``core.rb:244-248``)
- ``auto_typecast`` single-placeholder templates keep the native
  column type (``core.rb:228-235``, tests ``:405-511``)
- reserved keys shadow record keys for bare ``${key}`` access
  (``core.rb:211``); ``${record["key"]}`` always reads the record
- hash literal values expand keys AND values recursively
  (``core.rb:143-161``); arrays element-wise
- per-chunk tag hoisting (``core.rb:86-96``) generalizes to
  compile-time constant folding when the route's input tag is static
  (``static_tag``), and to runtime array exprs when it is per-row.
"""

from __future__ import annotations

import socket
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .template import (
    HostnameRef,
    Literal,
    RecordRef,
    TagAffixRef,
    TagPartRef,
    TagRef,
    TimeRef,
    Token,
    UnknownRef,
    tokenize,
)

# Matches Ruby's Time#to_s rendering "2010-05-04 03:02:01 +0000"
# (core.rb:191-193) under a UTC session timezone.
DEFAULT_TIME_FORMAT = "yyyy-MM-dd HH:mm:ss Z"


def _quoted(name: str) -> Column:
    """Column ref that tolerates dots/@ in field names (test :513-533)."""
    return F.col("`%s`" % name.replace("`", ""))


@dataclass
class ReformContext:
    """Binds spec placeholders to physical columns of the input frame.

    ``tag_col``/``time_col`` play the reference's event ``tag``/``time``
    (``core.rb:85-103``); every other column is a record field. When a
    record field must coexist with a same-named reserved column, map it
    via ``record_aliases`` (logical record key → physical column).

    ``static_tag``: when a route consumes one known tag (fluentd
    delivers per-match chunks of one tag, ``core.rb:86-96``), tag
    placeholders fold to compile-time literals — zero runtime cost.
    """

    tag_col: str = "tag"
    time_col: str = "ts"
    hostname: Optional[str] = None
    static_tag: Optional[str] = None
    record_aliases: dict[str, str] = field(default_factory=dict)
    time_format: str = DEFAULT_TIME_FORMAT
    warnings: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        if self.hostname is None:
            self.hostname = socket.gethostname()

    # -- record-field resolution -------------------------------------
    def record_column(self, key: str, columns: Sequence[str]) -> Optional[Column]:
        phys = self.record_aliases.get(key, key)
        if phys in columns:
            return _quoted(phys)
        return None

    def warn(self, msg: str) -> None:
        self.warnings.append(msg)

    # -- tag decomposition (core.rb:86-88, 163-180) -------------------
    def tag_parts_expr(self) -> Column:
        return F.split(_quoted(self.tag_col), r"\.")

    def _static_parts(self) -> Optional[list[str]]:
        if self.static_tag is None:
            return None
        return self.static_tag.split(".")

    def tag_part(self, index: int) -> Optional[Column]:
        """``${tag_parts[N]}`` with negative indexing (core.rb:207)."""
        parts = self._static_parts()
        if parts is not None:
            if -len(parts) <= index < len(parts):
                return F.lit(parts[index])
            return None  # out of range → unknown
        arr = self.tag_parts_expr()
        # try_element_at: 1-based, negative from end, null when out of
        # range — exactly the reference's dict-miss → "" behavior once
        # string-coalesced. ANSI-safe (no OOB error).
        return F.try_element_at(arr, F.lit(index + 1 if index >= 0 else index))

    def tag_affix(self, kind: str, index: int) -> Optional[Column]:
        """``${tag_prefix[N]}`` / ``${tag_suffix[N]}`` (core.rb:163-180).

        prefix of a.b.c = ["a","a.b","a.b.c"]; suffix = ["a.b.c","b.c","c"].
        """
        parts = self._static_parts()
        if parts is not None:
            n = len(parts)
            if not (-n <= index < n):
                return None
            i = index % n
            joined = ".".join(parts[: i + 1] if kind == "prefix" else parts[i:])
            return F.lit(joined)
        # ONE codegen'd substring_index instead of materializing the
        # whole affix array per row (transform over sequence, each
        # element an array_join of a slice — O(n^2) interpreted work
        # in the pipeline's hottest expression; stage-decomposed A/B
        # showed reform dominating the e2e wall time because of it):
        # prefix[i] = first c parts (positive count), suffix[i] = last
        # m parts (negative count), with the element count n derived
        # from the dot count — all plain string expressions inside
        # whole-stage codegen. Out-of-range indexes null exactly like
        # try_element_at did.
        tag = _quoted(self.tag_col)
        n = F.length(tag) - F.length(F.translate(tag, ".", "")) + F.lit(1)
        if kind == "prefix":
            c = F.lit(index + 1) if index >= 0 else (n + F.lit(index + 1))
            valid = (c >= 1) & (c <= n)
            cnt = c
        else:
            m = (n - F.lit(index)) if index >= 0 else F.lit(-index)
            valid = (m >= 1) & (m <= n)
            cnt = -m
        return F.when(valid, F.call_function("substring_index", tag, F.lit("."), cnt))


def token_column(
    token: Token, ctx: ReformContext, columns: Sequence[str]
) -> Optional[Column]:
    """Resolve one placeholder token to its native-typed Column.

    Returns None for unresolvable tokens (→ "" + warning downstream,
    core.rb:244-248).
    """
    if isinstance(token, TagRef):
        return F.lit(ctx.static_tag) if ctx.static_tag is not None else _quoted(ctx.tag_col)
    if isinstance(token, TimeRef):
        return _quoted(ctx.time_col)
    if isinstance(token, HostnameRef):
        return F.lit(ctx.hostname)
    if isinstance(token, TagPartRef):
        return ctx.tag_part(token.index)
    if isinstance(token, TagAffixRef):
        return ctx.tag_affix(token.kind, token.index)
    if isinstance(token, RecordRef):
        col = ctx.record_column(token.key, columns)
        if col is None:
            return None
        if token.index is not None:
            col = F.try_element_at(
                col, F.lit(token.index + 1 if token.index >= 0 else token.index)
            )
        return col
    return None  # UnknownRef


def _string_piece(token: Token, col: Optional[Column], ctx: ReformContext) -> Column:
    """Render one token as a string fragment; nil → "" (core.rb:236-239)."""
    if isinstance(token, Literal):
        return F.lit(token.text)
    if col is None:
        return F.lit("")
    if isinstance(token, TimeRef):
        # Ruby renders Time#to_s for ${time} in templates (core.rb:191).
        col = F.date_format(col, ctx.time_format)
    return F.coalesce(col.cast("string"), F.lit(""))


def template_column(
    template: str,
    ctx: ReformContext,
    columns: Sequence[str],
    *,
    auto_typecast: bool = False,
    force_stringify: bool = False,
) -> Column:
    """Compile one string template to a Column.

    auto_typecast + exactly-one-placeholder → native type passthrough
    (core.rb:228-235); otherwise string concatenation of pieces.
    """
    tokens = tokenize(template)
    if (
        auto_typecast
        and not force_stringify
        and len(tokens) == 1
        and not isinstance(tokens[0], Literal)
    ):
        col = token_column(tokens[0], ctx, columns)
        if col is None:
            ctx.warn("unknown placeholder `%s` found" % template)
            return F.lit(None).cast("string")
        return col

    pieces = []
    for tok in tokens:
        col = None if isinstance(tok, Literal) else token_column(tok, ctx, columns)
        if col is None and isinstance(tok, (RecordRef, UnknownRef)):
            ctx.warn("unknown placeholder in `%s` found" % template)
        pieces.append(_string_piece(tok, col, ctx))
    if not pieces:
        return F.lit("")
    if len(pieces) == 1:
        return pieces[0]
    return F.concat(*pieces)


def static_template_value(template: str, ctx: ReformContext) -> Optional[str]:
    """Fold a template to a compile-time string when every token is a
    driver-side constant (literals, hostname, static-tag parts).

    Used for output *field names* containing placeholders (test
    :385-403) — a fixed-schema world needs names at compile time.
    """
    out: list[str] = []
    for tok in tokenize(template):
        if isinstance(tok, Literal):
            out.append(tok.text)
        elif isinstance(tok, HostnameRef):
            out.append(ctx.hostname or "")
        elif isinstance(tok, TagRef) and ctx.static_tag is not None:
            out.append(ctx.static_tag)
        elif isinstance(tok, TagPartRef) and ctx.static_tag is not None:
            parts = ctx.static_tag.split(".")
            out.append(parts[tok.index] if -len(parts) <= tok.index < len(parts) else "")
        elif isinstance(tok, TagAffixRef) and ctx.static_tag is not None:
            parts = ctx.static_tag.split(".")
            n = len(parts)
            if -n <= tok.index < n:
                i = tok.index % n
                out.append(
                    ".".join(parts[: i + 1] if tok.kind == "prefix" else parts[i:])
                )
            else:
                out.append("")
        else:
            return None
    return "".join(out)


def compile_value(
    value: Any,
    ctx: ReformContext,
    columns: Sequence[str],
    *,
    auto_typecast: bool = False,
) -> Column:
    """Compile a spec value — string template, JSON hash/array literal
    (``core.rb:120-129``), or scalar — expanding placeholders
    recursively incl. hash keys (``core.rb:143-161``).

    Hash literals: all-static keys → ``struct`` (field types native);
    any dynamic key → ``map<string,string>`` (Spark maps need uniform
    value types; divergence from Ruby's heterogeneous Hash is pinned in
    tests).
    """
    if isinstance(value, str):
        return template_column(value, ctx, columns, auto_typecast=auto_typecast)
    if isinstance(value, dict):
        static_keys = [static_template_value(str(k), ctx) for k in value]
        if all(k is not None for k in static_keys):
            fields = [
                compile_value(v, ctx, columns, auto_typecast=auto_typecast).alias(sk)
                for sk, v in zip(static_keys, value.values())
            ]
            return F.struct(*fields)
        keys = [
            template_column(str(k), ctx, columns, force_stringify=True) for k in value
        ]
        vals = [
            compile_value(v, ctx, columns, auto_typecast=auto_typecast).cast("string")
            for v in value.values()
        ]
        return F.map_from_arrays(F.array(*keys), F.array(*vals))
    if isinstance(value, list):
        elems = [
            compile_value(v, ctx, columns, auto_typecast=auto_typecast) for v in value
        ]
        # Heterogeneous element types can't share a Spark array — keep
        # native when uniform-scalar via auto_typecast single tokens;
        # F.array itself enforces a common type, so rely on implicit
        # coercion and fall back to string on failure at analysis time.
        return F.array(*elems)
    return F.lit(value)
