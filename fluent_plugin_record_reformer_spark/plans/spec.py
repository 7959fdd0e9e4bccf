"""TransformSpec — the declarative query of this engine.

Mirrors the reference's plugin configuration (``core.rb:11-27``
option params, ``core.rb:31-83`` ``configure``): a tag-rewrite
template, a record map of ``out_key → value-template``, and option
flags. Validation errors raise at construction, matching the
reference's fatal ``ConfigError``s (``core.rb:53,62``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Optional

# Reserved option keys never mapped into records (core.rb:29).
BUILTIN_CONFIGURATIONS = frozenset(
    {
        "@id",
        "@type",
        "@label",
        "type",
        "tag",
        "output_tag",
        "remove_keys",
        "renew_record",
        "keep_keys",
        "enable_ruby",
        "renew_time_key",
        "auto_typecast",
        "tag_python_expr",
    }
)


class SpecError(ValueError):
    """Invalid spec (the reference's Fluent::ConfigError)."""


def parse_value(value: Any) -> Any:
    """Config values starting with ``{``/``[`` are JSON literals
    (``core.rb:120-129``); parse failures fall back to the raw string."""
    if isinstance(value, str) and value[:1] in ("{", "["):
        try:
            return json.loads(value)
        except (json.JSONDecodeError, ValueError):
            return value
    return value


@dataclass
class TransformSpec:
    """One parse→reform→route transform.

    Fields map 1:1 to the reference's options:

    - ``tag``: output-tag template, required (``core.rb:61-63``)
    - ``record``: out_key → value template / JSON literal
      (``core.rb:34-46``; keys may contain placeholders, test :385-403)
    - ``remove_keys``: dropped LAST, after renew_time_key has read its
      field (``core.rb:109``, CHANGELOG 0.8.3)
    - ``keep_keys``: requires ``renew_record`` (``core.rb:52-55``)
    - ``renew_record``: start output from {} (``core.rb:136``)
    - ``renew_time_key``: event time := record[key].to_i (``core.rb:106-108``)
    - ``auto_typecast``: single-placeholder native-type passthrough
      (``core.rb:25-26``)
    - ``enable_ruby`` → ``python_exprs``: per-field vectorized Python
      expressions (the reference's ruby sandbox, ``core.rb:252-343``,
      re-expressed as Arrow-batched pandas exprs; see
      functions/python_expr.py)
    - ``tag_python_expr``: expression-driven tag rewrite — with
      ``enable_ruby`` the reference runs the TAG template through the
      ruby expander too (``core.rb:80``); a failing/null expression
      drops the event (``core.rb:105``, test :568-578). Exactly one of
      ``tag`` / ``tag_python_expr`` must be given.
    """

    tag: Optional[str] = None
    record: dict[str, Any] = field(default_factory=dict)
    remove_keys: list[str] = field(default_factory=list)
    keep_keys: list[str] = field(default_factory=list)
    renew_record: bool = False
    renew_time_key: Optional[str] = None
    auto_typecast: bool = False
    python_exprs: dict[str, str] = field(default_factory=dict)
    tag_python_expr: Optional[str] = None

    def __post_init__(self) -> None:
        if not self.tag and not self.tag_python_expr:
            raise SpecError("`tag` must be specified")  # core.rb:61-63
        if self.tag and self.tag_python_expr:
            raise SpecError("give either `tag` or `tag_python_expr`, not both")
        if self.keep_keys and not self.renew_record:
            raise SpecError(
                "`renew_record` must be true to use `keep_keys`"
            )  # core.rb:52-55
        self.record = {k: parse_value(v) for k, v in self.record.items()}

    @classmethod
    def from_config(cls, conf: dict[str, Any]) -> "TransformSpec":
        """Build from a flat fluentd-style config dict: reserved option
        keys + free-form ``key value`` pairs + optional ``record``
        sub-dict (the ``<record>`` directive, ``core.rb:41-46``)."""
        record: dict[str, Any] = {}
        for k, v in conf.items():
            if k in BUILTIN_CONFIGURATIONS or k in ("record", "python_exprs"):
                continue
            record[k] = v
        record.update(conf.get("record", {}) or {})

        tag = conf.get("tag") or conf.get("output_tag")
        if tag is None and not conf.get("tag_python_expr"):
            raise SpecError("`tag` must be specified")

        def _split(v: Any) -> list[str]:
            if not v:
                return []
            if isinstance(v, str):
                return v.split(",")
            return list(v)

        return cls(
            tag=tag,
            record=record,
            remove_keys=_split(conf.get("remove_keys")),
            keep_keys=_split(conf.get("keep_keys")),
            renew_record=bool(conf.get("renew_record", False)),
            renew_time_key=conf.get("renew_time_key"),
            auto_typecast=bool(conf.get("auto_typecast", False)),
            python_exprs=dict(conf.get("python_exprs", {}) or {}),
            tag_python_expr=conf.get("tag_python_expr"),
        )
