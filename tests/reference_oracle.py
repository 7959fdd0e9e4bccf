"""Pure-Python oracle of the reference's reform semantics.

A from-scratch, dict-based re-statement of what
/root/reference/lib/.../core.rb does per event (placeholder dict →
gsub expand → merge → remove), used ONLY in tests as the expected
output for the Spark engine. Written fresh from the SURVEY.md semantic
notes — not a code copy.
"""

from __future__ import annotations

import re
from typing import Any

PLACEHOLDER_RE = re.compile(r"(\$\{[^}]+\}|__[A-Z_]+__)")
SINGLE_RE = re.compile(r"\A(\$\{[^}]+\}|__[A-Z_]+__)\Z")


def tag_prefixes(parts: list[str]) -> list[str]:
    return [".".join(parts[: i + 1]) for i in range(len(parts))]


def tag_suffixes(parts: list[str]) -> list[str]:
    return [".".join(parts[i:]) for i in range(len(parts))]


def build_placeholders(
    tag: str, time_str: str, record: dict[str, Any], hostname: str
) -> dict[str, Any]:
    values: dict[str, Any] = {
        "tag": tag,
        "tags": tag.split("."),
        "tag_parts": tag.split("."),
        "tag_prefix": tag_prefixes(tag.split(".")),
        "tag_suffix": tag_suffixes(tag.split(".")),
        "hostname": hostname,
        "time": time_str,
        "record": record,
    }
    ph: dict[str, Any] = {}
    for key, value in values.items():
        if isinstance(value, list):
            n = len(value)
            for i, v in enumerate(value):
                ph[f"${{{key}[{i}]}}"] = v
                ph[f"${{{key}[{i - n}]}}"] = v
        elif isinstance(value, dict):
            for k, v in value.items():
                if k not in values:  # reserved keys shadow record keys
                    ph[f"${{{k}}}"] = v
                ph[f'${{{key}["{k}"]}}'] = v
                ph[f"${{{key}['{k}']}}"] = v  # engine accepts both quote styles
        else:
            ph[f"${{{key}}}"] = value
    return ph


def _to_s(v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, list):
        return "[" + ", ".join(_to_s(x) for x in v) + "]"  # Spark array render
    return str(v)


def expand(template: str, ph: dict[str, Any], auto_typecast: bool, force_str=False) -> Any:
    if auto_typecast and not force_str and SINGLE_RE.match(template):
        return ph.get(template)
    return PLACEHOLDER_RE.sub(lambda m: _to_s(ph.get(m.group(1))), template)


def expand_value(value: Any, ph: dict[str, Any], auto_typecast: bool) -> Any:
    if isinstance(value, str):
        return expand(value, ph, auto_typecast)
    if isinstance(value, dict):
        return {
            expand(str(k), ph, auto_typecast, force_str=True): expand_value(v, ph, auto_typecast)
            for k, v in value.items()
        }
    if isinstance(value, list):
        return [expand_value(v, ph, auto_typecast) for v in value]
    return value


def reform_event(
    spec,
    tag: str,
    time_str: str,
    record: dict[str, Any],
    hostname: str,
) -> tuple[str, dict[str, Any]]:
    """Expected (new_tag, new_record) for one event under a
    TransformSpec (without python_exprs)."""
    ph = build_placeholders(tag, time_str, record, hostname)
    new_tag = expand(spec.tag, ph, spec.auto_typecast)
    new_record = {} if spec.renew_record else dict(record)
    if spec.renew_record and spec.keep_keys:
        for k in spec.keep_keys:
            new_record[k] = record.get(k)
    for k, v in spec.record.items():
        key = expand(str(k), ph, spec.auto_typecast, force_str=True)
        new_record[key] = expand_value(v, ph, spec.auto_typecast)
    for k in spec.remove_keys:
        new_record.pop(k, None)
    return new_tag, new_record
