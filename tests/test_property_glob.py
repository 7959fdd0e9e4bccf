"""Differential property test for fluentd tag-glob routing: the regex
compiler (operators/route.glob_to_regex) vs an independent recursive
part-based matcher written directly from fluentd's documented rules
(`*` = exactly one part, `**` = zero or more parts, `{a,b}` =
alternation inside a part)."""

from __future__ import annotations

import re
import sys
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fluent_plugin_record_reformer_spark.operators.route import (  # noqa: E402
    glob_to_regex,
)

PARTS = ["a", "b", "cc", "d1"]


def parts_match(pattern_parts: list[str], tag_parts: list[str]) -> bool:
    """Reference matcher, written independently of glob_to_regex."""
    if not pattern_parts:
        return not tag_parts
    head, rest = pattern_parts[0], pattern_parts[1:]
    if head == "**":
        # zero or more tag parts
        return any(
            parts_match(rest, tag_parts[i:]) for i in range(len(tag_parts) + 1)
        )
    if not tag_parts:
        return False
    if head == "*":
        return parts_match(rest, tag_parts[1:])
    if head.startswith("{") and head.endswith("}"):
        alts = head[1:-1].split(",")
        return tag_parts[0] in alts and parts_match(rest, tag_parts[1:])
    return tag_parts[0] == head and parts_match(rest, tag_parts[1:])


pattern_part_st = st.one_of(
    st.sampled_from(PARTS),
    st.just("*"),
    st.just("**"),
    st.lists(st.sampled_from(PARTS), min_size=2, max_size=3, unique=True).map(
        lambda xs: "{" + ",".join(xs) + "}"
    ),
)
def _no_adjacent_doublestar(parts: list[str]) -> bool:
    # '**.**' is degenerate (never written in real configs) and the
    # regex construction does not model it; excluded by contract
    return all(not (a == "**" and b == "**") for a, b in zip(parts, parts[1:]))


pattern_st = (
    st.lists(pattern_part_st, min_size=1, max_size=4)
    .filter(_no_adjacent_doublestar)
    .map(".".join)
)
tag_st = st.lists(st.sampled_from(PARTS), min_size=1, max_size=4).map(".".join)


@settings(max_examples=500, deadline=None)
@given(pattern=pattern_st, tag=tag_st)
def test_glob_regex_matches_reference_matcher(pattern, tag):
    got = re.match(glob_to_regex(pattern), tag) is not None
    want = parts_match(pattern.split("."), tag.split("."))
    assert got == want, (pattern, tag, got, want)
