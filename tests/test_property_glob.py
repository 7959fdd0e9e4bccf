"""Differential property test for fluentd tag-glob routing: the regex
compiler (operators/route.glob_to_regex) vs an independent recursive
part-based matcher written directly from fluentd's documented rules
(`*` = exactly one part, `**` = zero or more parts, `{a,b}` =
alternation — allowed mid-part and with alternatives containing dots).

Brace coverage is STRUCTURE-driven: patterns are generated as typed
elements and the expected expansion is computed from the structure
(never by re-parsing the pattern string), so the test shares no parsing
code with expand_braces.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fluent_plugin_record_reformer_spark.operators.route import (  # noqa: E402
    expand_braces,
    glob_to_regex,
)

PARTS = ["a", "b", "cc", "d1"]


def parts_match(pattern_parts: list[str], tag_parts: list[str]) -> bool:
    """Reference matcher for BRACE-FREE patterns, written independently
    of glob_to_regex."""
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
    return tag_parts[0] == head and parts_match(rest, tag_parts[1:])


# --- structured pattern generation ----------------------------------------
# An element is ("lit", part) | ("star",) | ("dstar",) |
# ("brace", [alt, ...]) where alt may contain dots |
# ("midbrace", prefix, [alt, ...]) — brace embedded mid-part.

lit_el = st.sampled_from(PARTS).map(lambda p: ("lit", p))
star_el = st.just(("star",))
dstar_el = st.just(("dstar",))
brace_alt = st.one_of(
    st.sampled_from(PARTS),
    st.tuples(st.sampled_from(PARTS), st.sampled_from(PARTS)).map(".".join),
)
brace_el = st.lists(brace_alt, min_size=2, max_size=3, unique=True).map(
    lambda xs: ("brace", xs)
)
midbrace_el = st.tuples(
    st.sampled_from(["x", "e2"]),
    st.lists(st.sampled_from(PARTS), min_size=2, max_size=2, unique=True),
).map(lambda t: ("midbrace", t[0], t[1]))

element_st = st.one_of(lit_el, star_el, dstar_el, brace_el, midbrace_el)
elements_st = st.lists(element_st, min_size=1, max_size=4)


def render(elements) -> str:
    out = []
    for el in elements:
        if el[0] == "lit":
            out.append(el[1])
        elif el[0] == "star":
            out.append("*")
        elif el[0] == "dstar":
            out.append("**")
        elif el[0] == "brace":
            out.append("{" + ",".join(el[1]) + "}")
        else:  # midbrace
            out.append(el[1] + "{" + ",".join(el[2]) + "}")
    return ".".join(out)


def expansions(elements) -> list[list[str]]:
    """All brace-free part-lists the structure denotes (computed from
    the structure, not from the rendered string)."""
    acc: list[list[str]] = [[]]
    for el in elements:
        if el[0] == "lit":
            acc = [pre + [el[1]] for pre in acc]
        elif el[0] == "star":
            acc = [pre + ["*"] for pre in acc]
        elif el[0] == "dstar":
            acc = [pre + ["**"] for pre in acc]
        elif el[0] == "brace":
            acc = [pre + alt.split(".") for pre in acc for alt in el[1]]
        else:  # midbrace: prefix glued to each alternative's FIRST part
            acc = [pre + [el[1] + alt] for pre in acc for alt in el[2]]
    return acc


tag_st = st.lists(
    st.sampled_from(PARTS + ["xa", "xb", "e2a"]), min_size=1, max_size=4
).map(".".join)


@settings(max_examples=500, deadline=None)
@given(elements=elements_st, tag=tag_st)
def test_glob_regex_matches_reference_matcher(elements, tag):
    pattern = render(elements)
    got = re.match(glob_to_regex(pattern), tag) is not None
    want = any(
        parts_match(parts, tag.split(".")) for parts in expansions(elements)
    )
    assert got == want, (pattern, tag, got, want)


@pytest.mark.parametrize(
    "pattern,tag,want",
    [
        ("a.x{b,c}", "a.xb", True),      # mid-part brace
        ("a.x{b,c}", "a.xc", True),
        ("a.x{b,c}", "a.xd", False),
        ("{a.b,c}", "a.b", True),        # alternative containing a dot
        ("{a.b,c}", "c", True),
        ("{a.b,c}", "a", False),
        ("a.**.**.b", "a.b", True),      # consecutive ** == one **
        ("a.**.**.b", "a.x.b", True),
        ("a.**.**.b", "a.x.y.b", True),
        ("a.**.**.b", "a.c", False),
        ("{a,{b,c}}.d", "b.d", True),    # nested braces
        ("{a,{b,c}}.d", "a.d", True),
    ],
)
def test_glob_brace_cases(pattern, tag, want):
    assert (re.match(glob_to_regex(pattern), tag) is not None) == want


def test_unbalanced_brace_raises():
    with pytest.raises(ValueError):
        glob_to_regex("a.{b,c")
    with pytest.raises(ValueError):
        glob_to_regex("a.b}")


def test_expand_braces_plain_passthrough():
    assert expand_braces("a.*.b.**") == ["a.*.b.**"]
