"""Property test: the single-pass extractor agrees with the per-field
path AND a Python `re` oracle on arbitrary lines — including lines
carrying the separator byte, partial matches, empties, and unicode.
This pins the joined!=input match condition added in round 5 (a
non-matching line with K-1 separator bytes must null out, never emit
garbage fields)."""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from fluent_plugin_record_reformer_spark.operators.parse import (  # noqa: E402
    grok_to_regex,
    regex_parse,
)

GROK = "k=%{WORD:k} v=%{INT:v} w=%{WORD:w} z=%{NOTSPACE:z}"
PATTERN, FIELDS = grok_to_regex(GROK)
# re.ASCII mirrors Java's default \w/\d (ASCII-only, no
# UNICODE_CHARACTER_CLASS) — the unicode fragment below is then a
# no-match for BOTH engines, which is the point of including it
RX = re.compile(PATTERN, re.ASCII)

# fragments that compose into near-miss lines, exact matches, and
# pathological separator-bearing payloads
fragment_st = st.sampled_from(
    [
        "k=ab v=12 w=cd z=ef",   # full match
        "k=ab v=12 w=cd",        # prefix-only (no match)
        "k= v=1 w=x z=y",        # empty first field (no match: WORD needs 1+)
        "\x01",                   # the single-pass separator itself
        "\x01\x01\x01",           # exactly K-1 separators
        "junk",
        "",
        "k=π v=-3 w=ü z=∞",      # unicode in \w and \S
        " leading k=a v=1 w=b z=c trailing",
    ]
)
line_st = st.lists(fragment_st, min_size=0, max_size=3).map(" ".join)


def _oracle(line: str) -> tuple:
    m = RX.search(line)
    if not m:
        return (None,) * len(FIELDS)
    return tuple((g if g != "" else None) for g in m.groups())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(lines=st.lists(line_st, min_size=1, max_size=12))
def test_single_pass_matches_per_field_and_python(spark, lines):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(lines)], "i long, text string")
    sel = ["i"] + list(FIELDS)
    per_field = {
        r["i"]: tuple(r[f] for f in FIELDS)
        for r in regex_parse(df, PATTERN, fields=FIELDS).select(*sel).collect()
    }
    single = {
        r["i"]: tuple(r[f] for f in FIELDS)
        for r in regex_parse(
            df, PATTERN, fields=FIELDS, single_pass=True
        ).select(*sel).collect()
    }
    for i, line in enumerate(lines):
        want = _oracle(line)
        assert per_field[i] == want, (line, per_field[i], want)
        if "\x01" in line:
            # separator-bearing lines: single-pass may null out a
            # TRUE match (documented trade) but must NEVER emit
            # values the oracle doesn't have
            assert single[i] == want or single[i] == (None,) * len(FIELDS), (
                line, single[i], want,
            )
        else:
            assert single[i] == want, (line, single[i], want)
