"""Property-based equivalence for the round-5 additions: for random
short strings, edit1_pairs must equal the naive all-pairs levenshtein
join (the symmetric-deletion candidates provably lose nothing); for
random coordinates, zvalue must equal a bit-by-bit Python interleave;
for random intervals, interval_concurrency must equal a brute-force
point-in-interval count at every boundary."""

from __future__ import annotations

import itertools
import sys
from pathlib import Path

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from fluent_plugin_record_reformer_spark.operators.dedup import (  # noqa: E402
    edit1_pairs,
)
from fluent_plugin_record_reformer_spark.operators.layout import (  # noqa: E402
    zvalue,
)
from fluent_plugin_record_reformer_spark.operators.sequence import (  # noqa: E402
    interval_concurrency,
)

PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


@PROP
@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=5),
        min_size=0,
        max_size=14,
    )
)
def test_edit1_pairs_equals_allpairs(spark, words):
    df = spark.createDataFrame(
        [(w,) for w in words] or [(None,)], "s string"
    )
    got = sorted(
        (r["str_a"], r["str_b"], r["dist"])
        for r in edit1_pairs(df, str_col="s").collect()
    )
    uniq = sorted(set(words))
    want = sorted(
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(uniq, 2)
        if _lev(a, b) <= 1
    )
    assert got == want


def _py_z(x: int, y: int, bits: int) -> int:
    x &= (1 << bits) - 1
    y &= (1 << bits) - 1
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@PROP
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1 << 20),
            st.integers(min_value=0, max_value=1 << 20),
        ),
        min_size=1,
        max_size=20,
    ),
    st.sampled_from([1, 5, 8, 13, 16]),
)
def test_zvalue_equals_python_interleave(spark, pts, bits):
    df = spark.createDataFrame(pts, "x long, y long")
    got = [
        (r["x"], r["y"], r["z"])
        for r in df.select(
            "x", "y", zvalue(F.col("x"), F.col("y"), bits=bits).alias("z")
        ).collect()
    ]
    for x, y, z in got:
        assert z == _py_z(x, y, bits), (x, y, bits)


@PROP
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2"]),
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=1, max_value=30),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_interval_concurrency_equals_bruteforce(spark, spans):
    iv = [(g, s, s + d) for g, s, d in spans]
    df = spark.createDataFrame(iv, "g string, s long, e long").select(
        "g",
        F.timestamp_seconds(F.col("s")).alias("s"),
        F.timestamp_seconds(F.col("e")).alias("e"),
    )
    got = {
        (r["g"], int(r["ts"].timestamp())): r["concurrent"]
        for r in interval_concurrency(
            df, group_col="g", start_col="s", end_col="e"
        ).collect()
    }
    want = {}
    for g in {x[0] for x in iv}:
        sp = [(s, e) for gg, s, e in iv if gg == g]
        for t in sorted({v for s, e in sp for v in (s, e)}):
            want[(g, t)] = sum(1 for s, e in sp if s <= t < e)
    assert got == want
