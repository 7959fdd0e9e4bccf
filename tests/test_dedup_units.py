"""Unit tests for dedup operators beyond the oracle gate: the
max_bucket flood cap and exact-dedup keeper semantics."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from fluent_plugin_record_reformer_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    lsh_candidate_pairs,
    minhash_lsh,
)


def _docs(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog every day") for i in range(20)]
    rows += [(100 + i, f"unique document number {i} about topic {i * 7} with words") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeper_is_min_id(spark):
    out = {r["text"]: (r["keep_id"], r["n_copies"]) for r in exact_dedup(_docs(spark)).collect()}
    flood = "the quick brown fox jumps over the lazy dog every day"
    assert out[flood] == (0, 20)
    assert all(n == 1 for t, (_, n) in out.items() if t != flood)


def test_max_bucket_caps_identical_doc_flood(spark):
    docs = _docs(spark)
    banded = minhash_lsh(docs)
    # uncapped: the 20 identical docs alone produce C(20,2)=190 pairs
    uncapped = lsh_candidate_pairs(banded).count()
    assert uncapped >= 190
    # capped at 8 members per bucket: the flood bucket is excluded
    capped = lsh_candidate_pairs(banded, max_bucket=8)
    flood_ids = set(range(20))
    got_pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert not any(a in flood_ids and b in flood_ids for a, b in got_pairs)
