"""salted_join equivalence + plan shape; chunk_documents semantics."""

import pytest
from pyspark.sql import functions as F

from fluent_plugin_record_reformer_spark.operators.corpus import (
    chunk_documents,
)
from fluent_plugin_record_reformer_spark.operators.joins import salted_join


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_join_matches_plain_join(spark):
    facts = spark.range(0, 3000).select(
        F.col("id").alias("fid"),
        (F.col("id") % 3).alias("k"),  # 3 hot keys
    )
    dim = spark.createDataFrame(
        [(0, "a"), (1, "b"), (1, "b2"), (2, "c")], "k long, attr string"
    )
    plain = facts.join(dim, ["k"])
    salted = salted_join(facts, dim, ["k"], salt_col="fid", salt_partitions=7)
    assert _rows(plain, "k", "fid", "attr") == _rows(
        salted, "k", "fid", "attr"
    )


def test_salted_join_left_semantics(spark):
    facts = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "fid long, k long"
    )
    dim = spark.createDataFrame([(10, "x")], "k long, attr string")
    out = salted_join(
        facts, dim, ["k"], salt_col="fid", salt_partitions=4, how="left"
    )
    got = {r["fid"]: r["attr"] for r in out.collect()}
    assert got == {1: "x", 2: None, 3: None}


def test_salted_join_key_includes_salt(spark):
    facts = spark.range(0, 100).select(
        F.col("id").alias("fid"), (F.col("id") % 2).alias("k")
    )
    dim = spark.range(0, 2).select(F.col("id").alias("k"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )
    try:
        plan = (
            salted_join(facts, dim, ["k"], salt_col="fid", salt_partitions=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    assert "_salt" in plan and "BroadcastNestedLoop" not in plan


def test_salted_join_rejects_bad_partitions(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        salted_join(df, df, ["id"], salt_col="id", salt_partitions=0)


def _chunks(spark, text, chunk_tokens, overlap):
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return sorted(
        (r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(
            docs,
            id_col="doc_id",
            text_col="text",
            chunk_tokens=chunk_tokens,
            overlap=overlap,
        ).collect()
    )


def test_chunks_cover_and_overlap(spark):
    toks = [f"w{i}" for i in range(1, 21)]  # 20 tokens, N=8 V=2 stride=6
    got = _chunks(spark, " ".join(toks), 8, 2)
    assert got == [
        (1, " ".join(toks[0:8]), 8),
        (2, " ".join(toks[6:14]), 8),
        (3, " ".join(toks[12:20]), 8),
    ]


def test_chunks_suppress_redundant_tail(spark):
    # 8 tokens, N=8: exactly one chunk; a start at 7 would be a suffix
    # of chunk 1 and must be suppressed
    toks = [f"w{i}" for i in range(8)]
    got = _chunks(spark, " ".join(toks), 8, 2)
    assert got == [(1, " ".join(toks), 8)]


def test_chunks_short_doc_single_chunk(spark):
    got = _chunks(spark, "alpha beta", 16, 4)
    assert got == [(1, "alpha beta", 2)]


def test_chunks_empty_doc_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "...!!!"), (2, "ok token")], "doc_id long, text string"
    )
    out = chunk_documents(
        docs, id_col="doc_id", text_col="text", chunk_tokens=4, overlap=1
    )
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_chunks_validation(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(
            docs, id_col="doc_id", text_col="text", chunk_tokens=0
        )
    with pytest.raises(ValueError):
        chunk_documents(
            docs, id_col="doc_id", text_col="text", chunk_tokens=4, overlap=4
        )


def test_chunks_reconstruct_tokens(spark):
    # dropping each chunk's leading `overlap` tokens (except chunk 1)
    # and concatenating in chunk order must reproduce the document
    import random

    rng = random.Random(42)
    for trial in range(5):
        n = rng.randint(1, 60)
        toks = [f"t{rng.randint(0, 9)}x{i}" for i in range(n)]
        chunk_tokens = rng.randint(2, 12)
        overlap = rng.randint(0, chunk_tokens - 1)
        got = _chunks(spark, " ".join(toks), chunk_tokens, overlap)
        rebuilt = []
        for idx, (ci, text, ntok) in enumerate(got, start=1):
            assert ci == idx
            words = text.split(" ")
            assert len(words) == ntok
            rebuilt.extend(words if idx == 1 else words[overlap:])
        # every chunk after the first starts stride tokens later, so
        # the suffix past the overlap is new material ending at the doc
        assert rebuilt == toks, (n, chunk_tokens, overlap)


def test_salted_join_rejects_outer_modes(spark):
    facts = spark.createDataFrame([(1, 0)], "k long, fid long")
    dim = spark.createDataFrame([(1, "a")], "k long, attr string")
    # dim replication breaks right/full multiplicity: must raise, not
    # silently emit salt_partitions null-padded rows per unmatched dim
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError):
            salted_join(facts, dim, ["k"], salt_col="fid", how=how)
    # fact-preserving modes stay accepted
    for how in ("inner", "left", "left_outer", "leftsemi", "leftanti"):
        salted_join(facts, dim, ["k"], salt_col="fid", how=how)


def test_salted_join_rejects_working_column_clash(spark):
    facts = spark.createDataFrame([(1, 0, 9)], "k long, fid long, _salt long")
    dim = spark.createDataFrame([(1, "a")], "k long, attr string")
    with pytest.raises(ValueError):
        salted_join(facts, dim, ["k"], salt_col="fid")


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------

from fluent_plugin_record_reformer_spark.operators.aggregate import (  # noqa: E402
    mad_outliers,
)


def test_mad_outliers_flags_only_the_bot(spark):
    # 9 ordinary users at 90..110 cents, one bot at 100000
    vals = [90, 95, 98, 100, 100, 102, 105, 108, 110, 100_000]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "id int, g string, v long"
    )
    out = {
        r["id"]: (r["is_outlier"], r["group_median"], r["group_mad"])
        for r in mad_outliers(
            df, value_col="v", group_cols=["g"], k=3
        ).collect()
    }
    # rank rule: median = value at ceil(0.5*10) = rank 5 -> 100;
    # absdevs sorted = [0,0,2,2,5,5,8,10,10,99900] -> MAD = 5
    assert all(m == 100 and d == 5 for _, m, d in out.values())
    flagged = {i for i, (f, _, _) in out.items() if f}
    assert flagged == {9}  # the bot, and ONLY the bot


def test_mad_histogram_path_equals_chunked(spark):
    """r6: the low_cardinality histogram-median path must reproduce
    the chunked-rank path row-for-row (same rank-ceil(n/2) rule, same
    schema/column order), on data with ties, skew, and a group whose
    size is even — the cases where a different median rule would
    diverge."""
    import random

    rng = random.Random(7)
    rows = [
        (i, g, rng.choice([90, 95, 100, 100, 102, 105, 100_000]))
        for g in ("a", "b", "c")
        for i in range(101 if g != "b" else 100)
    ]
    df = spark.createDataFrame(rows, "id int, g string, v long")
    a = mad_outliers(df, value_col="v", group_cols=["g"], k=3)
    b = mad_outliers(
        df, value_col="v", group_cols=["g"], k=3, low_cardinality=True
    )
    assert a.schema == b.schema
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # and the histogram path's plan must have NO range exchange (the
    # whole point: no full-row rank pass)
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()


def test_mad_outliers_zero_mad_group(spark):
    # constant group: MAD = 0 -> any deviation is an outlier
    df = spark.createDataFrame(
        [(0, "g", 5), (1, "g", 5), (2, "g", 5), (3, "g", 6)],
        "id int, g string, v long",
    )
    out = {
        r["id"]: r["is_outlier"]
        for r in mad_outliers(df, value_col="v", group_cols=["g"]).collect()
    }
    assert out == {0: False, 1: False, 2: False, 3: True}


from fluent_plugin_record_reformer_spark.operators.aggregate import (  # noqa: E402
    equi_depth_bins,
)


def test_equi_depth_bins_sizes_and_spans(spark):
    # 100 skewed values: equi-WIDTH would put 91 rows in one bin;
    # equi-depth must yield 25±0 rows per bin by construction
    vals = list(range(90)) + [1000, 2000, 3000, 4000, 5000, 6000, 7000,
                              8000, 9000, 10000]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    out = sorted(
        (r["bin"], r["n_rows"], r["lo"], r["hi"])
        for r in equi_depth_bins(
            df, value_col="v", group_cols=["g"], bins=4
        ).collect()
    )
    assert [b for b, *_ in out] == [1, 2, 3, 4]
    assert all(n == 25 for _, n, *_ in out)
    # spans are ordered and non-overlapping
    for (b1, _, _, hi1), (b2, _, lo2, _) in zip(out, out[1:]):
        assert hi1 <= lo2
    assert out[3][3] == 10000


def test_equi_depth_bins_rejects_bad_bins(spark):
    df = spark.createDataFrame([("g", 1)], "g string, v long")
    with pytest.raises(ValueError, match="bins"):
        equi_depth_bins(df, value_col="v", group_cols=["g"], bins=0)
