"""Round-trip tests for the JSON-lines / CSV transcript sources."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from fluent_plugin_record_reformer_spark.sources.formats import (  # noqa: E402
    read_transcripts_csv,
    read_transcripts_json,
    write_transcripts_csv,
    write_transcripts_json,
)
from fluent_plugin_record_reformer_spark.sources.tables import load_table  # noqa: E402
from fluent_plugin_record_reformer_spark.sources.transcripts import (  # noqa: E402
    transcripts_from_events,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def transcripts(spark):
    return transcripts_from_events(load_table(spark, SF, "events"))


def _sorted_rows(df):
    return df.orderBy("conv_id", "turn_idx").collect()


def _names_types(df):
    # text sources are always nullable; compare names + types only
    return [(f.name, f.dataType) for f in df.schema.fields]


def test_json_roundtrip_lossless(spark, transcripts, tmp_path):
    path = str(tmp_path / "t.json")
    write_transcripts_json(transcripts, path)
    back = read_transcripts_json(spark, path, schema=transcripts.schema)
    assert _names_types(back) == _names_types(transcripts)
    assert _sorted_rows(back) == _sorted_rows(transcripts)


def test_csv_roundtrip_lossless(spark, transcripts, tmp_path):
    path = str(tmp_path / "t.csv")
    write_transcripts_csv(transcripts, path)
    back = read_transcripts_csv(spark, path, schema=transcripts.schema)
    assert _names_types(back) == _names_types(transcripts)
    assert _sorted_rows(back) == _sorted_rows(transcripts)


def test_json_malformed_lines_dont_fail(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.json").write_text(
        '{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi","tool":null,'
        '"ts":"2024-01-01 00:00:00.000000"}\n'
        "this is not json\n"
        '{"conv_id":"c1","turn_idx":"NOT_AN_INT","role":"user","text":"x","tool":null,'
        '"ts":"2024-01-01 00:00:01.000000"}\n'
    )
    got = read_transcripts_json(spark, str(p)).collect()
    assert len(got) == 3  # permissive: rows survive, bad fields null
    ok = [r for r in got if r["conv_id"] == "c1" and r["turn_idx"] == 0]
    assert len(ok) == 1


def test_parse_byte_string_suffixes():
    """spark.sql.files.maxPartitionBytes accepts Spark byte-strings like
    '128m'; scraping digits would read that as 128 BYTES and inflate the
    split estimate ~10^6x, silently skipping the small-input repartition."""
    from fluent_plugin_record_reformer_spark.sources.tables import _parse_byte_string

    assert _parse_byte_string("134217728b") == 134217728
    assert _parse_byte_string("134217728") == 134217728
    assert _parse_byte_string("128m") == 128 * 1024 * 1024
    assert _parse_byte_string("128MB") == 128 * 1024 * 1024
    assert _parse_byte_string("1g") == 1 << 30
    assert _parse_byte_string("64k") == 64 * 1024
    assert _parse_byte_string("garbage") == 134217728  # default, not 0
    assert _parse_byte_string("12zz") == 134217728  # unknown suffix -> default


def test_estimated_splits_uses_conf_suffix(spark, tmp_path):
    from fluent_plugin_record_reformer_spark.sources.tables import _estimated_scan_splits

    df = spark.range(1000).repartition(1)
    path = str(tmp_path / "t.parquet")
    df.write.parquet(path)
    scan = spark.read.parquet(path)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        est = _estimated_scan_splits(scan)
        # a few-KB file under a 128 MiB split size is exactly 1 split;
        # the digit-scraping bug made this ~(size/128) splits instead
        assert est == 1
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


# ---------------------------------------------------------------------------
# compact_parquet
# ---------------------------------------------------------------------------

from fluent_plugin_record_reformer_spark.sources.tables import (  # noqa: E402
    compact_parquet,
)


def test_compact_parquet_merges_small_files(spark, tmp_path):
    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    spark.range(50_000).selectExpr("id AS k", "id * 2 AS v").repartition(
        64
    ).write.parquet(src)
    import glob

    n_before = len(glob.glob(f"{src}/*.parquet"))
    assert n_before == 64
    total = sum(
        __import__("os").path.getsize(f) for f in glob.glob(f"{src}/*.parquet")
    )
    out = compact_parquet(
        spark, src, dst, target_file_bytes=max(1, total // 2)
    )
    n_after = len(glob.glob(f"{dst}/*.parquet"))
    assert n_after <= 3
    assert out.count() == 50_000
    assert out.agg({"v": "sum"}).first()[0] == spark.read.parquet(src).agg(
        {"v": "sum"}
    ).first()[0]


def test_compact_parquet_clusters_when_sorted(spark, tmp_path):
    src, dst = str(tmp_path / "s2"), str(tmp_path / "c2")
    spark.range(40_000).selectExpr("id % 1000 AS k").repartition(
        32
    ).write.parquet(src)
    import glob
    import os as osmod

    import pyarrow.parquet as pq

    total = sum(
        osmod.path.getsize(f) for f in glob.glob(f"{src}/*.parquet")
    )
    compact_parquet(
        spark, src, dst, target_file_bytes=max(1, total // 4), sort_cols=["k"]
    )
    spans = []
    for f in sorted(glob.glob(f"{dst}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        st = md.row_group(0).column(0).statistics
        spans.append((st.min, st.max))
    assert len(spans) >= 2
    # range clustering: file key spans are disjoint (ordered)
    for (_, hi1), (lo2, _) in zip(sorted(spans), sorted(spans)[1:]):
        assert hi1 <= lo2


def test_compact_parquet_rejects_empty_dir(spark, tmp_path):
    with pytest.raises(ValueError, match="no parquet files"):
        compact_parquet(spark, str(tmp_path / "nothing"), str(tmp_path / "o"))
