"""Transcript-table sources.

The engine's input is an Iceberg/Parquet table of multi-turn agent
transcripts with the fixed schema::

    conv_id:  string      -- conversation id (the fluentd-tag spine)
    turn_idx: int32       -- turn number within conversation
    role:     string      -- user / assistant / system / tool
    text:     string      -- raw turn text (regex/grok-parsed downstream)
    tool:     string      -- tool name or null
    ts:       timestamp   -- event time

Two deterministic constructors:

- :func:`synth_transcripts` — pure Spark-side synthesis from
  ``spark.range`` (hash-derived pseudo-randomness, NO driver loops, NO
  Python RNG) so the same (n_convs, seed) always yields the same table
  at any parallelism. Scales to any size without driver memory.
- :func:`transcripts_from_events` — derives the transcript shape from
  the driver-provided ``events`` testdata table with pure column ops +
  one window, so the DuckDB oracle can reproduce it exactly.

``with_tag`` derives the routing tag column
``transcripts.<role>.<tool|none>`` — the analog of the fluentd event
tag the reference routes on (core.rb:85-88).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "browser", "python", "calculator"]

# Deterministic event_type → (role, tool) mapping used by both the
# Spark derivation and the DuckDB oracle SQL (keep in sync with
# __spark_entry__.TRANSCRIPT_SQL).
EVENT_ROLE_CASE = (
    "CASE WHEN event_type IN ('click','view') THEN 'user' "
    "WHEN event_type IN ('purchase','signup') THEN 'assistant' "
    "ELSE 'system' END"
)
EVENT_TOOL_CASE = (
    "CASE WHEN event_type = 'purchase' THEN 'checkout' "
    "WHEN event_type = 'signup' THEN 'auth' ELSE NULL END"
)


def synth_transcripts(
    spark: SparkSession, n_convs: int = 1000, max_turns: int = 12, seed: int = 42
) -> DataFrame:
    """Deterministic synthetic transcript table, fully Spark-side.

    Turn counts, roles, tools, and text derive from ``xxhash64`` of the
    ids + seed — stable across runs and partitioning. One conversation
    = 2..max_turns alternating user/assistant turns with occasional
    system/tool turns.
    """
    convs = spark.range(n_convs).select(
        F.col("id").alias("conv_n"),
        F.format_string("conv-%06d", F.col("id")).alias("conv_id"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(max_turns - 1)) + 2)
        .cast("int")
        .alias("n_turns"),
    )
    turns = convs.select(
        "conv_n",
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    ).select(
        "conv_n",
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.xxhash64("conv_id", "turn_idx", F.lit(seed)).alias("h"),
    )
    role = (
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(F.pmod(F.col("h"), F.lit(7)) == 0, F.lit("tool"))
        .when(F.pmod(F.col("turn_idx"), F.lit(2)) == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    tool = F.when(
        role.isin("assistant", "tool"),
        F.element_at(
            F.array(*[F.lit(t) for t in TOOLS]),
            (F.pmod(F.col("h"), F.lit(len(TOOLS))) + 1).cast("int"),
        ),
    ).otherwise(F.lit(None).cast("string"))
    # Hash-chosen words → deterministic, compressible, regex-parseable text.
    words = F.array(
        *[
            F.lit(w)
            for w in (
                "alpha bravo charlie delta echo foxtrot golf hotel india "
                "juliet kilo lima mike november oscar papa"
            ).split()
        ]
    )
    text = F.format_string(
        "turn=%d role=%s msg=%s %s %s code=%d",
        F.col("turn_idx"),
        role,
        F.element_at(words, (F.pmod(F.abs(F.col("h")), F.lit(16)) + 1).cast("int")),
        F.element_at(words, (F.pmod(F.abs(F.col("h")) / 16, F.lit(16)) + 1).cast("int")),
        F.element_at(words, (F.pmod(F.abs(F.col("h")) / 256, F.lit(16)) + 1).cast("int")),
        F.pmod(F.abs(F.col("h")), F.lit(500)),
    )
    ts = F.timestamp_seconds(
        F.lit(1704067200)  # 2024-01-01T00:00:00Z
        + F.col("conv_n") * 3600
        + F.col("turn_idx") * 37
    )
    return turns.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def transcripts_from_events(events: DataFrame) -> DataFrame:
    """Deterministically reshape the testdata ``events`` table
    (event_id, ts, user_id, event_type, value, props) into the
    transcript schema. Pure column ops + one window so the DuckDB
    oracle reproduces it bit-for-bit.

    Scale note: the window partitions by user_id (conversation) — the
    same key the downstream groupBys use, so at cluster scale this is
    ONE shuffle reused across stages. The explicit repartition below
    pre-establishes exactly that partitioning (guide §2.4): the window
    then needs NO exchange of its own, and any round-robin fan-out the
    scan layer added (load_table on a one-row-group file) collapses
    into this one hash exchange (CollapseRepartition) — so the heavy
    per-row projections (format_string text render) always run at full
    parallelism for the price of the single shuffle the window always
    paid.
    """
    events = events.repartition(F.col("user_id"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        F.format_string("conv-%04d", F.col("user_id")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.expr(EVENT_ROLE_CASE).alias("role"),
        F.format_string(
            "event=%s value=%.2f props=%s", F.col("event_type"), F.col("value"), F.col("props")
        ).alias("text"),
        F.expr(EVENT_TOOL_CASE).alias("tool"),
        F.col("ts"),
    )


def with_tag(transcripts: DataFrame, root: str = "transcripts") -> DataFrame:
    """Derive the routing tag ``<root>.<role>.<tool|none>`` — the
    analog of the fluentd event tag (core.rb:85-88), exercised by every
    tag_parts/tag_prefix/tag_suffix placeholder."""
    return transcripts.withColumn(
        "tag",
        F.concat_ws(".", F.lit(root), F.col("role"), F.coalesce(F.col("tool"), F.lit("none"))),
    )
