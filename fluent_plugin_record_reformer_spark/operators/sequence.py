"""Ordered-sequence analytics over per-key event streams.

The reference engine guarantees in-order event delivery within a tag
chunk (reference lib/fluent/plugin/out_record_reformer.rb `es.each`
loop — events are processed in arrival order); these operators
generalize that ordering guarantee to distributed history: each key's
events are totally ordered by an explicit (ts, tiebreak) pair, and
adjacent-pair statistics (Markov transitions, inter-event gaps) are
derived from that order.

Scale shape: ``lead()`` over ``Window.partitionBy(key)`` shuffles by
key once and sort-spills each partition — the sort is external
(spillable to disk), so unlike a ``collect_list`` sequence buffer a
pathological hot key degrades to disk I/O instead of an executor OOM.
That is why this module uses lag/lead windows and NEVER materializes a
per-key array.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def transitions(
    df: DataFrame,
    *,
    key_col: str,
    state_col: str,
    order_cols: Sequence[str],
    out_from: str = "from_state",
    out_to: str = "to_state",
) -> DataFrame:
    """Adjacent state pairs per key, in event order.

    Returns one row per consecutive event pair ``(key, from_state,
    to_state)`` — the raw material for a Markov transition matrix,
    funnel-free flow analysis, or anomaly scoring on improbable
    transitions. The last event of each key (no successor) is dropped.

    ``order_cols`` must be a DETERMINISTIC total order within a key
    (include a unique id as the final tiebreak column); otherwise the
    pairing — and any cross-engine comparison — is ambiguous on ties.
    """
    ordering = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*ordering)
    nxt = F.lead(state_col).over(w)
    return (
        df.select(key_col, state_col, *order_cols)
        .withColumn("_next", nxt)
        .filter(F.col("_next").isNotNull())
        .select(
            F.col(key_col),
            F.col(state_col).alias(out_from),
            F.col("_next").alias(out_to),
        )
    )


def transition_matrix(
    df: DataFrame,
    *,
    key_col: str,
    state_col: str,
    order_cols: Sequence[str],
) -> DataFrame:
    """First-order Markov transition counts over per-key sequences.

    One output row per observed ``(from_state, to_state)`` pair with
    the pair count and the number of distinct keys exhibiting it. The
    heavy input collapses through two hash aggregations (both with
    map-side partial agg); the only sort in the plan is the per-key
    window order that DEFINES the semantics.
    """
    t = transitions(
        df, key_col=key_col, state_col=state_col, order_cols=order_cols
    )
    return t.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.countDistinct(key_col).alias("n_keys"),
    )
