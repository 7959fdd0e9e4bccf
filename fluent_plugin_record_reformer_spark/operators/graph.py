"""Integer-exact distributed PageRank (and the TextRank edge builder).

PageRank's textbook form sums floating-point contributions whose
addition order is nondeterministic under distributed aggregation — the
same defect that makes naive float sums fail cross-engine value
hashes. This implementation keeps every rank an INT64 in fixed-point
``scale`` units:

    r_{t+1}(v) = ((scale * (100 - d100)) div 100)
               + (d100 * Σ_{u→v} (r_t(u) * w(u,v) div W(u))) div 100

All products stay < 2^63 for scale ≤ 10^6 and corpora up to ~10^11
total edge weight; sums of int64 are order-free, so the result is
bit-identical across partitionings, reruns, AND engines — a DuckDB
oracle unrolls the iterations as CTEs and hash-matches exactly.

Scale shape: each iteration is one shuffle join (edges × ranks on src,
both hash-partitioned by the same key) plus one partial-aggregated
groupBy(dst). The edge table's exchange subtree is IDENTICAL in every
iteration, so Spark's exchange reuse (pinned on by session.py — see
operators/curation._require_exchange_reuse) materializes it once and
rereads it; iterations are a FIXED count (the semantics), not a
driver-side convergence loop, so the whole ladder is one lazy plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as SqlWindow
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    iterations: int,
    damping_pct: int = 85,
    scale: int = 10_000,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
) -> DataFrame:
    """Weighted PageRank over an edge list, in exact fixed-point.

    ``edges`` holds (src, dst, weight≥1); node set = all endpoints.
    Nodes without incoming edges settle at the base rank
    ``scale*(100-damping_pct) div 100``; dangling nodes (no outgoing
    edges) simply contribute nothing — symmetrize the edge list first
    if mass conservation matters (TextRank's co-occurrence graph is
    symmetric by construction, so there every node has out-edges).

    Output: (node, rank) with rank in fixed-point ``scale`` units.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1: {iterations}")
    if not 1 <= damping_pct <= 99:
        raise ValueError(f"damping_pct must be in [1, 99]: {damping_pct}")
    # In-plan guard for the weight>=1 contract (same pattern as the
    # funnel / range-join span guards): a zero total out-weight would
    # make `rank * _w div _wt` NULL and silently VANISH that node's
    # rank mass (while the DuckDB mirror errors) — fail loudly instead.
    # The assert is tied into the used column so constant folding
    # cannot drop it; NULL weights fail the coalesced condition too.
    # Guard on the LEFT of the add: binary ops null-short-circuit on a
    # NULL LEFT operand without evaluating the right, so `w + guard`
    # would silently skip the assert exactly when w IS NULL — the case
    # it must catch (same lesson as the funnel/range-join guards).
    w = F.col(weight_col).cast("long")
    guard = F.assert_true(
        F.coalesce(w >= 1, F.lit(False)),
        F.lit("pagerank: every edge weight must be a non-null integer >= 1"),
    )
    e = edges.select(
        F.col(src_col).alias("_src"),
        F.col(dst_col).alias("_dst"),
        (F.coalesce(guard.cast("long"), F.lit(0)) + w).alias("_w"),
    )
    # The edge frame feeds several consumers, and Catalyst's column
    # pruning used to hand each one a DIFFERENT canonical subtree
    # (src-only, dst-only, src+weight, all three), so exchange reuse
    # never fired below them and the whole upstream edge build — for
    # TextRank: tokenize + position explode + the co-occurrence agg —
    # executed once PER CONSUMER (4x; 5 input scans / 20 regexp sites
    # in the executed plan). Round-6 shape cuts the builds to 2:
    # - ``nodes`` comes from ONE branch via explode(array(src, dst))
    #   instead of a two-branch union (halves its share);
    # - per-source total out-weight is a window sum over _src instead
    #   of a groupBy + self-join — no join, and the window's hash
    #   exchange on _src is exactly the layout every iteration's
    #   ranks-join needs, so it is materialized once and ReusedExchange'd
    #   by all iterations (executed plan: 2 scans / 8 regexp sites;
    #   interleaved A/B sf0.1 2.05→0.88 s, 10x replica 4.79→2.80 s).
    # Same-key skew profile as the old join (a high-out-degree source
    # collocates its edges under either shape); int64 sums are
    # order-free so the window is bit-identical to the joined agg.
    nodes = e.select(
        F.explode(F.array("_src", "_dst")).alias("node")
    ).distinct()
    ew = e.withColumn(
        "_wt", F.sum("_w").over(SqlWindow.partitionBy("_src"))
    )
    base = (scale * (100 - damping_pct)) // 100
    ranks = nodes.select("node", F.lit(int(scale)).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = ew.join(
            ranks.withColumnRenamed("node", "_src"), on="_src"
        ).select(
            F.col("_dst").alias("node"),
            F.expr("rank * _w div _wt").alias("_c"),
        )
        incoming = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        ranks = nodes.join(incoming, on="node", how="left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"{int(damping_pct)} * coalesce(_s, 0L) div 100"
                )
            ).alias("rank"),
        )
    return ranks


def cooccurrence_edges(
    docs: DataFrame,
    *,
    text_col: str,
    tokenize,
) -> DataFrame:
    """Symmetric adjacent-token co-occurrence edges for TextRank.

    Every adjacent token pair (t[i], t[i+1]) across the corpus becomes
    an undirected edge; weights count occurrences in both directions
    (the pair is emitted twice, once per direction, so the graph is
    symmetric and has no dangling nodes). Self-loops (repeated tokens)
    are dropped — they only feed a node's rank back to itself.

    One staged tokenization, one ``explode(sequence(...))`` of
    POSITIONS (pure codegen — no pair-building HOF), then one more
    2-element explode that emits BOTH directions of each adjacency in
    the same pass (r6: the former two-branch union re-ran the
    tokenize+position-explode subtree once per direction — no
    exchange sits below a union, so nothing was reused), one partial-
    aggregated groupBy. Documents with fewer than 2 tokens contribute
    nothing.
    """
    staged = docs.select(tokenize(text_col).alias("_toks")).filter(
        F.size("_toks") >= 2
    )
    pos = staged.select(
        "_toks",
        F.explode_outer(
            F.sequence(F.lit(1), F.size("_toks") - 1)
        ).alias("_i"),
    )
    pairs = pos.select(
        F.element_at("_toks", F.col("_i")).alias("_a"),
        F.element_at("_toks", F.col("_i") + 1).alias("_b"),
    ).filter(F.col("_a") != F.col("_b"))
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("_a").alias("s"), F.col("_b").alias("d")),
                F.struct(F.col("_b").alias("s"), F.col("_a").alias("d")),
            )
        ).alias("_e")
    )
    return directed.groupBy(
        F.col("_e.s").alias("src"), F.col("_e.d").alias("dst")
    ).agg(F.count(F.lit(1)).alias("weight"))
