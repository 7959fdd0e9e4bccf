"""Corpus-level statistics for training-data curation: bounded
vocabulary extraction, integer-exact unigram surprisal scoring
(a CCNet-style language-model quality filter), TF-IDF relevance, and
a scalable exact top-k-per-group reducer.

Design rules (same as the rest of the engine):

- All hot-path expressions are pure JVM Columns (whole-stage codegen);
  the only shuffles are partial-aggregating ``groupBy``s.
- Anything broadcast is BOUNDED by construction: the vocabulary is
  top-``vocab_size`` by frequency (a distributed
  ``TakeOrderedAndProject``), never the full token universe — at
  100 TB the distinct-token set is unbounded (typos, ids, hashes) but
  the broadcast stays ``vocab_size`` rows.
- Cross-engine parity is INTEGER-exact: surprisal is measured in
  whole bits via ``floor(log2(count)) + 1`` (the bit length of an
  int64 — exact in double for counts < 2^40 since the distance from
  log2(2^k - 1) to k dwarfs 1-ulp libm error), so per-document sums
  are order-free BIGINT sums, never float folds. The oracle runs the
  identical formula.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fluent_plugin_record_reformer_spark.functions.text import word_tokens


def _bitlen(c: Column) -> Column:
    """Bit length of a positive int64: floor(log2(c)) + 1, exact for
    c < 2^40 (see module docstring). Mirrored in DuckDB as
    ``CAST(floor(log2(c)) AS BIGINT) + 1``."""
    return (F.floor(F.log2(c)) + F.lit(1)).cast("long")


def top_vocab(
    docs: DataFrame, text_col: str, vocab_size: int
) -> DataFrame:
    """The ``vocab_size`` most frequent word tokens of the corpus with
    their counts: ``(token string, cnt long)``.

    Ties at the cut boundary resolve by token ascending, so the vocab
    is deterministic across runs/engines. ``orderBy().limit(n)``
    compiles to a distributed ``TakeOrderedAndProject`` — each
    partition keeps its local top-n and the driver merges n-row heaps;
    the full distinct-token set is aggregated (partial, map-side
    combined) but never sorted or collected."""
    counts = _token_counts(docs, text_col)
    return counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(vocab_size)


def _token_counts(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(word_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def surprisal_score(
    docs: DataFrame,
    *,
    id_cols: Sequence[str],
    text_col: str,
    vocab_size: int,
) -> DataFrame:
    """Integer-exact unigram surprisal per document: the CCNet-style
    "how unlikely is this text under a corpus LM" quality signal,
    quantized to whole bits so it survives any aggregation order.

    Per token: ``bits = bitlen(T) - bitlen(cnt)`` where ``T`` is the
    corpus token total and ``cnt`` the token's corpus count — an
    integer cap-to-bit estimate of ``-log2 p``. Out-of-vocabulary
    tokens (beyond the top-``vocab_size``) take ``cnt = 1``:
    ``bits = bitlen(T) - 1``, the rarest-possible floor.

    Output: ``id_cols... , n_tokens long, sum_bits long`` — exact
    BIGINTs; callers derive ``sum_bits / n_tokens`` (one IEEE
    division, bit-identical cross-engine) or compare thresholds by
    integer cross-multiplication.

    Scale shape: two passes over the text (one building the vocab, one
    scoring), both partial-aggregating; the vocab broadcast is bounded
    at ``vocab_size`` rows no matter the corpus; the scalar token
    total joins as a broadcast single-row frame. The scoring join
    deliberately goes through the broadcast (hot tokens like "the"
    would make a shuffle join on token the textbook skew trap)."""
    counts = _token_counts(docs, text_col)
    vocab = counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(
        vocab_size
    )
    # the corpus token total re-aggregates the SAME token-count
    # exchange the vocab consumes (AQE exchange reuse), instead of a
    # third scan+tokenize pass over the text
    total = counts.agg(F.sum("cnt").alias("_T"))
    toks = docs.select(
        *id_cols, F.explode(word_tokens(text_col)).alias("token")
    )
    scored = (
        toks.join(F.broadcast(vocab), on="token", how="left")
        .crossJoin(F.broadcast(total))
        .select(
            *id_cols,
            (
                _bitlen(F.col("_T"))
                - F.coalesce(_bitlen(F.col("cnt")), F.lit(1).cast("long"))
            ).alias("_bits"),
        )
    )
    return scored.groupBy(*id_cols).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("_bits").alias("sum_bits"),
    )


def grouped_topk(
    df: DataFrame,
    *,
    group_cols: Sequence[str],
    order_struct: Column,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact top-k rows per group WITHOUT a window over the raw input.

    ``order_struct`` is a struct column whose ASCENDING sort order is
    the desired rank order (encode descending fields by negation, the
    same convention as the engine's argmax structs); its fields become
    output columns next to ``group_cols`` and ``rank_col`` (1-based).

    The naive shape — ``row_number() OVER (PARTITION BY group)`` on
    the raw table — shuffles every row to as few partitions as there
    are groups and sorts them: with 4 groups over 10^9 rows that is 4
    straggler tasks. Instead:

      1. local candidates: ``groupBy(group, spark_partition_id())``
         keeping each partition's k smallest structs via
         ``slice(sort_array(collect_list(...)), 1, k)``. Any global
         top-k row is necessarily in its own partition's top-k, so the
         union of locals is a correct superset. Output is bounded at
         k x groups x partitions rows.
      2. exact rank: the window runs over that tiny candidate set.

    The ``collect_list`` buffers one (group, partition) cell — at most
    one input partition (~hundreds of MB ceiling set by
    ``maxPartitionBytes``), not one group."""
    gcols = list(group_cols)
    local = df.groupBy(
        *gcols, F.spark_partition_id().alias("_p")
    ).agg(
        F.slice(
            F.sort_array(F.collect_list(order_struct)), 1, k
        ).alias("_top")
    )
    cand = local.select(*gcols, F.explode("_top").alias("_s"))
    w = Window.partitionBy(*gcols).orderBy(F.col("_s").asc())
    ranked = cand.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    field_names = [f.name for f in ranked.schema["_s"].dataType.fields]
    return ranked.select(
        *gcols,
        *[F.col("_s")[f].alias(f) for f in field_names],
        rank_col,
    )


def tfidf_topk(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    terms: Sequence[str],
    k: int,
) -> DataFrame:
    """Top-k documents per query term by TF-IDF.

    ``tfidf = tf * (ln((N + 1) / (df + 1)) + 1)`` (smoothed sklearn
    formula). Within one term the idf factor is constant, so the
    ranking is by raw ``tf`` descending (``id_col`` ascending breaks
    ties) — the float enters only the reported score, never the
    order, which keeps the top-k set integer-exact cross-engine.

    Scale shape: tokens are filtered to the query terms BEFORE any
    aggregation (the literal ``isin`` predicate sits in the scan
    projection), so everything downstream is proportional to term
    occurrences, not corpus size; doc-frequency and the doc-count
    scalar are broadcast back; ranking uses :func:`grouped_topk`
    (no window over the raw per-doc counts)."""
    # The explicit isNotNull is semantically a no-op (isin already
    # drops NULL) but it is what lets the tf exchange be REUSED: the
    # df branch's inner join pushes an isnotnull(term) below tf's
    # aggregate while the top-k branch keeps it above its window, so
    # without it the two consumers get different canonical subtrees
    # and the tokenize+explode pass executes TWICE (executed-plan
    # audit: 2 regexp sites -> 1 with this filter + the df shape
    # below; exceptAll parity 0/0).
    hits = (
        docs.select(
            F.col(id_col), F.explode(word_tokens(text_col)).alias("term")
        )
        .filter(F.col("term").isin(*terms))
        .filter(F.col("term").isNotNull())
    )
    tf = hits.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    # df == row count of tf per term, but written as sum(least(tf, 1))
    # — identical since tf >= 1 — because a literal count(1) lets the
    # optimizer PRUNE the tf aggregate out of this branch (count(tf)
    # gets rewritten back to count(1) too), which again de-unifies the
    # shared subtree and re-runs the scan. least(tf, 1) is not
    # fold-proof-reducible without a tf >= 1 range fact the optimizer
    # does not track, so the shared aggregate survives and the
    # exchange is reused.
    dfreq = tf.groupBy("term").agg(
        F.sum(F.least(F.col("tf"), F.lit(1))).alias("df")
    )
    ndocs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    top = grouped_topk(
        tf,
        group_cols=["term"],
        order_struct=F.struct(
            (-F.col("tf")).alias("_neg_tf"), F.col(id_col).alias(id_col)
        ),
        k=k,
        rank_col="rnk",
    )
    return (
        top.select("term", id_col, (-F.col("_neg_tf")).alias("tf"), "rnk")
        .join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "term",
            id_col,
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1)).cast("double")
                        / (F.col("df") + F.lit(1))
                    )
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
            "rnk",
        )
    )


def inverted_index(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_postings: int,
) -> DataFrame:
    """Capped inverted index: one row per term with its document
    frequency, total occurrence count, and a posting string
    ``"doc:tf,doc:tf,..."`` of the ``max_postings`` highest-tf
    documents (ties to the smaller doc id) — the provenance /
    term-lookup structure a curation pipeline keeps next to the
    corpus.

    Scale shape: tokens collapse to (term, doc) tf cells through one
    partial-aggregated groupBy; df/total roll up from THOSE cells
    (never re-scanning text); the posting cap runs through
    :func:`grouped_topk` so no window and no unbounded
    ``collect_list`` ever sees the raw cells — per-term state is
    bounded at ``max_postings`` regardless of how stoppy a stopword
    gets. The posting string concatenates in (rank, doc) order, which
    is deterministic, so the result survives a cross-engine value
    hash."""
    # isNotNull is a no-op on exploded tokens (never null) but aligns
    # the totals branch (whose final join pushes isnotnull(term) below
    # the aggregate) with the postings branch, so both consumers share
    # ONE canonical tf subtree and the tokenize+explode pass runs once
    # (executed-plan audit: 2 scans/2 regexp sites -> 1/1; exceptAll
    # parity 0/0). totals' sum(_tf) already keeps the aggregate alive
    # in its branch, so no df rewrite is needed here.
    tf = (
        docs.select(
            F.col(id_col).alias("_doc"),
            F.explode(word_tokens(text_col)).alias("term"),
        )
        .filter(F.col("term").isNotNull())
        .groupBy("term", "_doc")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    totals = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("_tf").alias("total_tf"),
    )
    top = grouped_topk(
        tf,
        group_cols=["term"],
        order_struct=F.struct(
            (-F.col("_tf")).alias("_neg_tf"), F.col("_doc").alias("_doc")
        ),
        k=max_postings,
        rank_col="_rnk",
    )
    postings = top.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("_rnk", "_doc", (-F.col("_neg_tf")).alias("_tf"))
                    )
                ),
                lambda s: F.concat_ws(":", s["_doc"], s["_tf"]),
            ),
            ",",
        ).alias("postings")
    )
    return totals.join(postings, on="term")


def chunk_documents(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """Sliding-window document chunking — the document→passage step of
    an embedding / RAG ingest pipeline.

    Each document's token array (``word_tokens`` tokenization) splits
    into windows of ``chunk_tokens`` tokens starting every
    ``chunk_tokens - overlap`` positions; consecutive chunks share
    ``overlap`` tokens. A trailing window whose content is already
    fully covered by its predecessor is suppressed (kept only when it
    reaches past the predecessor's end), so every emitted chunk
    contributes new tokens; documents with no tokens yield no chunks.

    Output: ``id_col``, ``chunk_idx`` (1-based, == (start-1)/stride+1
    — pure arithmetic on the start offset, so no engine-specific
    ordinality semantics are involved), ``chunk_text``, ``n_tokens``.

    Scale shape: one projection + one explode — no shuffle, no UDF;
    the per-row state is the token array already implied by
    tokenization. Fan-out is ~n_tokens/stride rows per document,
    bounded by the document length itself.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1: {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens): {overlap}"
        )
    stride = chunk_tokens - overlap
    # stage tokenization in its own projection: the array is referenced
    # by the start-list HOF, the slice, and the length arithmetic, and
    # HOFs are CodegenFallback — inlining the regexp pipeline into each
    # site re-evaluates it per reference
    staged = docs.select(
        F.col(id_col), word_tokens(text_col).alias("_toks")
    ).filter(F.size("_toks") > 0)
    n = F.size("_toks")
    starts = F.filter(
        F.sequence(F.lit(1), n, F.lit(stride)),
        # keep the first window and any window reaching past its
        # predecessor's end (predecessor covers s-stride .. s-stride
        # + chunk_tokens - 1)
        lambda s: (s == 1) | (s - stride + chunk_tokens <= n),
    )
    # starts always holds s=1 here (n > 0), so explode_outer ≡ explode
    # without the planner's pushed-down size()>0 filter re-inlining the
    # array expression
    ex = staged.select(
        F.col(id_col),
        F.col("_toks"),
        F.explode_outer(starts).alias("_start"),
    )
    piece = F.slice(F.col("_toks"), F.col("_start"), F.lit(chunk_tokens))
    return ex.select(
        F.col(id_col),
        ((F.col("_start") - 1) / F.lit(stride) + 1)
        .cast("int")
        .alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.least(
            F.lit(chunk_tokens), F.size("_toks") - F.col("_start") + 1
        ).alias("n_tokens"),
    )
