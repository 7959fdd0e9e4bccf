"""Text-analysis column functions: tokenization, shingles, quality
features, language-ID — all pure Column expressions (JVM-side,
whole-stage codegen), each with an exact DuckDB-SQL mirror used by the
oracle gate.

These are the per-document features a training-data curation pipeline
computes before dedup/filtering; on 100 TB they run in the scan
projection (no shuffle, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_RE = r"[a-z0-9]+"

# Marker stopwords per language for the n-gram-heuristic language
# identifier. Deterministic scoring mechanism (count marker hits,
# argmax with fixed tie order) — mirrored verbatim in the oracle SQL.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "los", "y", "las"],
}


def word_tokens(col: Column | str) -> Column:
    """Lowercased word tokens (``[a-z0-9]+`` runs)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(WORD_RE), 0)


def shingles(tokens: Column, n: int) -> Column:
    """Token n-grams joined by one space; a doc shorter than ``n``
    tokens yields its whole token string as the single shingle."""
    joined_all = F.array_join(tokens, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.array_join(F.slice(tokens, i, n), " "),
    )
    return F.when(F.size(tokens) >= n, grams).otherwise(F.array(joined_all))


def marker_hits(tokens: Column, markers: list[str]) -> Column:
    """How many tokens are in the marker set (with multiplicity)."""
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(marker_arr, t)))


def language_id(tokens: Column) -> Column:
    """Argmax of marker-hit counts over LANG_MARKERS; ties resolve in
    dict order; zero hits everywhere -> 'und' (undetermined)."""
    scores = [(lang, marker_hits(tokens, ms)) for lang, ms in LANG_MARKERS.items()]
    best_score = F.greatest(*[s for _, s in scores])
    pick = F.lit("und")
    # reversed: earlier languages win ties by being applied last
    for lang, score in reversed(scores):
        pick = F.when((score > 0) & (score == best_score), F.lit(lang)).otherwise(pick)
    return pick


def language_id_oracle_sql(text_expr: str) -> str:
    """DuckDB mirror of word_tokens + language_id over ``text_expr``."""
    toks = f"regexp_extract_all(lower({text_expr}), '{WORD_RE}')"
    hit = {
        lang: (
            f"len(list_filter({toks}, t -> list_contains("
            f"[{', '.join(repr(m) for m in ms)}], t)))"
        )
        for lang, ms in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(hit.values()) + ")"
    whens = " ".join(
        f"WHEN {hit[lang]} > 0 AND {hit[lang]} = {best} THEN '{lang}'"
        for lang in LANG_MARKERS
    )
    return f"CASE {whens} ELSE 'und' END"
