"""Text-analysis functions for pipeline curation: language ID, quality
scoring, token counting, document fingerprinting.

All pure JVM Column expressions (codegen, SQL-mirrorable for the DuckDB
oracle).  The richer reference-parity language detector (Cyrillic scripts,
Ukrainian markers) lives in ``normalize.detect_language``; this one is the
corpus-curation heuristic over Latin-script web text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .tokenize import spark_index_tokens

# marker words per language, matched as whole tokens
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "die", "und", "ist", "von"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "los", "es", "las", "por"],
}


def _marker_hits(text_col: Column, words: list[str]) -> Column:
    """Number of marker-word occurrences (token-exact, via padded LIKE)."""
    padded = F.concat(F.lit(" "), F.lower(text_col), F.lit(" "))
    hits = F.lit(0)
    for w in words:
        # occurrences of " w " allowing adjacency: count non-overlapping
        hits = hits + (
            (F.length(padded) - F.length(F.replace(padded, F.lit(f" {w} "), F.lit(""))))
            / (len(w) + 2)
        ).cast("int")
    return hits


def lang_id_col(text_col: Column) -> Column:
    """Heuristic n-gram/stopword language ID → 'en'/'de'/'fr'/'es'/'und'.

    Deterministic argmax with fixed precedence order; 'und' (undetermined)
    when no marker hits at all.
    """
    scores = {lang: _marker_hits(text_col, ws) for lang, ws in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # reversed precedence so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        result = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(result)
    return result


def token_count_col(text_col: Column) -> Column:
    """Whitespace/alnum token count (the BPE-ish proxy: alnum runs)."""
    return F.size(spark_index_tokens(text_col))


def quality_score_col(text_col: Column) -> Column:
    """Document quality in [0,1] from cheap surface statistics:
    0.4·length-band + 0.3·alpha-ratio + 0.3·(1 − repetition-ratio).

    - length band: 1 when 20 ≤ tokens ≤ 1000, scaled down outside
    - alpha ratio: letters / non-space chars
    - repetition: 1 − distinct/total tokens
    """
    toks = spark_index_tokens(text_col)
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    length_band = (
        F.when(n_tok < 20, n_tok / 20.0)
        .when(n_tok > 1000, 1000.0 / n_tok)
        .otherwise(F.lit(1.0))
    )
    no_space = F.replace(F.lower(text_col), F.lit(" "), F.lit(""))
    n_alpha = F.length(F.regexp_replace(no_space, "[^a-z]", ""))
    alpha_ratio = F.when(
        F.length(no_space) > 0, n_alpha / F.length(no_space)
    ).otherwise(F.lit(0.0))
    rep_ratio = F.when(n_tok > 0, 1.0 - n_distinct / n_tok).otherwise(F.lit(1.0))
    return length_band * 0.4 + alpha_ratio * 0.3 + (1.0 - rep_ratio) * 0.3


def fingerprint_col(text_col: Column) -> Column:
    """Content fingerprint: md5 of the sorted distinct token set — stable
    under token reordering (shuffled near-dups collapse)."""
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(spark_index_tokens(text_col))))
    )
