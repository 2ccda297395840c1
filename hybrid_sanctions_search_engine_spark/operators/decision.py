"""Risk decision scoring — the reference pipeline's final layer (L10).

Column-expression re-derivation of ``DecisionEngine._calculate_weighted_score``
(``/root/reference/src/ai_service/core/decision_engine.py:119-191``; default
weights/thresholds from ``config/settings.py:605-634``):

    score = 0.25·smartfilter + 0.30·person + 0.15·org + 0.25·cos_top
          + Σ gated search components (exact 0.4 @≥0.8, phrase 0.25 @≥0.7,
            ngram 0.2 @≥0.6, vector 0.4 @≥0.8)
          + bonuses (exact≥0.95 +0.2, multi-match +0.1, high-conf +0.05,
            date +0.07, id +0.15, homoglyph +0.3/+0.15, sanctioned-ID +1.5)
    risk = HIGH ≥ 0.7 | MEDIUM ≥ 0.5 | LOW

Operates on a DataFrame of per-input feature rows; all JVM arithmetic.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class DecisionWeights:
    w_smartfilter: float = 0.25
    w_person: float = 0.3
    w_org: float = 0.15
    w_similarity: float = 0.25
    w_search_exact: float = 0.4
    w_search_phrase: float = 0.25
    w_search_ngram: float = 0.2
    w_search_vector: float = 0.4
    thr_search_exact: float = 0.8
    thr_search_phrase: float = 0.7
    thr_search_ngram: float = 0.6
    thr_search_vector: float = 0.8
    bonus_exact_match: float = 0.2
    bonus_multiple_matches: float = 0.1
    bonus_high_confidence: float = 0.05
    bonus_date_match: float = 0.07
    bonus_id_match: float = 0.15
    thr_high: float = 0.7
    thr_medium: float = 0.5


def _opt(df: DataFrame, name: str, default: float = 0.0) -> Column:
    return (
        F.coalesce(F.col(name), F.lit(default))
        if name in df.columns
        else F.lit(default)
    )


def _flag(df: DataFrame, name: str) -> Column:
    return (
        F.coalesce(F.col(name), F.lit(False)) if name in df.columns else F.lit(False)
    )


def score_decisions(df: DataFrame, w: DecisionWeights | None = None) -> DataFrame:
    """Add ``risk_score`` and ``risk`` (HIGH/MEDIUM/LOW) columns.

    Expected feature columns (all optional; absent → 0/false):
    smartfilter_confidence, person_confidence, org_confidence, cos_top,
    exact_confidence, phrase_confidence, ngram_confidence, vector_confidence,
    total_matches, high_confidence_matches, date_match, id_match,
    homoglyph_detected, sanctioned_id_match.
    """
    w = w or DecisionWeights()
    exact = _opt(df, "exact_confidence")
    phrase = _opt(df, "phrase_confidence")
    ngram = _opt(df, "ngram_confidence")
    vector = _opt(df, "vector_confidence")
    total_matches = _opt(df, "total_matches")

    exact_on = exact >= w.thr_search_exact
    phrase_on = phrase >= w.thr_search_phrase
    ngram_on = ngram >= w.thr_search_ngram
    vector_on = vector >= w.thr_search_vector
    any_search = exact_on | phrase_on | ngram_on | vector_on

    score = (
        F.lit(w.w_smartfilter) * _opt(df, "smartfilter_confidence")
        + F.lit(w.w_person) * _opt(df, "person_confidence")
        + F.lit(w.w_org) * _opt(df, "org_confidence")
        + F.lit(w.w_similarity) * _opt(df, "cos_top")
        + F.when(exact_on, w.w_search_exact * exact).otherwise(0.0)
        + F.when(phrase_on, w.w_search_phrase * phrase).otherwise(0.0)
        + F.when(ngram_on, w.w_search_ngram * ngram).otherwise(0.0)
        + F.when(vector_on, w.w_search_vector * vector).otherwise(0.0)
        + F.when(any_search & (exact >= 0.95), w.bonus_exact_match).otherwise(0.0)
        + F.when(any_search & (total_matches > 1), w.bonus_multiple_matches).otherwise(0.0)
        + F.when(
            any_search & (_opt(df, "high_confidence_matches") > 0),
            w.bonus_high_confidence,
        ).otherwise(0.0)
        + F.when(_flag(df, "date_match"), w.bonus_date_match).otherwise(0.0)
        + F.when(_flag(df, "id_match"), w.bonus_id_match).otherwise(0.0)
        + F.when(
            _flag(df, "homoglyph_detected"),
            F.when(total_matches > 0, 0.3).otherwise(0.15),
        ).otherwise(0.0)
        + F.when(
            _flag(df, "sanctioned_id_match") & (total_matches > 0), 1.5
        ).otherwise(0.0)
    )
    return df.withColumn("risk_score", score).withColumn(
        "risk",
        F.when(F.col("risk_score") >= w.thr_high, "HIGH")
        .when(F.col("risk_score") >= w.thr_medium, "MEDIUM")
        .otherwise("LOW"),
    )
