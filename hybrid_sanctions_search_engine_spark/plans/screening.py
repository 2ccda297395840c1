"""Batch screening pipeline — the reference's POST /process, DataFrame-native.

The reference screens one text per request through 10 layers
(``/root/reference/src/ai_service/core/unified_orchestrator.py:917-1164``).
Spark-natively, screening is a *batch* plan: a DataFrame of input texts flows
through the same layers as columns — normalization (Arrow UDF, byte-parity
chain), language detect, signals extraction (JVM regex), watchlist search
(one batched posting join for ALL texts — no per-request round trips), and
the weighted risk decision.  10^9 screenings = one job.

    texts(text_id, text)
      → normalized, language, dates[], ids[]            (L3-L6)
      → query terms ⋈ pattern postings → per-text hits  (L9, batch_topk shape)
      → tier-aware confidences → risk_score, risk       (L10)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..functions.normalize import detect_language_series, normalize_series
from ..functions.signals import extract_dates_col, extract_ids_col
from ..functions.tokenize import spark_index_tokens
from ..operators.bm25 import idf_col, tfnorm_col
from ..operators.decision import DecisionWeights, score_decisions
from ..operators.postings import build_postings


def _normalize_udf():
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(StringType())
    def norm(s: pd.Series) -> pd.Series:
        return normalize_series(s)

    return norm


def _lang_udf():
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(StringType())
    def lang(s: pd.Series) -> pd.Series:
        return detect_language_series(s)

    return lang


def _homoglyph_udf():
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    from ..functions.normalize import fold_homoglyphs

    @pandas_udf(BooleanType())
    def hg(s: pd.Series) -> pd.Series:
        return s.fillna("").map(lambda t: fold_homoglyphs(t)[1] > 0)

    return hg


def screen_texts(
    texts: DataFrame,
    pattern_docs: DataFrame,
    k: int = 10,
    weights: DecisionWeights | None = None,
) -> DataFrame:
    """Screen a batch of texts against a pattern corpus.

    ``texts``: (text_id, text).  ``pattern_docs``: (doc_id, text, entity_id,
    tier) — e.g. ``operators.patterns.generate_pattern_corpus`` output with
    patterns as the indexed text.  Returns one row per text:
    (text_id, normalized, language, n_dates, n_ids, best_entity_id,
    best_score, total_matches, risk_score, risk).
    """
    from ..functions.smartfilter import smartfilter_confidence_col

    norm_udf = _normalize_udf()
    lang_udf = _lang_udf()
    hg_udf = _homoglyph_udf()

    enriched = (
        texts.withColumn("normalized", norm_udf(F.col("text")))
        .withColumn("language", lang_udf(F.col("normalized")))
        .withColumn("n_dates", F.size(extract_dates_col(F.col("text"))))
        .withColumn("n_ids", F.size(extract_ids_col(F.col("text"))))
        .withColumn("sf_confidence", smartfilter_confidence_col(F.col("text")))
        .withColumn("homoglyph_detected", hg_udf(F.col("normalized")))
    ).persist()

    # --- batched watchlist search: all texts, one posting join ------------
    postings = build_postings(pattern_docs, positions=False)
    dl_stats = postings.agg(
        F.count_distinct("doc_id").alias("n"),
        (F.sum("tf") / F.count_distinct("doc_id")).alias("avgdl"),
    ).collect()[0]
    n_docs, avgdl = int(dl_stats["n"]), float(dl_stats["avgdl"] or 1.0)

    qterms = (
        enriched.select(
            "text_id", F.explode(spark_index_tokens(F.col("normalized"))).alias("term")
        )
        .distinct()
    )
    tdf = postings.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    scored = (
        postings.join(tdf, "term")
        .join(qterms, "term")
        .withColumn(
            "term_score",
            idf_col(F.col("df"), n_docs)
            * tfnorm_col(F.col("tf"), F.col("doc_len"), avgdl),
        )
        .groupBy("text_id", "doc_id")
        .agg(F.sum("term_score").alias("score"))
    )
    w_rank = Window.partitionBy("text_id").orderBy(F.desc("score"), F.asc("doc_id"))
    hits = (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
        .join(
            pattern_docs.select("doc_id", "entity_id", "tier"),
            "doc_id",
        )
    )

    # per-text confidences: A6 normalization + tier-aware feature split
    w_conf = Window.partitionBy("text_id")
    hits = hits.withColumn(
        "confidence", F.col("score") / F.max("score").over(w_conf)
    )
    features = hits.groupBy("text_id").agg(
        F.max(F.when(F.col("tier") <= 1, F.col("confidence"))).alias(
            "exact_confidence"
        ),
        F.max(F.when(F.col("tier") >= 2, F.col("confidence"))).alias(
            "ngram_confidence"
        ),
        F.count("*").cast("int").alias("total_matches"),
        F.sum(F.when(F.col("confidence") >= 0.9, 1).otherwise(0))
        .cast("int")
        .alias("high_confidence_matches"),
        F.max(F.when(F.col("tier") == 0, True).otherwise(False)).alias(
            "sanctioned_id_match"
        ),
        F.max_by("entity_id", F.struct(F.col("score"), -F.col("doc_id"))).alias(
            "best_entity_id"
        ),
        F.max("score").alias("best_score"),
    )

    combined = (
        enriched.join(features, "text_id", "left")
        .withColumn("date_match", F.col("n_dates") > 0)
        .withColumn("id_match", F.col("n_ids") > 0)
        .withColumn(
            "person_confidence",
            F.when(F.col("exact_confidence").isNotNull(), F.col("exact_confidence"))
            .otherwise(0.0),
        )
        .withColumn("smartfilter_confidence", F.col("sf_confidence"))
    )
    decided = score_decisions(combined, weights)
    # `enriched` stays persisted: the returned (lazy) DataFrame references it
    # on two branches (qterms + final join); unpersisting here would drop the
    # cache before the caller ever materializes, recomputing the Arrow-UDF
    # normalization per branch.  Spark evicts LRU; callers may unpersist after
    # their action if they hold many screening plans.
    return decided.select(
        "text_id",
        "normalized",
        "language",
        "n_dates",
        "n_ids",
        "best_entity_id",
        "best_score",
        F.coalesce("total_matches", F.lit(0)).alias("total_matches"),
        "risk_score",
        "risk",
    )
