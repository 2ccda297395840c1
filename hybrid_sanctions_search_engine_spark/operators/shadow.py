"""Shadow-mode result comparison — rollout safety for engine changes.

The reference validates new pipeline versions by running them in shadow and
comparing results (``/root/reference/src/ai_service/validation/
shadow_mode_validator.py``, behaviour essentials).  Spark-natively: two
result sets (query_id, doc_id, rank, score) from engine A (active) and B
(shadow) → per-query agreement metrics in one aggregation:

  * overlap@k   — |A∩B| / k (doc-set agreement)
  * rank_corr   — Spearman-style agreement on the shared docs
  * score_drift — max |score_A − score_B| over shared docs
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compare_shadow(
    active: DataFrame,
    shadow: DataFrame,
    k: int,
    query_col: str = "query_id",
) -> DataFrame:
    """→ per-query (n_active, n_shadow, n_shared, overlap_at_k, rank_mae,
    max_score_drift)."""
    a = active.select(
        query_col,
        F.col("doc_id"),
        F.col("rank").alias("rank_a"),
        F.col("score").alias("score_a"),
    )
    b = shadow.select(
        query_col,
        F.col("doc_id"),
        F.col("rank").alias("rank_b"),
        F.col("score").alias("score_b"),
    )
    joined = a.join(b, [query_col, "doc_id"], "full_outer")
    agg = joined.groupBy(query_col).agg(
        F.count(F.col("rank_a")).cast("int").alias("n_active"),
        F.count(F.col("rank_b")).cast("int").alias("n_shadow"),
        F.count(F.when(F.col("rank_a").isNotNull() & F.col("rank_b").isNotNull(), 1))
        .cast("int")
        .alias("n_shared"),
        F.avg(F.abs(F.col("rank_a") - F.col("rank_b"))).alias("rank_mae"),
        F.max(F.abs(F.col("score_a") - F.col("score_b"))).alias("max_score_drift"),
    )
    # normalize by the achievable overlap, not the constant k: selective
    # queries where both engines return < k docs can still reach 1.0 under
    # perfect agreement (a group always has ≥1 row, so the divisor is ≥1)
    return agg.withColumn(
        "overlap_at_k",
        F.col("n_shared")
        / F.least(F.lit(k), F.greatest(F.col("n_active"), F.col("n_shadow"))),
    ).select(
        query_col, "n_active", "n_shadow", "n_shared",
        "overlap_at_k", "rank_mae", "max_score_drift",
    )


def shadow_gate(
    comparison: DataFrame,
    min_overlap: float = 0.9,
    max_rank_mae: float = 1.0,
) -> dict:
    """Aggregate pass/fail for a rollout: fraction of queries meeting the
    agreement bars (the reference's canary acceptance shape)."""
    row = comparison.agg(
        F.count("*").alias("n"),
        F.avg((F.col("overlap_at_k") >= min_overlap).cast("double")).alias(
            "overlap_pass_rate"
        ),
        F.avg(
            (F.coalesce(F.col("rank_mae"), F.lit(0.0)) <= max_rank_mae).cast("double")
        ).alias("rank_pass_rate"),
    ).collect()[0]
    return {
        "n_queries": int(row["n"]),
        "overlap_pass_rate": float(row["overlap_pass_rate"] or 0.0),
        "rank_pass_rate": float(row["rank_pass_rate"] or 0.0),
        "passed": (row["overlap_pass_rate"] or 0.0) >= 0.95
        and (row["rank_pass_rate"] or 0.0) >= 0.95,
    }
