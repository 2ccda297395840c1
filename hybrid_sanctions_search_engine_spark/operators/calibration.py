"""Offline threshold calibration — the reference's eval layer.

Re-expresses ``/root/reference/src/ai_service/eval/threshold_calibration.py``
(sweep candidate thresholds over labeled scores, pick the one maximizing an
objective) as one window plan: sort by score desc, cumulative TP/FP counts
give precision/recall *at every distinct score simultaneously* — no
per-threshold rescan, fully JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def threshold_metrics(
    scored: DataFrame, score_col: str = "score", label_col: str = "label"
) -> DataFrame:
    """→ (threshold, tp, fp, fn, precision, recall, f1) for every distinct
    score value, where threshold means `predict positive iff score ≥ t`.

    Scale note: the distributed ``groupBy(threshold)`` pre-aggregate runs
    FIRST, so the unavoidable single-partition cumulative window only ever
    sees |distinct scores| rows — bounded by score cardinality, not corpus
    size.  (Ties collapse in the pre-aggregate, which also removes the old
    per-row max-over-ties pass.)
    """
    per_score = (
        scored.select(
            F.col(score_col).alias("threshold"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("threshold")
        .agg(F.sum("y").alias("pos"), F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy()
        .orderBy(F.desc("threshold"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_t = (
        per_score.withColumn("tp", F.sum("pos").over(w))
        .withColumn("n_pred", F.sum("n").over(w))
        .withColumn("total_pos", F.sum("pos").over(Window.partitionBy()))
        .drop("pos", "n")
    )
    return per_t.select(
        "threshold",
        "tp",
        (F.col("n_pred") - F.col("tp")).alias("fp"),
        (F.col("total_pos") - F.col("tp")).alias("fn"),
        (F.col("tp") / F.col("n_pred")).alias("precision"),
        (F.col("tp") / F.col("total_pos")).alias("recall"),
        (
            2 * F.col("tp") / (F.col("n_pred") + F.col("total_pos"))
        ).alias("f1"),
    )


def calibrate_threshold(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    objective: str = "f1",
) -> dict:
    """Best threshold by the objective (deterministic tie-break: higher
    threshold wins, favoring precision like the reference calibrator)."""
    best = (
        threshold_metrics(scored, score_col, label_col)
        .orderBy(F.desc(objective), F.desc("threshold"))
        .limit(1)
        .collect()[0]
    )
    return {k: best[k] for k in ("threshold", "precision", "recall", "f1")}
