from hybrid_sanctions_search_engine_spark.operators.metrics import (
    query_perf_stats,
    traces_to_df,
)
from hybrid_sanctions_search_engine_spark.plans.hybrid import SearchTraceStep


def test_trace_metrics(spark):
    traces = [
        ("q1", [SearchTraceStep("AC", 5, 1.2, 40.0), SearchTraceStep("FUZZY", 2, 0.6, 80.0)]),
        ("q2", [SearchTraceStep("AC", 0, 0.0, 60.0)]),
        ("q3", [SearchTraceStep("AC", 3, 0.9, 50.0)]),
    ]
    df = traces_to_df(spark, traces)
    stats = {r["stage"]: r for r in query_perf_stats(df).collect()}
    assert stats["AC"]["n"] == 3
    assert abs(stats["AC"]["avg_ms"] - 50.0) < 1e-9
    assert abs(stats["AC"]["hit_rate"] - 2 / 3) < 1e-9
    assert stats["FUZZY"]["p95_ms"] == 80.0


def test_calibrate_threshold(spark):
    from hybrid_sanctions_search_engine_spark.operators.calibration import (
        calibrate_threshold,
    )

    # scores 1..10; positives are scores >= 7 plus one noisy positive at 2
    rows = [(float(s), s >= 7) for s in range(1, 11)] + [(2.0, True)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    best = calibrate_threshold(df)
    assert best["threshold"] == 7.0
    assert best["precision"] == 1.0
    assert abs(best["recall"] - 4 / 5) < 1e-9


def test_threshold_metrics_preaggregates_before_window(spark):
    """Scale contract (round-5 verdict item 3): the single-partition
    cumulative window must consume the groupBy(threshold) PRE-AGGREGATE —
    |distinct scores| rows — not the raw labeled rows.  Asserted two ways:
    the physical plan runs an Aggregate below the Window, and the output on
    a heavy-ties input (20k rows, 5 distinct scores) is identical to the
    direct per-threshold recompute."""
    from pyspark.sql import functions as F

    from hybrid_sanctions_search_engine_spark.operators.calibration import (
        threshold_metrics,
    )

    df = spark.range(20000).select(
        (F.col("id") % 5).cast("double").alias("score"),
        ((F.col("id") % 3) == 0).alias("label"),
    )
    out = threshold_metrics(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    w = plan.find("Window")
    assert w >= 0 and "HashAggregate" in plan[w:], plan
    rows = {r["threshold"]: r for r in out.collect()}
    assert set(rows) == {0.0, 1.0, 2.0, 3.0, 4.0}
    pdf = df.toPandas()
    for t, r in rows.items():
        pred = pdf[pdf["score"] >= t]
        tp = int(pred["label"].sum())
        assert r["tp"] == tp
        assert r["fp"] == len(pred) - tp
        assert r["fn"] == int(pdf["label"].sum()) - tp
