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
