

def test_partial_ratio_semantics():
    """Canonical partial_ratio: a shorter string embedded verbatim in a
    longer one scores 1.0 even when the plain char ratio is low."""
    import pandas as pd

    from hybrid_sanctions_search_engine_spark.operators.fuzzy import (
        partial_ratio_series,
    )

    got = partial_ratio_series(
        pd.Series(["ivanov", "ivanov", "abc", ""]),
        pd.Series(["mr ivanov ivan petrovich esq", "ivanov", "xyz", ""]),
    ).tolist()
    assert got[0] == 1.0          # embedded substring
    assert got[1] == 1.0          # identical
    assert got[2] < 0.5           # unrelated
    assert got[3] == 1.0          # both empty


def test_similarity_blend_full_weights(spark):
    """4-measure blend reproduces the reference weights exactly:
    identical strings -> 1.0; an embedded-name pair scores strictly higher
    than the 3-measure renormalized blend (partial_ratio pulls it up)."""
    from pyspark.sql import functions as F

    from hybrid_sanctions_search_engine_spark.operators.fuzzy import (
        similarity_blend,
        similarity_blend_full,
    )

    pairs = spark.createDataFrame(
        [("ivanov ivan", "ivanov ivan"), ("ivanov", "mr ivanov ivan petrovich")],
        "a string, b string",
    )
    full = similarity_blend_full(pairs, "a", "b").collect()
    three = similarity_blend(pairs, "a", "b").collect()
    assert abs(full[0]["sim_score"] - 1.0) < 1e-9
    assert full[1]["sim_score"] > three[1]["sim_score"]
