

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


def test_name_boost_cap(spark):
    """L8 name boost: ×1.2 for person-name candidates, capped at 1.0."""
    from pyspark.sql import functions as F

    from hybrid_sanctions_search_engine_spark.operators.fuzzy import (
        similarity_blend_full,
    )

    pairs = spark.createDataFrame(
        [("ivanov ivan", "ivanov ivan", True),
         ("ivanov ivan", "ivanov ivan", False),
         ("ivanov", "petrov corp", True)],
        "a string, b string, is_name boolean",
    )
    rows = similarity_blend_full(
        pairs, "a", "b", name_boost_col=F.col("is_name")
    ).collect()
    assert abs(rows[0]["sim_score"] - 1.0) < 1e-9          # capped at 1.0
    assert abs(rows[1]["sim_score"] - 1.0) < 1e-9          # already 1.0
    assert rows[2]["sim_score"] < 1.0                      # boost ≠ free pass


def test_rapidfuzz_rerank_boosts(spark):
    """L9: fuzz>80 ⇒ ×1.2; fuzz>60 ⇒ ×1.1; re-sorted by boosted score."""
    from hybrid_sanctions_search_engine_spark.operators.fuzzy import (
        rapidfuzz_rerank,
    )

    cands = spark.createDataFrame(
        [(1, "ivanov ivan petrovich", 0.50),   # near-exact vs query -> x1.2
         (2, "ivanov irina", 0.52),            # medium similarity -> x1.1
         (3, "completely unrelated words", 0.58)],  # no boost
        "doc_id int, text string, score double",
    )
    rows = rapidfuzz_rerank(cands, "ivanov ivan petrovich").collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert abs(by_id[1]["score"] - 0.60) < 1e-9
    assert by_id[1]["fuzz_score"] > 80
    assert abs(by_id[2]["score"] - 0.572) < 1e-9
    assert abs(by_id[3]["score"] - 0.58) < 1e-9
    assert [r["doc_id"] for r in rows] == [1, 3, 2]


def test_token_set_subset_scores_full(spark):
    """fuzzywuzzy token_set semantics: a token-subset pair contributes a
    full 1.0 on the token_set measure (round-2 review: Jaccard gave 0.5)."""
    from hybrid_sanctions_search_engine_spark.operators.fuzzy import (
        similarity_blend_full,
    )

    pairs = spark.createDataFrame(
        [("ivanov ivan", "ivanov ivan petrovich 1980")], "a string, b string"
    )
    score = similarity_blend_full(pairs, "a", "b").collect()[0]["sim_score"]
    # partial_ratio=1.0 (embedded) and token_set=1.0 (subset) -> the blend is
    # at least 0.25 + 0.2 even if the char measures contributed nothing
    assert score >= 0.45
