"""Completion suggester (round-6 verdict item 7).

Reference comparator: the watchlist mapping's ES ``completion`` subfield
(``elasticsearch_index_manager.py:115-116``) — prefix → suggestions ranked
by stored weight; here the weight is the term's document frequency.
Oracle coverage rides in the merged ``prefix_terms`` contract entry
(__spark_entry__.py); this file pins the operator semantics directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hybrid_sanctions_search_engine_spark.operators.bm25 import complete_prefix


def _dictionary(spark):
    return spark.createDataFrame(
        [
            ("window", 40), ("windows", 40), ("wind", 12), ("winter", 7),
            ("wi", 99), ("query", 80), ("w", 5),
        ],
        "term string, df long",
    )


def test_rank_by_weight_then_term(spark):
    rows = complete_prefix(_dictionary(spark), "wi", k=3).collect()
    assert [(r["term"], r["rank"]) for r in rows] == [
        ("wi", 1), ("window", 2), ("windows", 3)  # df ties break term-asc
    ]
    assert rows[0]["prefix"] == "wi"


def test_min_len_and_k_bound(spark):
    # 'w' itself is below min_len=2 and must not complete to itself
    rows = complete_prefix(_dictionary(spark), "w", k=10).collect()
    terms = [r["term"] for r in rows]
    assert "w" not in terms
    assert terms[0] == "wi"  # heaviest completion first
    assert len(rows) == 5
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]


def test_case_folds_and_empty(spark):
    assert (
        complete_prefix(_dictionary(spark), "WIND", k=5)
        .where(F.col("term") == "window")
        .count()
        == 1
    )
    assert complete_prefix(_dictionary(spark), "zz", k=5).count() == 0
