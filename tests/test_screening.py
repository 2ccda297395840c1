"""End-to-end batch screening pipeline + decision scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hybrid_sanctions_search_engine_spark.operators.decision import (
    DecisionWeights,
    score_decisions,
)
from hybrid_sanctions_search_engine_spark.operators.patterns import (
    generate_pattern_corpus,
)
from hybrid_sanctions_search_engine_spark.plans.screening import screen_texts


def test_decision_scoring(spark):
    rows = [
        # strong exact search hit + id match -> HIGH
        (1, 0.9, 0.95, 3, 2, True, True, False),
        # weak everything -> LOW
        (2, 0.1, 0.2, 0, 0, False, False, False),
        # mid person confidence + exact above gate -> MEDIUM
        (3, 0.8, 0.85, 1, 0, False, False, False),
    ]
    df = spark.createDataFrame(
        rows,
        "text_id long, person_confidence double, exact_confidence double, "
        "total_matches int, high_confidence_matches int, id_match boolean, "
        "sanctioned_id_match boolean, homoglyph_detected boolean",
    )
    out = {r["text_id"]: r for r in score_decisions(df).collect()}
    assert out[1]["risk"] == "HIGH"
    assert out[1]["risk_score"] > 1.5  # sanctioned-ID +1.5 applied
    assert out[2]["risk"] == "LOW"
    assert out[3]["risk"] == "MEDIUM"  # 0.3*0.8 + 0.4*0.85 = 0.58
    # gating: exact below 0.8 threshold contributes nothing
    df2 = spark.createDataFrame(
        [(1, 0.79, 1)], "text_id long, exact_confidence double, total_matches int"
    )
    r = score_decisions(df2).collect()[0]
    assert r["risk_score"] == 0.0 and r["risk"] == "LOW"


@pytest.fixture(scope="module")
def watchlist(spark):
    entities = spark.createDataFrame(
        [
            (1, "Иванов Иван Петрович", "Ivanov Ivan", "7707083893", "AA123456", None, "person", []),
            (2, "Коваленко Олена", "Kovalenko Olena", None, None, None, "person", []),
        ],
        "id long, name string, name_en string, itn string, passport string, iban string, entity_type string, aliases array<string>",
    )
    corpus = generate_pattern_corpus(entities)
    return corpus.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("pattern").alias("text"),
        "entity_id",
        "tier",
    ).persist()


def test_screen_texts_end_to_end(spark, watchlist):
    texts = spark.createDataFrame(
        [
            (1, "перевод средств Иванов Иван Петрович 15.05.1985"),
            (2, "payment to Kovalenko Olena for services"),
            (3, "совершенно безобидный текст про погоду"),
            (4, "оплата ИНН 7707083893"),  # checksum-valid (D2 gating)
        ],
        "text_id long, text string",
    )
    out = {r["text_id"]: r for r in screen_texts(texts, watchlist).collect()}
    assert out[1]["best_entity_id"] == 1
    assert out[1]["risk"] in ("MEDIUM", "HIGH")
    assert out[1]["n_dates"] == 1
    assert out[2]["best_entity_id"] == 2
    assert out[3]["total_matches"] == 0 and out[3]["risk"] == "LOW"
    assert out[4]["n_ids"] >= 1
    assert out[4]["best_entity_id"] == 1  # tier-0 ITN pattern hit
    assert out[4]["risk"] == "HIGH"  # sanctioned-ID boost
    # 'Петрович' trips the reference's 'ич' Ukrainian marker — faithful
    assert out[1]["language"] == "uk" and out[2]["language"] == "en"
