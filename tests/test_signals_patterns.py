"""Signals extraction + transliteration + tiered pattern generation."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from hybrid_sanctions_search_engine_spark.functions.signals import (
    extract_dates_col,
    extract_ids_col,
    mask_ids_in_text_col,
    normalize_birthdate_col,
    redact_columns,
    sanitize_query,
)
from hybrid_sanctions_search_engine_spark.functions.translit import (
    gender_variants,
    resolve_diminutive,
    tag_role,
    to_cyrillic,
    to_latin,
    translit_variants,
)
from hybrid_sanctions_search_engine_spark.operators.patterns import (
    generate_pattern_corpus,
    generate_patterns,
    tier_distribution,
)


def test_translit_roundtrip_core():
    assert to_latin("Иванов Щука") == "Ivanov Shchuka"
    assert to_cyrillic("Ivanov") == "Иванов"
    vs = translit_variants("Петров Иван Ович")
    assert any("Petrov" in v for v in vs)


def test_roles_and_variants():
    assert tag_role("И.") == "initial"
    assert tag_role("Петрович") == "patronymic"
    assert tag_role("Иванов") == "surname"
    assert tag_role("Иван") == "given"
    assert gender_variants("Иванов") == ["Иванова"]
    assert gender_variants("Иванова") == ["Иванов"]
    assert resolve_diminutive("Ваня") == "Иван"


def test_sanitize_query():
    assert sanitize_query("<b>иван</b> union select * from x") == "bиван/b * from x"
    assert len(sanitize_query("x" * 5000)) == 1000


def test_generate_patterns_pure():
    entity = {
        "id": 1,
        "name": "Иванов Иван Петрович",
        "name_en": "Ivanov Ivan",
        "itn": "1234567890",
        "passport": "AA123456",
        "iban": "UA21" + "3223130000" + "0" * 15,
        "entity_type": "person",
        "aliases": ["Ваня Иванов"],
    }
    pats = generate_patterns(entity)
    by_tier = {}
    for p in pats:
        by_tier.setdefault(p[2], []).append(p)
    assert any(p[0] == "1234567890" for p in by_tier[0])
    assert any(p[0] == "AA-123456" for p in by_tier[0])
    assert any(p[0] == "иванов иван петрович" for p in by_tier[1])
    # word-order permutation: patronymic-first
    assert any(p[0] == "петрович иванов иван" for p in by_tier[1])
    assert any("ivanov" in p[0] for p in by_tier[2])  # translit
    assert any(p[0] == "иванова иван петрович" for p in by_tier[2])  # gender
    assert any(p[0] == "иванов" and p[3] == "surname_only" for p in by_tier[3])
    # diminutive in alias resolved: ваня -> иван
    assert any("иван" in p[0] and p[3] == "diminutive" for p in by_tier[2])


def test_pattern_corpus_spark(spark):
    entities = spark.createDataFrame(
        [
            (1, "Иванов Иван Петрович", "Ivanov Ivan", "1234567890", "AA123456", None, "person", ["Ваня Иванов"]),
            (2, "Петрова-Сидорова Анна", None, "123456789012", None, None, "person", []),
            (3, "ООО Ромашка", "Romashka LLC", None, None, None, "company", []),
        ],
        "id long, name string, name_en string, itn string, passport string, iban string, entity_type string, aliases array<string>",
    )
    corpus = generate_pattern_corpus(entities)
    rows = corpus.collect()
    assert len(rows) > 10
    assert {r["entity_id"] for r in rows} == {1, 2, 3}
    dist = {r["tier"]: r["n"] for r in tier_distribution(corpus).collect()}
    assert dist[0] >= 2 and dist[1] >= 3
    # caps respected
    from collections import Counter

    per = Counter((r["entity_id"], r["tier"]) for r in rows)
    from hybrid_sanctions_search_engine_spark.operators.patterns import TIER_LIMITS

    for (eid, tier), n in per.items():
        assert n <= TIER_LIMITS[tier]


def test_signals_extraction(spark):
    df = spark.createDataFrame(
        [
            (1, "born 15.05.1985 in kyiv, inn 7707083893, passport AA123456"),
            (2, "meeting on 2021-03-04 and 1/2/1999"),
            (3, "iban UA213223130000026007233566001 swift PBANUA2X"),
        ],
        "id long, text string",
    )
    out = df.select(
        "id",
        extract_dates_col(F.col("text")).alias("dates"),
        extract_ids_col(F.col("text")).alias("ids"),
        mask_ids_in_text_col(F.col("text")).alias("masked"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["dates"] == ["15.05.1985"]
    kinds1 = {(s["kind"], s["value"]) for s in by_id[1]["ids"]}
    # checksum-valid INN extracted (arbitrary digit runs are now rejected —
    # see test_extract_ids_checksum_gating)
    assert ("inn_10", "7707083893") in kinds1
    assert ("passport", "AA123456") in kinds1
    assert sorted(by_id[2]["dates"]) == ["1/2/1999", "2021-03-04"]
    kinds3 = {s["kind"] for s in by_id[3]["ids"]}
    assert "iban_ua" in kinds3 and "swift" in kinds3
    assert "[ID]" in by_id[1]["masked"] and "7707083893" not in by_id[1]["masked"]

    bd = spark.createDataFrame(
        [("15.05.1985",), ("1985-05-15",), ("1/2/1999",), ("garbage",)], "raw string"
    ).select(normalize_birthdate_col(F.col("raw")).alias("d")).collect()
    assert bd[0]["d"] == datetime.date(1985, 5, 15)
    assert bd[1]["d"] == datetime.date(1985, 5, 15)
    assert bd[2]["d"] == datetime.date(1999, 2, 1)
    assert bd[3]["d"] is None


def test_redact_columns(spark):
    df = spark.createDataFrame([(1, "1234567890", "ok")], "id long, itn string, note string")
    out = redact_columns(df, ["itn", "missing"]).collect()[0]
    assert out["itn"] == "[REDACTED]" and out["note"] == "ok"


def test_assemble_name():
    from hybrid_sanctions_search_engine_spark.functions.translit import assemble_name

    # canonical ordering regardless of input order; title case restored
    assert assemble_name(["ИВАНОВ", "иван", "петрович"]) == "Иван Петрович Иванов"
    assert assemble_name(["петрова-сидорова", "анна"]) == "Анна Петрова-Сидорова"
    assert assemble_name(["и.", "иванов"]) == "И. Иванов"


def test_identifier_checksums(spark):
    """Known-real identifiers validate; single-digit corruptions don't
    (D2 checksum algorithms, reference identifiers.py:328-455)."""
    from pyspark.sql import functions as F

    from hybrid_sanctions_search_engine_spark.functions.identifiers import (
        edrpou_valid,
        inn_ru10_valid,
        inn_ru12_valid,
        inn_ua10_valid,
        inn_valid,
        ogrn_valid,
        ogrnip_valid,
    )

    rows = [
        # (value, kind, expected)
        ("7707083893", "ru10", True),    # Sberbank INN
        ("7707083894", "ru10", False),
        ("500100732259", "ru12", True),  # canonical test INN
        ("500100732258", "ru12", False),
        ("00032129", "edrpou", True),    # NBU EDRPOU
        ("00032120", "edrpou", False),
        ("123456", "edrpou", True),      # 6-digit: length-only
        ("1027700132195", "ogrn", True), # Sberbank OGRN
        ("1027700132190", "ogrn", False),
        ("304500116000157", "ogrnip", True),
        ("304500116000150", "ogrnip", False),
    ]
    df = spark.createDataFrame(
        [(v, k, e) for v, k, e in rows], "value string, kind string, expected boolean"
    )
    checks = {
        "ru10": inn_ru10_valid, "ru12": inn_ru12_valid,
        "edrpou": edrpou_valid, "ogrn": ogrn_valid, "ogrnip": ogrnip_valid,
    }
    got = df.withColumn(
        "valid",
        F.coalesce(
            *[F.when(F.col("kind") == k, fn(F.col("value"))) for k, fn in checks.items()]
        ),
    ).collect()
    for r in got:
        assert r["valid"] == r["expected"], (r["value"], r["kind"])

    # inn_valid accepts RU-or-UA per the reference's validate_inn
    ua = spark.createDataFrame([("1234567895",)], "v string")  # Σ(1..9)%10 = 5
    assert ua.select(inn_ua10_valid(F.col("v")).alias("x")).collect()[0]["x"] is True
    assert ua.select(inn_valid(F.col("v")).alias("x")).collect()[0]["x"] is True


def test_extract_ids_checksum_gating(spark):
    """A random 10-digit run is no longer an ID anchor; a checksum-valid INN
    still is (screening false-positive fix)."""
    from pyspark.sql import functions as F

    from hybrid_sanctions_search_engine_spark.functions.signals import (
        extract_ids_col,
    )

    df = spark.createDataFrame(
        [(1, "account 9999999999 is not an INN"),
         (2, "INN 7707083893 of the org"),
         (3, "ОГРН: 1027700132195 registered")],
        "id int, text string",
    )
    out = {r["id"]: r["ids"] for r in df.select(
        "id", extract_ids_col(F.col("text")).alias("ids")).collect()}
    assert all(i["kind"] != "inn_10" for i in out[1])
    assert any(i["kind"] == "inn_10" and i["value"] == "7707083893" for i in out[2])
    assert any(i["kind"] == "ogrn" and i["value"] == "1027700132195" for i in out[3])


def test_gender_variants_equal_length_pairs():
    """Regression (round-2 review): equal-length suffix pairs must flip —
    appending the suffix difference produced '' for -ский/-ская."""
    assert gender_variants("Ковальский") == ["Ковальская"]
    assert gender_variants("Ковальская") == ["Ковальский"]
    assert gender_variants("Вербицький") == ["Вербицька"]
    assert gender_variants("Вербицька") == ["Вербицький"]
    assert gender_variants("Петренко") == []  # invariable
