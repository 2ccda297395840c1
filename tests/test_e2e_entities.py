"""End-to-end reference dataflow (§3.3): entities → tiered patterns →
compressed AC index → hybrid query finds the entity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hybrid_sanctions_search_engine_spark.operators.bm25 import batch_topk
from hybrid_sanctions_search_engine_spark.operators.patterns import (
    generate_pattern_corpus,
)
from hybrid_sanctions_search_engine_spark.plans.wand import topk_search
from hybrid_sanctions_search_engine_spark.sources.index_io import build_index, load_index


@pytest.fixture(scope="module")
def pattern_index(spark, tmp_path_factory):
    entities = spark.createDataFrame(
        [
            (1, "Иванов Иван Петрович", "Ivanov Ivan", "1234567890", "AA123456", None, "person", ["Ваня Иванов"]),
            (2, "Петров Сидор", "Petrov Sidor", None, "BB654321", None, "person", []),
            (3, "Коваленко Олена Василівна", "Kovalenko Olena", "987654321012", None, None, "person", []),
        ],
        "id long, name string, name_en string, itn string, passport string, iban string, entity_type string, aliases array<string>",
    )
    corpus = generate_pattern_corpus(entities)
    # patterns become the indexed "documents": doc_id encodes the entity
    pattern_docs = corpus.select(
        (F.col("entity_id") * 1000 + F.monotonically_increasing_id() % 1000).alias(
            "doc_id"
        ),
        F.col("pattern").alias("text"),
        "entity_id",
        "tier",
    ).persist()
    index_dir = str(tmp_path_factory.mktemp("ac_index"))
    build_index(pattern_docs, index_dir, n_shards=4, chunk_bits=8)
    idx, meta = load_index(spark, index_dir)
    return pattern_docs, index_dir, idx, meta


def test_exact_name_hits_entity(spark, pattern_index):
    pattern_docs, index_dir, idx, meta = pattern_index
    res = topk_search(spark, index_dir, "иванов иван петрович", k=5, index_df=idx, meta=meta)
    hits = res.join(pattern_docs, "doc_id").select("entity_id").collect()
    assert hits and hits[0]["entity_id"] == 1


def test_translit_query_hits_entity(spark, pattern_index):
    pattern_docs, index_dir, idx, meta = pattern_index
    res = topk_search(spark, index_dir, "kovalenko olena", k=5, index_df=idx, meta=meta)
    hits = res.join(pattern_docs, "doc_id").select("entity_id").collect()
    assert hits and hits[0]["entity_id"] == 3


def test_id_anchor_hits_entity(spark, pattern_index):
    pattern_docs, index_dir, idx, meta = pattern_index
    res = topk_search(spark, index_dir, "1234567890", k=5, index_df=idx, meta=meta)
    hits = res.join(pattern_docs, "doc_id").select("entity_id", "tier").collect()
    assert hits and hits[0]["entity_id"] == 1 and hits[0]["tier"] == 0


def test_batch_queries_over_patterns(spark, pattern_index):
    pattern_docs, *_ = pattern_index
    res = batch_topk(
        pattern_docs,
        [(1, "иванов"), (2, "petrov sidor"), (3, "ваня")],
        k=3,
    )
    by_q = {}
    rows = res.join(pattern_docs.select("doc_id", "entity_id"), "doc_id").collect()
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["entity_id"])
    assert 1 in by_q[1]
    assert by_q[2][0] == 2
    assert 1 in by_q[3]  # diminutive alias ваня indexed for entity 1
