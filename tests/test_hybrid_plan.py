"""Hybrid escalation ladder: stage gating, fusion, trace."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hybrid_sanctions_search_engine_spark.functions.vectors import pseudo_embedding
from hybrid_sanctions_search_engine_spark.plans.hybrid import (
    HybridSearchPlan,
    SearchOpts,
)


@pytest.fixture(scope="module")
def plan(spark, sf_smoke_dir):
    docs = spark.read.parquet(os.path.join(sf_smoke_dir, "documents.parquet"))
    # embeddings keyed by doc_id with the deterministic pseudo-embedding of
    # each doc's text, so the vector stage is semantically aligned
    rows = [
        (r["doc_id"], pseudo_embedding(r["text"], 64))
        for r in docs.select("doc_id", "text").limit(200).collect()
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return HybridSearchPlan(docs, embeddings=emb, embedding_dim=64)


def test_strong_ac_no_escalation(plan):
    # common corpus words give BM25 scores well above 0.6
    res, trace = plan.search("spark query join window", SearchOpts(top_k=10))
    stages = [t.stage for t in trace]
    assert "AC" in stages and "FUZZY" not in stages
    rows = res.collect()
    assert 0 < len(rows) <= 10
    assert rows == sorted(rows, key=lambda r: (-r["score"], r["doc_id"]))


def test_typo_escalates_to_fuzzy(plan):
    # no such term in the corpus -> AC empty -> fuzzy expands sparc->spark
    res, trace = plan.search("sparc", SearchOpts(top_k=10))
    stages = [t.stage for t in trace]
    assert "FUZZY" in stages and "SEMANTIC" in stages
    assert res.count() > 0


def test_escalation_threshold_gate(plan):
    _, trace_low = plan.search(
        "spark query join window", SearchOpts(escalation_threshold=99.0)
    )
    assert "FUZZY" in [t.stage for t in trace_low]
    _, trace_off = plan.search(
        "sparc", SearchOpts(enable_escalation=False)
    )
    assert [t.stage for t in trace_off if t.stage == "FUZZY"] == []


def test_fusion_bonus_applied(plan):
    res, trace = plan.search("sparc", SearchOpts(top_k=5))
    assert res.columns == ["doc_id", "score"]
    assert all(t.took_ms >= 0 for t in trace)
