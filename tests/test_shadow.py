"""Shadow-mode comparison: identical engines agree; perturbed ones gate."""

from __future__ import annotations

import os

from hybrid_sanctions_search_engine_spark.operators.bm25 import batch_topk
from hybrid_sanctions_search_engine_spark.operators.shadow import (
    compare_shadow,
    shadow_gate,
)

QUERIES = [(1, "spark query join"), (2, "window table"), (3, "merge sort hash")]


def test_identical_engines_agree(spark, sf_smoke_dir):
    docs = spark.read.parquet(os.path.join(sf_smoke_dir, "documents.parquet"))
    a = batch_topk(docs, QUERIES, k=10)
    b = batch_topk(docs, QUERIES, k=10)
    cmp_df = compare_shadow(a, b, k=10)
    rows = {r["query_id"]: r for r in cmp_df.collect()}
    assert all(r["overlap_at_k"] == 1.0 for r in rows.values())
    assert all(r["rank_mae"] == 0.0 for r in rows.values())
    gate = shadow_gate(cmp_df)
    assert gate["passed"] and gate["n_queries"] == 3


def test_perturbed_engine_fails_gate(spark, sf_smoke_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_smoke_dir, "documents.parquet"))
    a = batch_topk(docs, QUERIES, k=10)
    # "shadow engine" drops half the corpus -> rankings shift
    b = batch_topk(docs.where(F.col("doc_id") % 2 == 0), QUERIES, k=10)
    gate = shadow_gate(compare_shadow(a, b, k=10))
    assert not gate["passed"]
