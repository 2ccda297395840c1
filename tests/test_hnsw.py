"""HNSW-over-partitions prototype (round-6 verdict "what's missing" #3).

Correctness pins for the measurement prototype behind the IVF-vs-HNSW
adjudication (DESIGN_100TB.md): the per-partition graph search is exact
when the beam covers the partition, and the partitioned probe's recall on
the clustered fixture is high at moderate ef_search.
"""

from __future__ import annotations

import numpy as np
import pytest

from hybrid_sanctions_search_engine_spark.operators.ann_recall import (
    brute_force_topk,
    make_clustered_fixture,
)
from hybrid_sanctions_search_engine_spark.operators.hnsw import (
    _HnswGraph,
    hnsw_probe_partitioned,
)


def test_graph_search_exact_when_beam_covers_all():
    """ef_search = n ⇒ the beam visits the whole (connected) graph and the
    result equals brute force — search correctness independent of recall."""
    x, q = make_clustered_fixture(
        n=400, dim=32, n_clusters=8, n_queries=5, query_mode="member", seed=3
    )
    g = _HnswGraph(m=8, ef_construction=64)
    g.build(x, np.arange(400, dtype=np.int64))
    truth = brute_force_topk(x, q, k=5)
    for i in range(q.shape[0]):
        got = [node for _, node in g.search(q[i], k=5, ef_search=400)]
        assert got == list(truth[i]), i


def test_graph_levels_deterministic():
    g = _HnswGraph(m=8)
    assert [g._level_of(i) for i in range(6)] == [
        g._level_of(i) for i in range(6)
    ]
    # levels follow the exponential decay: most nodes at level 0
    levels = [g._level_of(i) for i in range(2000)]
    assert sum(1 for l in levels if l == 0) > 1500
    assert max(levels) >= 2


def test_partitioned_probe_recall(spark):
    """4 partition graphs over the clustered fixture: merged top-10 recall
    vs brute force ≥ 0.9 at ef_search 96 (member queries)."""
    n, dim, k = 4000, 64, 10
    x, q = make_clustered_fixture(
        n=n, dim=dim, n_clusters=16, n_queries=10, query_mode="member", seed=11
    )
    emb = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    queries = [(i, q[i].tolist()) for i in range(q.shape[0])]
    res = hnsw_probe_partitioned(
        emb, queries, k=k, n_partitions=4, m=8,
        ef_construction=64, ef_search=96,
    ).collect()
    got: dict[int, list[int]] = {}
    for r in res:
        got.setdefault(r["query_id"], []).append(r["vec_id"])
    truth = brute_force_topk(x, q, k=k)
    hits = sum(
        len(set(got.get(i, [])) & set(truth[i])) for i in range(q.shape[0])
    )
    recall = hits / (q.shape[0] * k)
    assert recall >= 0.9, recall


def test_empty_queries(spark):
    emb = spark.createDataFrame(
        [(1, [0.1] * 8)], "vec_id long, embedding array<double>"
    )
    assert hnsw_probe_partitioned(emb, [], k=3).count() == 0
