"""ANN recall curves: emulation ≡ the real partition-pruned probes, and
recall floors at the serving defaults.

The reference's ES HNSW layer publishes its ef_search/num_candidates dials
(``elasticsearch_index_manager.py:209-214``); ``operators.ann_recall``
publishes the recall@k-vs-dial analogue for IVF (n_probe) and LSH
(max_hamming).  The curve machinery replays probe selection in numpy from
the written index's own columns — these tests pin (a) that the replay is
EXACTLY the candidate selection ``knn_ivf_probe`` / ``knn_lsh_probe``
perform, and (b) recall floors at the default dials on the clustered
384-dim fixture (deterministic seed, so the floors are tight)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hybrid_sanctions_search_engine_spark.operators.ann_recall import (
    brute_force_topk,
    ivf_recall_curve,
    lsh_recall_curve,
    make_clustered_fixture,
    recall_report,
)

N, DIM = 4000, 384


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    from hybrid_sanctions_search_engine_spark.operators.similarity import (
        write_ivf_index,
        write_lsh_index,
    )

    x, q = make_clustered_fixture(n=N, dim=DIM, query_mode="boundary")
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(N, dtype=np.int64), "embedding": list(x)})
    )
    base = tmp_path_factory.mktemp("ann_recall")
    ivf_dir, lsh_dir = str(base / "ivf"), str(base / "lsh")
    write_ivf_index(emb, ivf_dir, n_centroids=16)
    write_lsh_index(emb, lsh_dir, dim=DIM, n_planes=16)
    return x, q, emb, ivf_dir, lsh_dir


def test_ivf_replay_matches_real_probe(spark, built):
    """The numpy replay returns EXACTLY knn_ivf_probe's result ids."""
    from hybrid_sanctions_search_engine_spark.operators.similarity import (
        knn_ivf_probe,
        load_ivf_index,
    )

    x, q, _, ivf_dir, _ = built
    indexed, cents = load_ivf_index(spark, ivf_dir)
    truth = brute_force_topk(x, q[:3], 10)
    # recall computed by the curve on these 3 queries ...
    curve = ivf_recall_curve(ivf_dir, x, q[:3], truth, [2], k=10)
    # ... must equal recall of the REAL probe's collected ids
    hits = 0
    for i in range(3):
        got = [
            r["vec_id"]
            for r in knn_ivf_probe(indexed, cents, q[i].tolist(), k=10, n_probe=2)
            .collect()
        ]
        hits += len(set(got) & set(truth[i].tolist()))
    assert curve[2] == pytest.approx(hits / 30)


def test_lsh_replay_matches_real_probe(spark, built):
    from hybrid_sanctions_search_engine_spark.operators.similarity import (
        knn_lsh_probe,
    )

    x, q, _, _, lsh_dir = built
    truth = brute_force_topk(x, q[:3], 10)
    curve = lsh_recall_curve(lsh_dir, x, q[:3], truth, [2], k=10)
    hits = 0
    for i in range(3):
        got = [
            r["vec_id"]
            for r in knn_lsh_probe(
                spark, lsh_dir, q[i].tolist(), k=10, max_hamming=2
            ).collect()
        ]
        hits += len(set(got) & set(truth[i].tolist()))
    assert curve[2] == pytest.approx(hits / 30)


def test_ivf_pq_replay_matches_real_probe(spark, built, tmp_path_factory):
    """The numpy replay (cells → ADC top refine·k → exact re-rank) scores
    the same recall as the REAL knn_ivf_pq_probe at the same dials."""
    from hybrid_sanctions_search_engine_spark.operators.ann_recall import (
        ivf_pq_recall_curve,
    )
    from hybrid_sanctions_search_engine_spark.operators.pq import (
        knn_ivf_pq_probe,
        load_ivf_pq_index,
        write_ivf_pq_index,
    )

    x, q, emb, _, _ = built
    pq_dir = str(tmp_path_factory.mktemp("ann_recall_pq") / "ivf_pq")
    write_ivf_pq_index(emb, pq_dir, n_centroids=16, m=48)
    indexed, cents, books = load_ivf_pq_index(spark, pq_dir)
    truth = brute_force_topk(x, q[:3], 10)
    curve = ivf_pq_recall_curve(pq_dir, x, q[:3], truth, [2], n_probe=2, k=10)
    hits = 0
    for i in range(3):
        got = [
            r["vec_id"]
            for r in knn_ivf_pq_probe(
                indexed, cents, books, q[i].tolist(), k=10, n_probe=2, refine=2
            ).collect()
        ]
        hits += len(set(got) & set(truth[i].tolist()))
    assert curve[2] == pytest.approx(hits / 30)


def test_ivf_sq8_replay_matches_real_probe(spark, built, tmp_path_factory):
    """The numpy replay (cells → decoded-dot top refine·k → exact re-rank)
    scores the same recall as the REAL knn_ivf_sq8_probe at the same
    dials."""
    from hybrid_sanctions_search_engine_spark.operators.ann_recall import (
        ivf_sq8_recall_curve,
    )
    from hybrid_sanctions_search_engine_spark.operators.sq import (
        knn_ivf_sq8_probe,
        load_ivf_sq8_index,
        write_ivf_sq8_index,
    )

    x, q, emb, _, _ = built
    sq_dir = str(tmp_path_factory.mktemp("ann_recall_sq") / "ivf_sq8")
    write_ivf_sq8_index(emb, sq_dir, n_centroids=16)
    indexed, cents, vmin, vmax = load_ivf_sq8_index(spark, sq_dir)
    truth = brute_force_topk(x, q[:3], 10)
    curve = ivf_sq8_recall_curve(sq_dir, x, q[:3], truth, [2], n_probe=2, k=10)
    hits = 0
    for i in range(3):
        got = [
            r["vec_id"]
            for r in knn_ivf_sq8_probe(
                indexed, cents, vmin, vmax, q[i].tolist(),
                k=10, n_probe=2, refine=2,
            ).collect()
        ]
        hits += len(set(got) & set(truth[i].tolist()))
    assert curve[2] == pytest.approx(hits / 30)


def test_recall_floors_at_default_dials(spark):
    """Floors at the serving defaults (HybridSearchPlan: n_probe=3,
    max_hamming=2) on the 8k × 384 clustered fixture — measured
    {ivf member@1: 1.0, ivf boundary@2: 1.0, lsh member@2: 0.552,
    lsh member@3: 0.776}; floors leave margin for BLAS variation only."""
    rep = recall_report(
        spark, n=8000, dim=DIM, n_probes=[1, 2, 3], max_hammings=[2, 3]
    )
    assert rep["ivf_recall_at_10_by_n_probe_member"]["1"] >= 0.95
    assert rep["ivf_recall_at_10_by_n_probe_boundary"]["2"] >= 0.95
    assert rep["ivf_recall_at_10_by_n_probe_boundary"]["3"] >= 0.95
    assert rep["lsh_recall_at_10_by_max_hamming_member"]["2"] >= 0.45
    assert rep["lsh_recall_at_10_by_max_hamming_member"]["3"] >= 0.65
    # the curves are monotone in the dial
    ivf_b = rep["ivf_recall_at_10_by_n_probe_boundary"]
    assert ivf_b["1"] <= ivf_b["2"] <= ivf_b["3"]


def test_lsh_multiband_replay_matches_real_probe(spark, built, tmp_path_factory):
    """OR-amplified banded LSH: the numpy replay selects exactly the
    candidates knn_lsh_multiband_probe does (band equality, union over
    probed bands), and recall at full width beats the single-signature
    multi-probe layout at its widest dial on the same fixture."""
    from hybrid_sanctions_search_engine_spark.operators.ann_recall import (
        lsh_multiband_recall_curve,
        lsh_recall_curve,
    )
    from hybrid_sanctions_search_engine_spark.operators.similarity import (
        knn_lsh_multiband_probe,
        write_lsh_multiband_index,
    )

    x, q, emb, _, lsh_dir = built
    mb_dir = str(tmp_path_factory.mktemp("ann_mb") / "mb")
    write_lsh_multiband_index(emb, mb_dir, dim=DIM, n_bands=8, band_bits=8)
    truth = brute_force_topk(x, q[:3], 10)
    curve = lsh_multiband_recall_curve(mb_dir, x, q[:3], truth, [4], k=10)
    hits = 0
    for i in range(3):
        got = [
            r["vec_id"]
            for r in knn_lsh_multiband_probe(
                spark, mb_dir, q[i].tolist(), k=10, n_probe_bands=4
            ).collect()
        ]
        hits += len(set(got) & set(truth[i].tolist()))
    assert curve[4] == pytest.approx(hits / 30)

    # OR-amplification beats single-signature multi-probe at its widest
    # documented dial on the full query set
    truth_all = brute_force_topk(x, q, 10)
    mb_full = lsh_multiband_recall_curve(mb_dir, x, q, truth_all, [8], k=10)[8]
    sp_widest = lsh_recall_curve(lsh_dir, x, q, truth_all, [3], k=10)[3]
    assert mb_full >= sp_widest


def test_multiband_recall_floor_at_defaults(spark):
    """Floors at the 8×8 defaults on the 8k × 384 clustered fixture —
    measured member recall by bands probed {1: 0.342, 2: 0.584, 4: 0.782,
    8: 0.916} at n=20k; floors leave margin for the smaller fixture."""
    rep = recall_report(
        spark, n=8000, dim=DIM,
        n_probes=[1], max_hammings=[2], n_probe_bands=[4, 8],
    )
    mb = rep["lsh_mb_recall_at_10_by_bands_probed_member"]
    assert mb["8"] >= 0.8
    assert mb["4"] >= 0.6
    assert mb["8"] >= mb["4"]


def test_pq_m_for_dim_divides():
    """recall_report's PQ subspace count must divide dim for any dim —
    dim//8 alone fails e.g. dim=100 (m=12, 100 % 12 = 4)."""
    from hybrid_sanctions_search_engine_spark.operators.ann_recall import (
        _pq_m_for_dim,
    )

    for dim in (8, 64, 100, 96, 384, 7, 1, 130):
        m = _pq_m_for_dim(dim)
        assert dim % m == 0 and 1 <= m <= max(dim // 8, 1), (dim, m)
    assert _pq_m_for_dim(384) == 48
    assert _pq_m_for_dim(100) == 10
