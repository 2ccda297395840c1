"""Block-max θ-pruning effectiveness on a Zipfian corpus.

The harness documents table is near-uniform, where every chunk's upper
bound ties and pruning provably cannot help (99.9% survival measured in
round 3 — BENCH.md).  Real web text is Zipfian; these tests pin, on a
seeded Zipf corpus (sources/synth.py), that

  * pruned top-k is RANK-IDENTICAL to exhaustive scoring (exactness is
    corpus-independent, but assert it in the regime where pruning actually
    fires), and
  * for the canonical WAND-winning shape — a ubiquitous term + a rare,
    high-idf term — θ from the seed chunks prunes most candidate chunks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hybrid_sanctions_search_engine_spark.sources.synth import zipf_documents

N_DOCS = 40_000
VOCAB = 20_000
DOC_LEN = 60


@pytest.fixture(scope="module")
def zipf_index(spark, tmp_path_factory):
    from hybrid_sanctions_search_engine_spark.sources.index_io import (
        build_index,
        load_index,
    )

    docs = zipf_documents(spark, N_DOCS, vocab_size=VOCAB, doc_len=DOC_LEN).persist()
    index_dir = str(tmp_path_factory.mktemp("zipf_idx"))
    build_index(docs, index_dir, n_shards=4, chunk_bits=7)
    idx, meta = load_index(spark, index_dir)
    idx = idx.persist()
    idx.count()
    yield docs, index_dir, idx, meta
    idx.unpersist()
    docs.unpersist()


def test_corpus_is_deterministic_and_zipfian(spark):
    a = sorted(
        (r["doc_id"], r["text"])
        for r in zipf_documents(spark, 500, vocab_size=2000, doc_len=30).collect()
    )
    b = sorted(
        (r["doc_id"], r["text"])
        for r in zipf_documents(spark, 500, vocab_size=2000, doc_len=30).collect()
    )
    assert a == b
    # Zipf shape: the top term's df dwarfs the median term's
    from hybrid_sanctions_search_engine_spark.operators.postings import (
        build_postings,
        term_doc_freq,
    )

    docs = zipf_documents(spark, 2000, vocab_size=5000, doc_len=40)
    dfs = sorted(
        (r["df"] for r in term_doc_freq(build_postings(docs)).collect()),
        reverse=True,
    )
    assert dfs[0] > 20 * dfs[len(dfs) // 2]


@pytest.mark.parametrize(
    "query",
    ["w1 w9000", "w0 w2 w15000", "w4000 w11000", "w3"],
)
def test_pruned_rank_identical_to_exhaustive(spark, zipf_index, query):
    from hybrid_sanctions_search_engine_spark.plans.wand import topk_search

    _, index_dir, idx, meta = zipf_index
    pruned = [
        (r["doc_id"], round(r["score"], 9))
        for r in topk_search(
            spark, index_dir, query, k=10, index_df=idx, meta=meta
        ).collect()
    ]
    exhaustive = [
        (r["doc_id"], round(r["score"], 9))
        for r in topk_search(
            spark, index_dir, query, k=10, index_df=idx, meta=meta,
            seed_chunks=10**6,  # forces the single-pass score-everything path
        ).collect()
    ]
    assert pruned == exhaustive, query


def test_pruning_bites_on_zipf(spark, zipf_index):
    """Ubiquitous + rare query: chunks holding only the ubiquitous term
    bound below θ and are skipped — the block-max WAND regime."""
    from hybrid_sanctions_search_engine_spark.plans.wand import topk_search

    _, index_dir, idx, meta = zipf_index
    # θ needs k rare-term hits in the seed: the rare term's postings sit
    # one-per-chunk, so seed_chunks must exceed k (seed 8, k 5) — the
    # standard WAND dynamic, not a corpus artifact
    stats: dict = {}
    topk_search(
        spark, index_dir, "w1 w9000", k=5, seed_chunks=8, index_df=idx,
        meta=meta, stats_out=stats,
    ).collect()
    assert stats["chunks_total"] > 100  # the ubiquitous term reaches ~all chunks
    survival = stats["chunks_scored"] / stats["chunks_total"]
    assert survival < 0.15, stats
    # even an all-ubiquitous query prunes on Zipf text: per-chunk max-tf
    # variance (Poisson tails of the head terms) separates the bounds, so
    # θ from the best chunks skips ordinary ones — measured 9/313 here.
    # Only a tf-UNIFORM corpus (the harness table) defeats pruning.
    stats2: dict = {}
    topk_search(
        spark, index_dir, "w0 w1", k=5, seed_chunks=8, index_df=idx,
        meta=meta, stats_out=stats2,
    ).collect()
    assert stats2["chunks_scored"] / stats2["chunks_total"] < 0.5
