"""Adversarial corpora: index + query stack vs an independent pure-Python
BM25 oracle on edge-case inputs the synthetic corpus can't produce."""

from __future__ import annotations

import math
import re

import pytest

from hybrid_sanctions_search_engine_spark.operators.bm25 import bm25_topk
from hybrid_sanctions_search_engine_spark.plans.wand import topk_search
from hybrid_sanctions_search_engine_spark.sources.index_io import build_index


def python_bm25_topk(docs: list[tuple[int, str]], query: str, k: int):
    """Independent reference scorer (pure python, no shared code paths)."""
    tokenized = {d: [t for t in re.split(r"[\W_]+", txt.lower()) if t] for d, txt in docs}
    n = len(docs)
    avgdl = sum(len(ts) for ts in tokenized.values()) / max(n, 1)
    terms = [t for t in re.split(r"[\W_]+", query.lower()) if t]
    df = {t: sum(1 for ts in tokenized.values() if t in ts) for t in terms}
    scores = {}
    for d, ts in tokenized.items():
        s = 0.0
        matched = 0
        for t in set(terms):
            tf = ts.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * len(ts) / avgdl))
            matched += 1
        if matched:
            scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, round(s, 9)) for d, s in ranked]


CORPORA = {
    "tf_over_blocksize": [
        (0, "hot " * 300 + "cold"),          # tf=300 > varint 1-byte & block 128
        (1, "hot cold other words here"),
        (2, "cold only text with filler terms"),
    ],
    "empty_and_sparse_ids": [
        (0, ""),                              # empty doc (counts in N/avgdl)
        (7, "alpha beta gamma"),
        (10**9 + 7, "alpha delta"),           # huge sparse doc_id (chunking)
        (10**12 + 3, "beta beta beta gamma"),
        (5, "   "),                           # whitespace-only
    ],
    "single_doc": [(42, "lonely document about spark")],
    "all_same_text": [(i, "same words every time") for i in range(10)],
}

QUERIES = ["hot cold", "alpha beta", "spark lonely", "same time", "absent"]


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_adversarial_rank_identity(spark, tmp_path_factory, name):
    docs_list = CORPORA[name]
    docs = spark.createDataFrame(docs_list, "doc_id long, text string")
    index_dir = str(tmp_path_factory.mktemp(f"adv_{name}"))
    report = build_index(docs, index_dir, n_shards=2, chunk_bits=4)
    assert report["n_docs"] == len(docs_list)

    for q in QUERIES:
        expected = python_bm25_topk(docs_list, q, k=5)
        via_df = [
            (r["doc_id"], round(r["score"], 9)) for r in bm25_topk(docs, q, k=5).collect()
        ]
        via_index = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk_search(spark, index_dir, q, k=5).collect()
        ]
        assert via_df == expected, (name, q, "dataframe")
        assert via_index == expected, (name, q, "index")


def _python_batch(docs_list, queries, k):
    out = {}
    for qid, q in queries:
        out[qid] = python_bm25_topk(docs_list, q, k)
    return out


@pytest.mark.parametrize("name", sorted(CORPORA))
def test_batch_paths_match_python_oracle(spark, tmp_path_factory, name):
    """Both batch serving paths (document-side and compressed-index, sharing
    the per-group Arrow scorer) reproduce the independent python oracle on
    every adversarial corpus — the whole query set in ONE batch."""
    from hybrid_sanctions_search_engine_spark.operators.bm25 import batch_topk
    from hybrid_sanctions_search_engine_spark.plans.wand import batch_topk_indexed

    docs_list = CORPORA[name]
    docs = spark.createDataFrame(docs_list, "doc_id long, text string")
    index_dir = str(tmp_path_factory.mktemp(f"advb_{name}"))
    build_index(docs, index_dir, n_shards=2, chunk_bits=4)
    queries = list(enumerate(QUERIES))
    want = _python_batch(docs_list, queries, k=5)

    for label, res in (
        ("doc-side", batch_topk(docs, queries, k=5)),
        ("indexed", batch_topk_indexed(spark, index_dir, queries, k=5)),
    ):
        got: dict[int, list] = {qid: [] for qid, _ in queries}
        for r in res.collect():
            got[r["query_id"]].append((r["rank"], r["doc_id"], round(r["score"], 9)))
        for qid, q in queries:
            ranked = [(d, s) for _, d, s in sorted(got[qid])]
            assert ranked == want[qid], (name, q, label)


def test_batch_paths_randomized_corpus(spark, tmp_path_factory):
    """Seeded random corpus (uneven lengths, empty docs, sparse huge ids,
    1-4-term queries incl. duplicates and absent terms): both batch paths ==
    python oracle for a 20-query batch."""
    import random

    from hybrid_sanctions_search_engine_spark.operators.bm25 import batch_topk
    from hybrid_sanctions_search_engine_spark.plans.wand import batch_topk_indexed

    rng = random.Random(1234)
    vocab = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr", "st"]
    docs_list = []
    for i in range(60):
        # sparse ids exercise chunking; +10**9 keeps ids collision-free
        doc_id = i + 10**9 if i % 7 == 0 else i
        n_tok = rng.choice([0, 1, 3, 8, 40, 200])
        docs_list.append(
            (doc_id, " ".join(rng.choice(vocab) for _ in range(n_tok)))
        )
    queries = []
    for qid in range(20):
        n = rng.randint(1, 4)
        ts = [rng.choice(vocab + ["zz"]) for _ in range(n)]  # zz never occurs
        if qid % 5 == 0 and ts:
            ts.append(ts[0])  # duplicate term in the query string
        queries.append((qid, " ".join(ts)))

    docs = spark.createDataFrame(docs_list, "doc_id long, text string")
    index_dir = str(tmp_path_factory.mktemp("advb_rand"))
    build_index(docs, index_dir, n_shards=4, chunk_bits=5)
    want = _python_batch(docs_list, queries, k=7)

    for label, res in (
        ("doc-side", batch_topk(docs, queries, k=7)),
        ("indexed", batch_topk_indexed(spark, index_dir, queries, k=7)),
    ):
        got: dict[int, list] = {qid: [] for qid, _ in queries}
        for r in res.collect():
            got[r["query_id"]].append((r["rank"], r["doc_id"], round(r["score"], 9)))
        for qid, q in queries:
            ranked = [(d, s) for _, d, s in sorted(got[qid])]
            assert ranked == want[qid], (q, label)


def test_batch_scorer_block_split_identical(spark, sf_smoke_dir):
    """The memory-adaptive query-column blocking inside the batch scorer is
    value-IDENTICAL to the single-block shape: running the scorer with a
    1 KiB accumulator target (block width 1 at any realistic group size)
    matches the 64 MiB default bit-for-bit on a 600-query batch, and the
    public batch_topk path is deterministic across invocations."""
    import os as _os

    import pandas as pd
    from pyspark.sql import functions as F

    import hybrid_sanctions_search_engine_spark.operators.bm25 as bm
    from hybrid_sanctions_search_engine_spark.operators.postings import (
        build_postings,
        corpus_stats,
    )

    docs = spark.read.parquet(_os.path.join(sf_smoke_dir, "documents.parquet"))
    vocab = ["spark", "query", "join", "window", "table", "scan", "merge",
             "sort", "hash", "agg"]
    queries = [
        (i, f"{vocab[i % 10]} {vocab[(i * 3 + 1) % 10]}") for i in range(600)
    ]

    postings = build_postings(docs, positions=False)
    stats = corpus_stats(docs)
    terms = sorted({t for _, q in queries for t in q.split()})
    matched = postings.where(F.col("term").isin(terms))
    tdf = matched.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    flat = matched.join(F.broadcast(tdf), "term").select(
        "term", "doc_id", "tf", "doc_len", "df"
    ).toPandas()
    qid_list = [q for q, _ in queries]
    qidx = {q: i for i, q in enumerate(qid_list)}
    term_to_qidx: dict = {}
    for qid, q in queries:
        for t in dict.fromkeys(q.split()):
            term_to_qidx.setdefault(t, []).append((qidx[qid], 1.0))

    one_block = bm.make_batch_group_scorer(
        term_to_qidx, qid_list, stats.n_docs, stats.avgdl, 1.2, 0.75, 5
    )((0,), flat)
    # a 1 KiB accumulator target forces width-1 column blocks through the
    # otherwise-identical code
    many_blocks = bm.make_batch_group_scorer(
        term_to_qidx, qid_list, stats.n_docs, stats.avgdl, 1.2, 0.75, 5,
        target_acc_bytes=1024,
    )((0,), flat)
    a = one_block.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    b = many_blocks.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    def run():
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 12))
            for r in bm.batch_topk(docs, queries, k=5).collect()
        )

    assert run() == run()
