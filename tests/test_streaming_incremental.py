"""Streaming delta postings + overlay search + compaction."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hybrid_sanctions_search_engine_spark.sources.index_io import build_index, load_index
from hybrid_sanctions_search_engine_spark.streaming.incremental import (
    compact_delta,
    load_delta_postings,
    search_with_delta,
    start_delta_stream,
)

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    d = {
        "input": str(root / "input"),
        "delta": str(root / "delta"),
        "ckpt": str(root / "ckpt"),
        "index": str(root / "index"),
    }
    os.makedirs(d["input"], exist_ok=True)
    return d


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_streaming_overlay_and_compaction(spark, sf_smoke_dir, dirs):
    base_docs = spark.read.parquet(os.path.join(sf_smoke_dir, "documents.parquet"))
    build_index(base_docs, dirs["index"], n_shards=4, chunk_bits=7)

    # stream in two new docs containing a marker term absent from the corpus
    _write_docs(
        spark,
        dirs["input"],
        [(100001, "zyzzyva spark query wonders", "en", "stream", 27)],
    )
    q = start_delta_stream(spark, dirs["input"], dirs["delta"], dirs["ckpt"], SCHEMA)
    q.awaitTermination(120)

    delta = load_delta_postings(spark, dirs["delta"])
    assert delta is not None
    assert delta.where(F.col("term") == "zyzzyva").count() == 1

    # second batch: exactly-once — first file must not be reprocessed
    _write_docs(
        spark,
        dirs["input"],
        [(100002, "zyzzyva again in another streamed doc", "en", "stream", 36)],
    )
    q2 = start_delta_stream(spark, dirs["input"], dirs["delta"], dirs["ckpt"], SCHEMA)
    q2.awaitTermination(120)
    delta = load_delta_postings(spark, dirs["delta"])
    assert delta.where(F.col("term") == "zyzzyva").count() == 2

    # overlay search finds streamed docs without rebuilding the base index
    res = search_with_delta(spark, dirs["index"], delta, "zyzzyva", k=5)
    ids = [r["doc_id"] for r in res.collect()]
    assert set(ids) == {100001, 100002}

    # base-only terms still served by base
    res2 = search_with_delta(spark, dirs["index"], delta, "window", k=5)
    assert res2.count() == 5

    # compaction folds delta into the base index (only touched shards rebuild)
    delta_docs = spark.read.parquet(dirs["input"])
    report = compact_delta(
        spark, base_docs, delta_docs, dirs["index"], dirs["delta"]
    )
    assert report["shards_compacted"]
    assert set(report["shards_built"]) == set(report["shards_compacted"])

    idx, meta = load_index(spark, dirs["index"])
    from hybrid_sanctions_search_engine_spark.plans.wand import topk_search

    res3 = topk_search(spark, dirs["index"], "zyzzyva", k=5, index_df=idx, meta=meta)
    assert {r["doc_id"] for r in res3.collect()} == {100001, 100002}
