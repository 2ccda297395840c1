"""Bit-parity of the pure-Python XXH64 with Spark's xxhash64."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hybrid_sanctions_search_engine_spark.functions.xxhash import xxhash64_string


def test_parity_fixed(spark):
    words = [
        "", "a", "spark", "иванов", "x" * 7, "y" * 8, "z" * 31, "w" * 32,
        "м" * 40, "mixed ünïcode ёж 123", "​", "0" * 100,
    ]
    df = spark.createDataFrame([(w,) for w in words], "t string").select(
        "t", F.xxhash64("t").alias("h")
    )
    jvm = {r["t"]: r["h"] for r in df.collect()}
    for w in words:
        assert jvm[w] == xxhash64_string(w), w


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=100))
def test_parity_fuzz_collected(s):
    # pure-python self-consistency (JVM fuzz covered by the fixed cases above;
    # a Spark job per hypothesis example would be too slow)
    assert isinstance(xxhash64_string(s), int)
    assert xxhash64_string(s) == xxhash64_string(s)


def test_shard_routing_matches_build(spark, sf_smoke_dir, tmp_path_factory):
    import os

    from hybrid_sanctions_search_engine_spark.functions.xxhash import shard_of_term
    from hybrid_sanctions_search_engine_spark.sources.index_io import build_index, load_index

    docs = spark.read.parquet(os.path.join(sf_smoke_dir, "documents.parquet"))
    d = str(tmp_path_factory.mktemp("xx_idx"))
    build_index(docs, d, n_shards=4, chunk_bits=7)
    idx, meta = load_index(spark, d)
    rows = idx.select("shard", "term").limit(200).collect()
    for r in rows:
        assert shard_of_term(r["term"], 4) == r["shard"]
