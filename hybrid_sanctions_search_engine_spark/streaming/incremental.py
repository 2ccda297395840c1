"""Incremental index maintenance: streaming delta postings + overlay queries.

The reference serves updates through an overlay index that is unioned with the
active one at query time and atomically swapped after a rebuild
(``/root/reference/src/ai_service/layers/embeddings/indexing/
watchlist_index_service.py:64-222, 387-456``).  The Spark-native equivalent:

  * new documents arrive as files in a directory → a Structured Streaming
    query tokenizes them (same JVM expressions as the batch build) and appends
    postings to a **delta postings table** (parquet, partitioned by shard)
    under exactly-once file-sink semantics (checkpointed).
  * queries run against base index ∪ delta: base via the compressed WAND
    path, delta via the DataFrame BM25 plan, merged keep-best per doc
    (SO4 semantics — each side scored under its own corpus stats, exactly
    like the reference overlay).
  * ``compact_delta`` folds the delta into the main index by rebuilding only
    the shards the delta touches (tree-wise merge of sorted posting runs) and
    then truncating the delta — the reference's atomic swap.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.fusion import dedup_keep_best
from ..operators.postings import build_postings
from ..plans.wand import topk_search
from ..sources.index_io import IndexMeta


def start_delta_stream(
    spark: SparkSession,
    input_dir: str,
    delta_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string, lang string, source string, n_chars long",
    text_col: str = "text",
):
    """File-source streaming job: new parquet files of documents → delta
    postings (term, doc_id, tf, doc_len). Stateless (no watermark needed —
    postings are append-only facts); exactly-once via the checkpointed file
    sink."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    from ..operators.postings import tokenized_documents

    toks = tokenized_documents(stream, text_col)
    exploded = toks.select("doc_id", "doc_len", F.explode("tokens").alias("term"))
    # per-microbatch tf aggregation happens in foreachBatch (stateless global
    # agg is not allowed in append mode; per-batch is exact because a doc's
    # tokens always arrive within one file/batch)
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        postings = batch_df.groupBy("term", "doc_id", "doc_len").agg(
            F.count("*").cast("int").alias("tf")
        )
        postings.write.mode("append").parquet(delta_dir)

    return (
        exploded.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def load_delta_postings(spark: SparkSession, delta_dir: str) -> DataFrame | None:
    try:
        return spark.read.parquet(delta_dir)
    except Exception:
        return None


def delta_bm25_topk(
    delta_postings: DataFrame, query: str, k: int = 10, k1: float = 1.2, b: float = 0.75
) -> DataFrame:
    """BM25 top-k directly over streamed delta postings
    (term, doc_id, doc_len, tf) — stats derived from the delta itself."""
    from ..plans.wand import query_terms

    terms = query_terms(query)
    docs_dl = delta_postings.select("doc_id", "doc_len").distinct()
    row = docs_dl.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 1.0)
    matched = delta_postings.where(F.col("term").isin(terms))
    tdf = matched.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    scored = (
        matched.join(F.broadcast(tdf), "term")
        .withColumn(
            "term_score",
            F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("doc_len") / F.lit(avgdl))),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("term_score").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def search_with_delta(
    spark: SparkSession,
    index_dir: str,
    delta_postings: DataFrame | None,
    query: str,
    k: int = 10,
    index_df: DataFrame | None = None,
    meta: IndexMeta | None = None,
) -> DataFrame:
    """Overlay query: base compressed index ∪ delta postings, keep-best per
    doc (reference overlay semantics: each side scored under its own stats)."""
    base = topk_search(
        spark, index_dir, query, k=k, index_df=index_df, meta=meta
    ).select("doc_id", "score")
    if delta_postings is None or delta_postings.isEmpty():
        return base.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    delta = delta_bm25_topk(delta_postings, query, k=k).select("doc_id", "score")
    merged = dedup_keep_best(base.unionByName(delta))
    return merged.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def compact_delta(
    spark: SparkSession,
    docs_base: DataFrame,
    delta_docs: DataFrame,
    index_dir: str,
    delta_dir: str,
    n_shards: int | None = None,
) -> dict:
    """Fold delta documents into the base index: rebuild only the shards the
    delta's terms hash into (manifest invalidation → resumable rebuild), then
    drop the delta.  The merge is tree-wise: the rebuilt shard re-sorts the
    union of base + delta posting runs for just those shards."""
    from ..sources.index_io import build_index, completed_shards

    meta = IndexMeta.load(index_dir)
    n_shards = n_shards or meta.n_shards
    touched = (
        build_postings(delta_docs, positions=False)
        .select(F.pmod(F.xxhash64("term"), F.lit(n_shards)).cast("int").alias("shard"))
        .distinct()
        .collect()
    )
    touched_ids = sorted(r["shard"] for r in touched)
    from ..sources.fs import fs_for

    fs = fs_for(index_dir)
    for s in touched_ids:
        fs.delete(os.path.join(index_dir, f"shard={s}", "_manifest.json"))
    all_docs = docs_base.unionByName(delta_docs, allowMissingColumns=True)
    report = build_index(
        all_docs,
        index_dir,
        n_shards=n_shards,
        chunk_bits=meta.chunk_bits,
        k1=meta.k1,
        b=meta.b,
        resume=True,
    )
    shutil.rmtree(delta_dir, ignore_errors=True)
    report["shards_compacted"] = touched_ids
    return report
