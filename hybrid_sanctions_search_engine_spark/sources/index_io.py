"""Sharded compressed inverted-index build with resumable per-shard manifests.

The Spark-native replacement for the reference's pattern-generation →
Elasticsearch ``_bulk`` deployment dataflow
(``/root/reference/scripts/deploy_to_elasticsearch.py:261-331``): instead of a
single ES node ingesting NDJSON batches, the index IS a partitioned parquet
dataset built by one Spark job:

    documents ──tokenize/posexplode──▶ [shuffle 1] postings(term, doc_id,
        tf, doc_len)  ──shard = pmod(xxhash64(term), n_shards)──▶
        [shuffle 2] ──applyInPandas per shard──▶ per-(term, chunk) rows:
              doc-id gaps (LEB128 varint), tf varints, float64 BM25
              contributions (df/idf computed in-encoder — a term's postings
              are co-located by construction), optional position streams,
              128-posting block-max array
        ──▶ index_dir/shard=NNNN/data.parquet + _manifest.json

Design properties (north rule):
  * **Two shuffles, zero joins, zero caching.** The postings aggregation
    hashes by (term, doc_id) with map-side combine; the shard stage moves
    each posting once more to its final shard; corpus stats come from a
    scan-only aggregate.
  * **Skew.** Hot (Zipf-head) terms are bounded by the (term, chunk) row
    granularity: a term's postings are split into doc-id-range chunks
    (``doc_id >> chunk_bits``), so no single row or reducer holds an unbounded
    list; AQE additionally splits skewed shuffle partitions.
  * **Resumable.** Each shard directory gets an atomic ``_manifest.json``
    (docs, postings, bytes, elapsed — the lineage/metrics record). Re-running
    the build skips shards whose manifest is complete; killing the job midway
    loses only in-flight shards. Verified in tests/test_index_io.py.
  * **Queryable with pruning.** ``shard=NNNN`` is a partition column, so a
    query for terms T prunes to the |T| shards by directory, then to matching
    row-groups by the parquet min/max stats on ``term`` (rows are written
    term-sorted).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.codec import delta_encode, varint_encode
from ..operators.postings import CorpusStats, build_postings

BLOCK_SIZE = 128


@dataclass(frozen=True)
class IndexMeta:
    n_docs: int
    avgdl: float
    n_shards: int
    chunk_bits: int
    block_size: int
    k1: float
    b: float
    has_positions: bool = False

    @staticmethod
    def load(index_dir: str) -> "IndexMeta":
        with open(os.path.join(index_dir, "_index_meta.json")) as fh:
            return IndexMeta(**json.load(fh))


SHARD_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("term", StringType()),
        StructField("chunk", LongType()),
        StructField("df", LongType()),
        StructField("n_docs", IntegerType()),
        StructField("doc_gaps", BinaryType()),
        StructField("tfs", BinaryType()),
        StructField("scores", BinaryType()),
        StructField("positions", BinaryType()),  # varint position-deltas, segmented by tf
        StructField("block_max", ArrayType(DoubleType())),
    ]
)

SUMMARY_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("terms", LongType()),
        StructField("postings", LongType()),
        StructField("bytes", LongType()),
        StructField("elapsed_sec", DoubleType()),
    ]
)


def _manifest_path(index_dir: str, shard: int) -> str:
    return os.path.join(index_dir, f"shard={shard}", "_manifest.json")


def completed_shards(index_dir: str, n_shards: int) -> list[int]:
    done = []
    for s in range(n_shards):
        p = _manifest_path(index_dir, s)
        try:
            with open(p) as fh:
                if json.load(fh).get("status") == "complete":
                    done.append(s)
        except (OSError, json.JSONDecodeError):
            continue
    return done


def _encode_shard(index_dir: str, n_docs: int, avgdl: float, k1: float, b: float, store_positions: bool, salted: bool = False):
    """Factory for the per-shard applyInPandas encoder.

    Receives raw (term, chunk, doc_id, tf, doc_len) postings for one shard;
    computes df (all of a term's postings are co-located here — that is the
    point of hash-sharding by term) and the exact per-posting BM25
    contribution in vectorized numpy, mirroring the JVM Column arithmetic of
    ``operators.bm25`` term for term (same expression tree, so scores match
    the DataFrame plan bitwise up to 1-ulp in ln)."""

    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        shard = int(key[0])
        salt = int(key[1]) if salted else None
        t0 = time.monotonic()
        pdf = pdf.sort_values(["term", "chunk", "doc_id"], kind="mergesort")
        if salted:
            # a salted sub-group sees only part of a term's postings, so df
            # arrives precomputed (one global agg) instead of derived here
            df_all = pdf["df"]
        else:
            df_all = pdf.groupby("term", sort=False)["doc_id"].transform("size")
        df_np = df_all.to_numpy(dtype=np.float64)
        tf_np = pdf["tf"].to_numpy(dtype=np.float64)
        dl_np = pdf["doc_len"].to_numpy(dtype=np.float64)
        idf = np.log(1.0 + (float(n_docs) - df_np + 0.5) / (df_np + 0.5))
        score_all = idf * (tf_np * (k1 + 1.0)) / (
            tf_np + k1 * (1.0 - b + b * dl_np / float(avgdl))
        )
        pdf = pdf.assign(score=score_all, df=df_all.astype(np.int64))
        rows = []
        n_postings = 0
        for (term, chunk), grp in pdf.groupby(["term", "chunk"], sort=True):
            ids = grp["doc_id"].to_numpy(dtype=np.int64)
            tfs = grp["tf"].to_numpy(dtype=np.uint64)
            scores = grp["score"].to_numpy(dtype=np.float64)
            n = ids.size
            n_postings += n
            pos_blob = None
            if store_positions:
                # per-posting position lists -> within-doc deltas -> one
                # varint stream; tf values segment it on decode
                flat = []
                for plist in grp["positions"]:
                    arr = np.asarray(plist, dtype=np.int64)
                    d = np.empty(arr.size, dtype=np.uint64)
                    if arr.size:
                        d[0] = np.uint64(arr[0])
                        d[1:] = np.diff(arr).astype(np.uint64)
                    flat.append(d)
                pos_blob = varint_encode(
                    np.concatenate(flat) if flat else np.empty(0, dtype=np.uint64)
                )
            pad = (-n) % BLOCK_SIZE
            padded = (
                np.concatenate([scores, np.full(pad, -np.inf)]) if pad else scores
            )
            block_max = padded.reshape(-1, BLOCK_SIZE).max(axis=1)
            rows.append(
                (
                    shard,
                    term,
                    int(chunk),
                    int(grp["df"].iloc[0]),
                    int(n),
                    delta_encode(ids),
                    varint_encode(tfs),
                    scores.tobytes(),
                    pos_blob,
                    block_max.tolist(),
                )
            )
        out = pd.DataFrame(
            rows,
            columns=[f.name for f in SHARD_SCHEMA.fields],
        )
        shard_dir = os.path.join(index_dir, f"shard={shard}")
        os.makedirs(shard_dir, exist_ok=True)
        suffix = "" if salt is None else f"-{salt}"
        data_path = os.path.join(shard_dir, f"data{suffix}.parquet")
        # `shard` comes back as the partition-directory column on read
        arrow_schema = pa.schema(
            [
                ("term", pa.string()),
                ("chunk", pa.int64()),
                ("df", pa.int64()),
                ("n_docs", pa.int32()),
                ("doc_gaps", pa.binary()),
                ("tfs", pa.binary()),
                ("scores", pa.binary()),
                ("positions", pa.binary()),
                ("block_max", pa.list_(pa.float64())),
            ]
        )
        table = pa.Table.from_pandas(
            out.drop(columns=["shard"]), schema=arrow_schema, preserve_index=False
        )
        pq.write_table(table, data_path, compression="zstd")
        nbytes = os.path.getsize(data_path)
        elapsed = time.monotonic() - t0
        manifest = {
            "status": "complete",
            "shard": shard,
            "salt": salt,
            "terms": int(out["term"].nunique()),
            "chunks": int(len(out)),
            "docs": int(pdf["doc_id"].nunique()),
            "postings": int(n_postings),
            "bytes": int(nbytes),
            "elapsed_sec": round(elapsed, 4),
        }
        mpath = (
            _manifest_path(index_dir, shard)
            if salt is None
            else os.path.join(shard_dir, f"_manifest{suffix}.json")
        )
        tmp = mpath + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, mpath)  # atomic commit
        return pd.DataFrame(
            [
                (
                    shard,
                    manifest["terms"],
                    manifest["postings"],
                    manifest["bytes"],
                    manifest["elapsed_sec"],
                )
            ],
            columns=[f.name for f in SUMMARY_SCHEMA.fields],
        )

    return encode


def build_index(
    docs: DataFrame,
    index_dir: str,
    n_shards: int = 8,
    chunk_bits: int = 16,
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    resume: bool = True,
    store_positions: bool = False,
    sub_splits: int = 1,
) -> dict:
    """Build (or resume) the compressed index; returns the build report.

    ``store_positions=True`` adds varint-packed within-doc position deltas to
    every (term, chunk) row (≈2-3× index size) and enables phrase queries
    over the compressed index (``plans.wand.phrase_search``) — the Lucene
    IndexOptions DOCS_AND_FREQS vs ..._AND_POSITIONS distinction.

    ``sub_splits > 1`` is the explicit hot-shard salting path: each shard's
    encode work splits into ``sub_splits`` tasks salted by chunk range
    (``pmod(chunk, sub_splits)``), bounding the largest encode task when the
    Zipf head concentrates in one shard; document frequencies are then
    precomputed by one global aggregate (a term's postings no longer all
    co-locate in a single task), sub-tasks write ``data-<salt>.parquet`` +
    ``_manifest-<salt>.json``, and the driver merges the sub-manifests
    tree-wise into the per-shard ``_manifest.json``."""
    os.makedirs(index_dir, exist_ok=True)
    t0 = time.monotonic()

    # Parallelism guard: a narrow input (single parquet file, in-memory
    # relation) would run the tokenize scan on one core.  At production scale
    # the Iceberg scan has thousands of splits and this is a no-op.
    default_par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < default_par:
        docs = docs.repartition(default_par)

    # TWO shuffles, ZERO joins, ZERO caching:
    #   shuffle 1: explode → groupBy(term, doc_id) postings (doc_len carried)
    #   shuffle 2: repartition by shard for the encode stage
    # Corpus stats come from a scan-only tokenize aggregate (no distinct, no
    # shuffle; n_docs counts ALL docs incl. empty ones — consistent with
    # ``operators.postings.corpus_stats`` and the DuckDB oracle); document
    # frequency + BM25 contributions are computed *inside* the per-shard
    # encoder, where every term's postings are already co-located.
    from ..operators.postings import tokenized_documents

    n_docs = docs.count()
    total_tokens = (
        tokenized_documents(docs, text_col).agg(F.sum("doc_len")).collect()[0][0] or 0
    )
    stats = CorpusStats(n_docs=n_docs, avgdl=float(total_tokens) / max(n_docs, 1))
    postings = build_postings(docs, text_col, positions=store_positions)
    sharded = (
        postings.withColumn(
            "shard", F.pmod(F.xxhash64("term"), F.lit(n_shards)).cast("int")
        )
        .withColumn("chunk", F.shiftright("doc_id", chunk_bits).cast("long"))
        .select(
            "shard", "term", "chunk", "doc_id", "tf", "doc_len",
            *(["positions"] if store_positions else []),
        )
    )

    skipped: list[int] = []
    if resume:
        skipped = completed_shards(index_dir, n_shards)
        if skipped:
            sharded = sharded.where(~F.col("shard").isin(skipped))
    # clear partial output of incomplete shards (stale sub-files from a
    # previous differently-configured or interrupted run)
    import shutil as _shutil

    for s in range(n_shards):
        if s not in skipped:
            _shutil.rmtree(os.path.join(index_dir, f"shard={s}"), ignore_errors=True)

    # Explicit repartition by the encode key: one task per shard (or per
    # shard-salt sub-split), hash distribution already satisfied -> no second
    # shuffle; AQE cannot coalesce the small test-scale groups below count.
    if sub_splits > 1:
        tdf = postings.groupBy("term").agg(F.count("*").cast("long").alias("df"))
        salted = (
            sharded.join(tdf, "term")
            .withColumn("salt", F.pmod(F.col("chunk"), F.lit(sub_splits)).cast("int"))
        )
        summary = (
            salted.repartition(n_shards * sub_splits, "shard", "salt")
            .groupBy("shard", "salt")
            .applyInPandas(
                _encode_shard(
                    index_dir, stats.n_docs, stats.avgdl, k1, b, store_positions,
                    salted=True,
                ),
                SUMMARY_SCHEMA,
            )
            .collect()
        )
        # tree-wise merge: leaf sub-manifests -> per-shard manifest
        from collections import defaultdict

        per_shard: dict[int, list] = defaultdict(list)
        for r in summary:
            per_shard[r["shard"]].append(r)
        for s, rows_ in per_shard.items():
            subs = []
            for salt in range(sub_splits):
                mp = os.path.join(index_dir, f"shard={s}", f"_manifest-{salt}.json")
                if os.path.exists(mp):
                    with open(mp) as fh:
                        subs.append(json.load(fh))
            merged = {
                "status": "complete",
                "shard": s,
                "sub_splits": sub_splits,
                "terms": int(sum(m["terms"] for m in subs)),
                "chunks": int(sum(m["chunks"] for m in subs)),
                "docs": int(sum(m["docs"] for m in subs)),
                "postings": int(sum(m["postings"] for m in subs)),
                "bytes": int(sum(m["bytes"] for m in subs)),
                "elapsed_sec": round(max(m["elapsed_sec"] for m in subs), 4),
                "sub_manifests": subs,
            }
            tmp = _manifest_path(index_dir, s) + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(merged, fh)
            os.replace(tmp, _manifest_path(index_dir, s))
        summary = [
            type(summary[0])(
                shard=s,
                terms=sum(r["terms"] for r in rows_),
                postings=sum(r["postings"] for r in rows_),
                bytes=sum(r["bytes"] for r in rows_),
                elapsed_sec=max(r["elapsed_sec"] for r in rows_),
            )
            for s, rows_ in per_shard.items()
        ]
    else:
        summary = (
            sharded.repartition(n_shards, "shard")
            .groupBy("shard")
            .applyInPandas(
                _encode_shard(index_dir, stats.n_docs, stats.avgdl, k1, b, store_positions),
                SUMMARY_SCHEMA,
            )
            .collect()
        )

    meta = IndexMeta(
        n_docs=stats.n_docs,
        avgdl=stats.avgdl,
        n_shards=n_shards,
        chunk_bits=chunk_bits,
        block_size=BLOCK_SIZE,
        k1=k1,
        b=b,
        has_positions=store_positions,
    )
    with open(os.path.join(index_dir, "_index_meta.json"), "w") as fh:
        json.dump(asdict(meta), fh)

    built = [r.asDict() for r in summary]
    report = {
        "n_docs": stats.n_docs,
        "avgdl": stats.avgdl,
        "shards_built": sorted(r["shard"] for r in built),
        "shards_skipped": skipped,
        "postings": int(sum(r["postings"] for r in built)),
        "bytes": int(sum(r["bytes"] for r in built)),
        "elapsed_sec": round(time.monotonic() - t0, 3),
    }
    report["docs_per_sec"] = (
        round(stats.n_docs / report["elapsed_sec"], 1) if report["elapsed_sec"] else None
    )
    return report


def load_index(spark: SparkSession, index_dir: str) -> tuple[DataFrame, IndexMeta]:
    """Read the shard dataset (partition column ``shard``) + metadata."""
    meta = IndexMeta.load(index_dir)
    df = spark.read.schema(SHARD_SCHEMA).parquet(index_dir)
    return df, meta
