"""Sharded compressed inverted-index build with resumable per-shard manifests.

The Spark-native replacement for the reference's pattern-generation →
Elasticsearch ``_bulk`` deployment dataflow
(``/root/reference/scripts/deploy_to_elasticsearch.py:261-331``): instead of a
single ES node ingesting NDJSON batches, the index IS a partitioned parquet
dataset built by one Spark job:

    documents ──tokenize(+Observation: n_docs, Σdoc_len)/posexplode──▶
        [shuffle 1] postings(term, doc_id, tf, doc_len)
        ──shard = pmod(xxhash64(term), n_shards)──▶
        [shuffle 2] ──applyInPandas per shard──▶ per-(term, chunk) rows:
              doc-id gaps (LEB128 varint), tf varints, doc_len varints,
              df (computed in-encoder — a term's postings are co-located by
              construction), optional position streams, per-128-posting
              (max_tf, min_dl) block aggregates
        ──▶ index_dir/shard=NNNN/data.parquet + _manifest.json

    BM25 contributions are computed at QUERY time from IndexMeta
    (``plans.wand``): shards carry no corpus statistics, so incremental
    compaction can rebuild only delta-touched shards without leaving the
    untouched ones scored under stale n_docs/avgdl.

Design properties (north rule):
  * **One corpus pass, two shuffles, zero joins, zero caching.** The
    postings aggregation hashes by (term, doc_id) with map-side combine; the
    shard stage moves each posting once more to its final shard; corpus
    stats ride the same pass via an Observation on the tokenized node.
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

from ..functions.codec import varint_encode_grouped
from ..operators.postings import CorpusStats
from .fs import LocalIndexFS, fs_for

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
    # exact corpus token count: lets merge-compaction update avgdl EXACTLY
    # ((total+delta)/(n+new)) instead of reconstructing from the float avgdl
    total_tokens: int = 0
    # fingerprint of the last delta folded by merge_compact — makes the fold
    # idempotent even if a caller re-runs after full success
    last_delta_fp: str = ""
    # basenames of delta FILES whose postings are folded into the shards but
    # may not be deleted yet (crash window between the meta commit and the
    # compact job's file deletion).  Committed atomically WITH the stats in
    # the same _index_meta.json write, so a rerun that sees new stream
    # arrivals alongside the old files can exclude the already-folded ones
    # instead of double-folding them (per-file idempotency; the snapshot
    # fingerprint above only protects an IDENTICAL delta).
    folded_delta_files: list | None = None

    @staticmethod
    def load(index_dir: str) -> "IndexMeta":
        fs = fs_for(index_dir)
        return IndexMeta(**fs.read_json(os.path.join(index_dir, "_index_meta.json")))


SHARD_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("term", StringType()),
        StructField("chunk", LongType()),
        StructField("df", LongType()),
        StructField("n_docs", IntegerType()),
        StructField("doc_gaps", BinaryType()),
        StructField("tfs", BinaryType()),
        StructField("doc_lens", BinaryType()),  # varint doc_len per posting
        StructField("positions", BinaryType()),  # varint position-deltas, segmented by tf
        # per-128-posting block aggregates: BM25 contribution is monotone
        # ↑tf ↓dl, so f(max_tf, min_dl) upper-bounds every posting in the
        # block; idf/avgdl are applied at QUERY time from IndexMeta, so
        # stored shards carry no corpus statistics (see build_index)
        StructField("block_max_tf", ArrayType(IntegerType())),
        StructField("block_min_dl", ArrayType(IntegerType())),
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


def completed_shards(index_dir: str, n_shards: int, fs=None) -> list[int]:
    fs = fs or fs_for(index_dir)
    done = []
    for s in range(n_shards):
        p = _manifest_path(index_dir, s)
        try:
            if fs.read_json(p).get("status") == "complete":
                done.append(s)
        except (OSError, json.JSONDecodeError):
            continue
    return done


def _encode_shard(
    index_dir: str, store_positions: bool, salted: bool = False, fs=None,
    raw: bool = False,
):
    """Factory for the per-shard applyInPandas encoder.

    Receives raw (term, chunk, doc_id, tf, doc_len) postings for one shard;
    computes df (all of a term's postings are co-located here — that is the
    point of hash-sharding by term) and stores the raw tf + doc_len streams.
    BM25 contributions are computed at QUERY time (``plans.wand``) from
    IndexMeta — shards are corpus-statistics-free, so a delta compaction
    that changes global n_docs/avgdl never leaves untouched shards scored
    under stale stats (df per term is safe: a term's df only changes when
    the delta contains that term, and then its shard is rebuilt).

    All writes route through the pluggable ``fs`` (sources/fs.py): POSIX
    rename-commit locally, rename-free single-PUT commit on object stores —
    the executor no longer assumes ``index_dir`` is a shared POSIX path."""
    fs = fs or LocalIndexFS()

    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        salt = int(key[1]) if salted else None
        t0 = time.monotonic()
        out, n_postings, n_docs_seen = _encode_posting_frame(
            pdf, shard, store_positions, df_precomputed=salted, raw=raw
        )
        return _write_shard(
            out, shard, salt, n_docs_seen, n_postings, index_dir, fs, t0
        )

    return encode


def _aggregate_raw_rows(
    pdf: pd.DataFrame, store_positions: bool
) -> tuple:
    """RAW exploded token rows (term, chunk, doc_id, doc_len[, pos]) →
    per-posting arrays (term_codes, uniq_terms, chunk, doc_id, tf,
    doc_len, df, flat_positions|None) in the exact (term asc, chunk asc,
    doc asc[, pos asc]) order the aggregated path produces.

    This is the shuffle-remover's worker half: the index build no longer
    pre-aggregates (term, doc_id) → tf in a separate JVM exchange — raw
    tokens move ONCE to their shard and collapse to postings here with a
    numpy lexsort + run-length pass (guide §1.2/§2.4: the (term, doc_id)
    aggregation and the shard exchange were keyed compatibly, so one
    exchange can serve both).  A term's rows still all co-locate in the
    shard, so df stays derivable locally."""
    codes, uniqs = pd.factorize(pdf["term"])
    uniq_arr = np.asarray(uniqs, dtype=object)
    order_u = np.argsort(uniq_arr)  # lexicographic term order
    rank_of = np.empty(len(uniq_arr), dtype=np.int64)
    rank_of[order_u] = np.arange(len(uniq_arr))
    rank = rank_of[codes]
    ids0 = pdf["doc_id"].to_numpy(dtype=np.int64)
    dls0 = pdf["doc_len"].to_numpy(dtype=np.int64)
    chunk0 = pdf["chunk"].to_numpy(dtype=np.int64)
    if store_positions:
        pos0 = pdf["pos"].to_numpy(dtype=np.int64)
        order = np.lexsort((pos0, ids0, rank))
        flat_pos = pos0[order]
    else:
        order = np.lexsort((ids0, rank))
        flat_pos = None
    rank_s = rank[order]
    ids_s = ids0[order]
    # posting boundaries: (term, doc) change — chunk is doc-derived, so it
    # never splits a (term, doc) run
    newpost = np.empty(ids_s.size, dtype=bool)
    newpost[0] = True
    newpost[1:] = (rank_s[1:] != rank_s[:-1]) | (ids_s[1:] != ids_s[:-1])
    p_starts = np.flatnonzero(newpost)
    tf = np.diff(np.append(p_starts, ids_s.size)).astype(np.uint64)
    rank_p = rank_s[p_starts]
    ids_p = ids_s[p_starts]
    chunk_p = chunk0[order][p_starts]
    dls_p = dls0[order][p_starts].astype(np.uint64)
    # df per term = its posting count (one posting per distinct doc)
    counts_by_rank = np.bincount(rank_p, minlength=len(uniq_arr))
    dfv = counts_by_rank[rank_p].astype(np.int64)
    return (
        rank_p, uniq_arr[order_u], chunk_p, ids_p, tf, dls_p, dfv, flat_pos
    )


def _prepare_aggregated_rows(
    pdf: pd.DataFrame, store_positions: bool, df_precomputed: bool
) -> tuple:
    """Pre-aggregated postings (term, chunk, doc_id, tf, doc_len
    [, positions][, df]) → the same per-posting array tuple as
    ``_aggregate_raw_rows`` (the original encoder input shape, kept for the
    salted build path and the merge compactor)."""
    pdf = pdf.sort_values(["term", "chunk", "doc_id"], kind="mergesort")
    if df_precomputed:
        # a salted sub-group sees only part of a term's postings, so df
        # arrives precomputed (one global agg) instead of derived here
        df_all = pdf["df"]
    else:
        df_all = pdf.groupby("term", sort=False)["doc_id"].transform("size")
    term_codes, uniq_terms = pd.factorize(pdf["term"])  # sorted input
    tfs = pdf["tf"].to_numpy(dtype=np.uint64)
    flat_pos = None
    if store_positions:
        from itertools import chain

        flat_pos = np.fromiter(
            chain.from_iterable(pdf["positions"]), dtype=np.int64,
            count=int(tfs.sum()),
        )
    return (
        term_codes,
        np.asarray(uniq_terms, dtype=object),
        pdf["chunk"].to_numpy(dtype=np.int64),
        pdf["doc_id"].to_numpy(dtype=np.int64),
        tfs,
        pdf["doc_len"].to_numpy(dtype=np.uint64),
        df_all.to_numpy(dtype=np.int64),
        flat_pos,
    )


def _encode_posting_frame(
    pdf: pd.DataFrame, shard: int, store_positions: bool,
    df_precomputed: bool = False, raw: bool = False,
) -> tuple[pd.DataFrame, int, int]:
    """Postings → (SHARD_SCHEMA pandas frame, n_postings, distinct docs
    seen).  ``raw=True`` takes un-aggregated exploded token rows (the
    one-shuffle build pipeline); otherwise pre-aggregated postings.

    Fully vectorized group encode: ZERO per-group pandas iteration (a groupby
    loop here cost ~0.4 ms/group of pure overhead — 240k (term, chunk) groups
    made it the dominant build cost)."""
    if raw:
        (term_codes, uniq_terms, chunk_np, ids, tfs, dls, dfv,
         flat_pos) = _aggregate_raw_rows(pdf, store_positions)
    else:
        (term_codes, uniq_terms, chunk_np, ids, tfs, dls, dfv,
         flat_pos) = _prepare_aggregated_rows(
            pdf, store_positions, df_precomputed
        )
    n_postings = ids.size
    n_docs_seen = int(np.unique(ids).size)
    if n_postings == 0:
        out = pd.DataFrame(
            {f.name: [] for f in SHARD_SCHEMA.fields},
            columns=[f.name for f in SHARD_SCHEMA.fields],
        )
        return out, 0, 0
    newgrp = np.empty(n_postings, dtype=bool)
    newgrp[0] = True
    newgrp[1:] = (term_codes[1:] != term_codes[:-1]) | (chunk_np[1:] != chunk_np[:-1])
    starts = np.flatnonzero(newgrp)
    ends = np.append(starts[1:], n_postings)
    counts = (ends - starts).astype(np.int64)
    # doc-id gaps: absolute at each group start, diffs within
    gaps = np.empty(n_postings, dtype=np.uint64)
    gaps[1:] = (ids[1:] - ids[:-1]).astype(np.uint64)
    gaps[starts] = ids[starts].astype(np.uint64)
    gap_blobs = varint_encode_grouped(gaps, starts, ends)
    tf_blobs = varint_encode_grouped(tfs, starts, ends)
    dl_blobs = varint_encode_grouped(dls, starts, ends)
    # per-128-posting block aggregates via one reduceat (block starts of
    # every group tile [0, n) contiguously in order)
    blocks_per_grp = (counts + BLOCK_SIZE - 1) // BLOCK_SIZE
    block_offsets = np.concatenate(([0], np.cumsum(blocks_per_grp)))
    within = np.arange(int(block_offsets[-1]), dtype=np.int64) - np.repeat(
        block_offsets[:-1], blocks_per_grp
    )
    block_starts = np.repeat(starts, blocks_per_grp) + within * BLOCK_SIZE
    bmax_tf = np.maximum.reduceat(tfs, block_starts).astype(np.int32)
    bmin_dl = np.minimum.reduceat(dls, block_starts).astype(np.int32)
    pos_blobs: list = [None] * len(starts)
    if store_positions:
        # delta within each posting (absolute at posting starts); one
        # grouped varint pass over the flat position stream
        pos_ends = np.cumsum(tfs.astype(np.int64))
        pos_starts = np.concatenate(([0], pos_ends[:-1]))
        pdeltas = np.empty(flat_pos.size, dtype=np.uint64)
        if flat_pos.size:
            pdeltas[1:] = (flat_pos[1:] - flat_pos[:-1]).astype(np.uint64)
            pdeltas[pos_starts] = flat_pos[pos_starts].astype(np.uint64)
        pos_blobs = varint_encode_grouped(
            pdeltas, pos_starts[starts], pos_ends[ends - 1]
        )
    out = pd.DataFrame(
        {
            "shard": np.full(len(starts), shard, dtype=np.int32),
            "term": uniq_terms[term_codes[starts]],
            "chunk": chunk_np[starts],
            "df": dfv[starts],
            "n_docs": counts.astype(np.int32),
            "doc_gaps": gap_blobs,
            "tfs": tf_blobs,
            "doc_lens": dl_blobs,
            "positions": pos_blobs,
            "block_max_tf": [
                bmax_tf[a:b].tolist()
                for a, b in zip(block_offsets[:-1].tolist(), block_offsets[1:].tolist())
            ],
            "block_min_dl": [
                bmin_dl[a:b].tolist()
                for a, b in zip(block_offsets[:-1].tolist(), block_offsets[1:].tolist())
            ],
        },
        columns=[f.name for f in SHARD_SCHEMA.fields],
    )
    return out, int(n_postings), n_docs_seen


def _write_shard(
    out: pd.DataFrame,
    shard: int,
    salt: int | None,
    n_docs_seen: int,
    n_postings: int,
    index_dir: str,
    fs,
    t0: float,
    filename: str | None = None,
    commit_manifest: bool = True,
) -> pd.DataFrame:
    """Write one shard's parquet + commit its manifest; → SUMMARY_SCHEMA row.

    ``filename`` overrides the data file name (dot-prefixed names are
    invisible to parquet readers — the merge compactor writes there and
    swaps atomically afterwards); ``commit_manifest=False`` defers the
    manifest commit to the caller (returned via the json column)."""
    import pyarrow as pa

    shard_dir = os.path.join(index_dir, f"shard={shard}")
    fs.makedirs(shard_dir)
    suffix = "" if salt is None else f"-{salt}"
    data_path = os.path.join(shard_dir, filename or f"data{suffix}.parquet")
    # `shard` comes back as the partition-directory column on read
    arrow_schema = pa.schema(
        [
            ("term", pa.string()),
            ("chunk", pa.int64()),
            ("df", pa.int64()),
            ("n_docs", pa.int32()),
            ("doc_gaps", pa.binary()),
            ("tfs", pa.binary()),
            ("doc_lens", pa.binary()),
            ("positions", pa.binary()),
            ("block_max_tf", pa.list_(pa.int32())),
            ("block_min_dl", pa.list_(pa.int32())),
        ]
    )
    table = pa.Table.from_pandas(
        out.drop(columns=["shard"]), schema=arrow_schema, preserve_index=False
    )
    fs.write_parquet(table, data_path, compression="zstd")
    nbytes = fs.getsize(data_path)
    elapsed = time.monotonic() - t0
    manifest = {
        "status": "complete",
        "shard": shard,
        "salt": salt,
        "terms": int(out["term"].nunique()),
        "chunks": int(len(out)),
        "docs": n_docs_seen,
        "postings": n_postings,
        "bytes": int(nbytes),
        "elapsed_sec": round(elapsed, 4),
    }
    if commit_manifest:
        mpath = (
            _manifest_path(index_dir, shard)
            if salt is None
            else os.path.join(shard_dir, f"_manifest{suffix}.json")
        )
        fs.commit_json(mpath, manifest)  # atomic commit (rename or single PUT)
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
    return pd.DataFrame({"shard": [shard], "manifest_json": [json.dumps(manifest)]})


def decode_shard_rows(pdf: pd.DataFrame, include_df: bool = False) -> pd.DataFrame:
    """Inverse of ``_encode_posting_frame`` (positions excluded) → raw
    postings (term, doc_id, tf, doc_len[, df]).  Used by the merge compactor
    (re-encode a shard without re-tokenizing any document) and the indexed
    batch server (score straight off the stored streams)."""
    from ..functions.codec import varint_decode

    has_df = include_df and "df" in pdf.columns
    if len(pdf) == 0:
        cols = {"term": [], "doc_id": [], "tf": [], "doc_len": []}
        if include_df:
            cols["df"] = []
        return pd.DataFrame(cols).astype(
            {"doc_id": np.int64, "tf": np.int64, "doc_len": np.int64,
             **({"df": np.int64} if include_df else {})}
        )
    # ZERO per-row iteration (the loop version paid one python iteration +
    # three decoder calls per (term, chunk) row): each blob column joins
    # into ONE buffer and decodes in a single vectorized pass; the stored
    # ``n_docs`` column gives the per-row value counts, so doc ids come
    # back via a segmented cumsum over the concatenated gap stream (each
    # row's first gap is the absolute id — the same pattern the phrase
    # chunk scorer uses for position streams).
    counts = pdf["n_docs"].to_numpy(dtype=np.int64)
    gaps = varint_decode(b"".join(pdf["doc_gaps"])).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    c = np.cumsum(gaps)
    seg_base = np.where(starts > 0, c[starts - 1], 0)
    ids = c - np.repeat(seg_base, counts)
    out = {
        "term": np.repeat(pdf["term"].to_numpy(dtype=object), counts),
        "doc_id": ids,
        "tf": varint_decode(b"".join(pdf["tfs"])).astype(np.int64),
        "doc_len": varint_decode(b"".join(pdf["doc_lens"])).astype(np.int64),
    }
    if has_df:
        out["df"] = np.repeat(pdf["df"].to_numpy(dtype=np.int64), counts)
    return pd.DataFrame(out)


def decode_shard_arrays(pdf: pd.DataFrame, include_df: bool = False) -> dict:
    """Numpy-native twin of ``decode_shard_rows`` for scoring hot paths →
    ``{"term_codes", "uniq_terms", "doc_id", "tf", "doc_len"[, "df"]}``.

    Same decoded values in the same row order, but terms stay as small
    integer codes (factorized over the ~rows-level term column, first-
    appearance order — identical to ``pd.unique`` over the repeated
    column) instead of an O(postings) repeated object array, and no
    intermediate pandas frame is built.  The 960k profile measured
    0.24 s/group for the pandas form vs ~0.05 s for this one — the object
    ``term`` column repeat + frame construction dominated, not the varint
    decode itself (guide §4.2: hand whole batches to vectorized native
    code, don't round-trip through row-oriented containers)."""
    from ..functions.codec import varint_decode

    if len(pdf) == 0:
        out = {
            "term_codes": np.empty(0, dtype=np.int64),
            "uniq_terms": np.empty(0, dtype=object),
            "doc_id": np.empty(0, dtype=np.int64),
            "tf": np.empty(0, dtype=np.int64),
            "doc_len": np.empty(0, dtype=np.int64),
        }
        if include_df:
            out["df"] = np.empty(0, dtype=np.int64)
        return out
    counts = pdf["n_docs"].to_numpy(dtype=np.int64)
    gaps = varint_decode(b"".join(pdf["doc_gaps"])).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    c = np.cumsum(gaps)
    seg_base = np.where(starts > 0, c[starts - 1], 0)
    ids = c - np.repeat(seg_base, counts)
    row_codes, uniq_terms = pd.factorize(pdf["term"])
    out = {
        "term_codes": np.repeat(row_codes.astype(np.int64), counts),
        "uniq_terms": np.asarray(uniq_terms, dtype=object),
        "doc_id": ids,
        "tf": varint_decode(b"".join(pdf["tfs"])).astype(np.int64),
        "doc_len": varint_decode(b"".join(pdf["doc_lens"])).astype(np.int64),
    }
    if include_df and "df" in pdf.columns:
        out["df"] = np.repeat(pdf["df"].to_numpy(dtype=np.int64), counts)
    return out


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
    fs = fs_for(index_dir)
    fs.makedirs(index_dir)
    t0 = time.monotonic()

    # Parallelism guard: a narrow input (single parquet file, in-memory
    # relation) would run the tokenize scan on one core (shared helper —
    # operators.postings.widen_narrow_scan).
    from ..operators.postings import widen_narrow_scan

    docs = widen_narrow_scan(docs)

    # ONE tokenize pass, TWO shuffles, ZERO joins, ZERO caching:
    #   shuffle 1: explode → groupBy(term, doc_id) postings (doc_len carried)
    #   shuffle 2: repartition by shard for the encode stage
    # (A one-shuffle variant — raw tokens straight to their shard, postings
    # aggregated inside the encoder via numpy lexsort — was measured at
    # 240k docs in round 7: 3.4 s vs 2.85 s warm for this pipeline.  The
    # JVM map-side combine plus a lighter Arrow transfer beat the saved
    # exchange; the encoder stays byte-compatible with both input shapes
    # should the trade flip at a different corpus shape.)
    # Corpus stats (n_docs incl. empty docs + Σdoc_len — consistent with
    # ``operators.postings.corpus_stats`` and the DuckDB oracle) ride the
    # SAME pass via an Observation on the pre-explode tokenized node, so at
    # 100 TB the dominant tokenize cost is paid exactly once.  Document
    # frequency is computed *inside* the per-shard encoder, where every
    # term's postings are already co-located; BM25 contributions are NOT
    # baked into the shards at all (query-time scoring from IndexMeta keeps
    # incremental compaction stat-consistent).
    from pyspark.sql import Observation

    from ..operators.postings import tokenized_documents

    obs = Observation("corpus_stats")
    toks = tokenized_documents(docs, text_col).observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("doc_len"), F.lit(0)).alias("total_tokens"),
    )
    exploded = toks.select(
        "doc_id", "doc_len", F.posexplode("tokens").alias("pos", "term")
    )
    agg = [F.count("*").cast("int").alias("tf"), F.max("doc_len").alias("doc_len")]
    if store_positions:
        agg.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    postings = exploded.groupBy("term", "doc_id").agg(*agg)
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
        skipped = completed_shards(index_dir, n_shards, fs)
        if skipped:
            sharded = sharded.where(~F.col("shard").isin(skipped))
    if len(skipped) == n_shards and fs.exists(
        os.path.join(index_dir, "_index_meta.json")
    ):
        # fully-resumed build: nothing to encode, keep the existing meta —
        # and skip the corpus pass entirely
        meta = IndexMeta.load(index_dir)
        return {
            "n_docs": meta.n_docs,
            "avgdl": meta.avgdl,
            "shards_built": [],
            "shards_skipped": skipped,
            "postings": 0,
            "bytes": 0,
            "elapsed_sec": round(time.monotonic() - t0, 3),
            "docs_per_sec": None,
        }
    # clear partial output of incomplete shards (stale sub-files from a
    # previous differently-configured or interrupted run)
    for s in range(n_shards):
        if s not in skipped:
            fs.rmtree(os.path.join(index_dir, f"shard={s}"))

    # Explicit repartition by the encode key: one task per shard (or per
    # shard-salt sub-split), hash distribution already satisfied -> no second
    # shuffle; AQE cannot coalesce the small test-scale groups below count.
    if sub_splits > 1:
        # A term's postings no longer co-locate in one encode task, so df is
        # computed over the POSTING frame with a window partitioned by term —
        # one extra narrow shuffle of (term, doc_id, tf, doc_len) rows, zero
        # re-tokenize, single lineage (round-2's version paid a second full
        # tokenize pass for the same number; the spy test now pins one
        # tokenize with sub_splits > 1 too).  One row per (term, doc_id) ⇒
        # count(*) over the term partition IS the document frequency.
        from pyspark.sql import Window

        salted = (
            sharded.withColumn(
                "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
            )
            .withColumn("salt", F.pmod(F.col("chunk"), F.lit(sub_splits)).cast("int"))
        )
        summary = (
            salted.repartition(n_shards * sub_splits, "shard", "salt")
            .groupBy("shard", "salt")
            .applyInPandas(
                _encode_shard(index_dir, store_positions, salted=True, fs=fs),
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
                if fs.exists(mp):
                    subs.append(fs.read_json(mp))
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
            fs.commit_json(_manifest_path(index_dir, s), merged)
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
                _encode_shard(index_dir, store_positions, fs=fs),
                SUMMARY_SCHEMA,
            )
            .collect()
        )

    # the encode action above is the build's ONLY pass over the corpus; the
    # observed metrics become the query-time scoring statistics
    observed = obs.get
    stats = CorpusStats(
        n_docs=int(observed["n_docs"]),
        avgdl=float(observed["total_tokens"]) / max(int(observed["n_docs"]), 1),
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
        total_tokens=int(observed["total_tokens"]),
    )
    fs.commit_json(os.path.join(index_dir, "_index_meta.json"), asdict(meta))

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
