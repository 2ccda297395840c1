"""Deduplication operators for large-scale text pipelines.

Beyond the reference's per-query dedup (J5/SO2), these are the corpus-scale
dedup primitives a 100 TB training-data pipeline needs:

  * exact duplicates — hash-groupBy on md5(text) (one map-side-combined
    shuffle; the hash is 16 bytes/doc, never the text).
  * MinHash + LSH — shingle → K minhashes → band buckets → candidate pairs →
    exact Jaccard verification.  Signatures are computed with *nested array
    lambdas* (``F.transform`` over a literal seed array), so the K hashes per
    doc cost zero extra rows and no Python; only band buckets shuffle.
  * SimHash — 64-bit fingerprints via bit-majority of token hashes (Arrow
    pandas UDF over numpy bit ops), near-dups = small Hamming distance found
    through band buckets.
  * n-gram Jaccard — exact pairwise verification used by both candidate
    generators; also exposed blocked for oracle-checkable tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..functions.tokenize import spark_index_tokens


def _round4(col):
    """Driver-contract rounding: floor(x*1e4+0.5)/1e4 — pure IEEE double ops,
    bit-identical between Spark and the DuckDB oracles (never engine round())."""
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


# shared parallelism guard (operators.postings) — one copy, two call sites
from .postings import widen_narrow_scan as _widen_narrow_scan


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicate_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (text_md5, n_dups, doc_ids) for texts appearing more than once."""
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .where(F.col("n_dups") > 1)
    )


def distinct_by_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the lowest-doc_id representative of each exact-duplicate group."""
    from .fusion import dedup_keep_best

    with_hash = docs.withColumn("text_md5", F.md5(F.col(text_col))).withColumn(
        "_neg_id", -F.col("doc_id")
    )
    return dedup_keep_best(with_hash, key="text_md5", score_col="_neg_id").drop(
        "text_md5", "_neg_id"
    )


# ---------------------------------------------------------------------------
# shingles + exact Jaccard
# ---------------------------------------------------------------------------

def shingle_col(text_col, n: int = 3):
    """Word n-gram shingles of the index-tokenized text (array<string>)."""
    toks = spark_index_tokens(text_col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        )
    )


def jaccard_pairs_blocked(
    docs: DataFrame,
    threshold: float = 0.5,
    max_doc_id: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Exact token-set Jaccard over all pairs within a block (doc_id <
    max_doc_id).  Quadratic — the oracle/verification path; LSH below is the
    scale path."""
    toks = F.array_distinct(spark_index_tokens(F.col(text_col)))
    base = docs.select("doc_id", toks.alias("tokset"))
    if max_doc_id is not None:
        base = base.where(F.col("doc_id") < max_doc_id)
    a = base.select(F.col("doc_id").alias("id_a"), F.col("tokset").alias("set_a"))
    b = base.select(F.col("doc_id").alias("id_b"), F.col("tokset").alias("set_b"))
    inter = F.size(F.array_intersect(F.col("set_a"), F.col("set_b")))
    union = F.size(F.array_union(F.col("set_a"), F.col("set_b")))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", _round4(F.col("jaccard")).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE31 = np.uint64((1 << 31) - 1)


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = 64,
    shingle_n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, sig array<long>[n_hashes]).

    Universal-hashing MinHash in one vectorized Arrow UDF with ZERO
    per-shingle (and near-zero per-token) Python:

      1. tokenize per doc, flatten the batch's tokens, ``pd.factorize`` them
         and FNV-1a-hash only the *unique* tokens (vocabulary ≪ token count);
      2. shingle hashes are rolling n-token windows over the flat token-hash
         array — XOR of odd-constant-multiplied neighbors — computed with n
         shifted numpy views over a zero-padded buffer (padding makes doc
         tails/short docs fall out of the same formula, since a zero hash is
         XOR-neutral);
      3. sig[i] = min over the doc's windows of (a_i·h + b_i) mod (2^31−1),
         one flat pass + ``minimum.reduceat`` per seed (O(total_windows)
         memory, not O(windows × seeds)).

    (First implementation used nested JVM array lambdas — Spark evaluates
    higher-order functions on the interpreted path and re-inlines the shingle
    expression into every seed lambda: 229 s for 5k docs.  Second built
    per-shingle Python strings + a per-character FNV loop: 18 s of the 51 s
    round-1 bench.  This one: all numpy.)
    """
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType

    @pandas_udf(ArrayType(LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        empty = [int(_MERSENNE31)] * n_hashes
        sigs: list = [empty] * len(texts)
        doc_rows, sig_mat = _minhash_sig_mat(texts, n_hashes, shingle_n)
        for j, row in enumerate(doc_rows):
            sigs[row] = sig_mat[j].tolist()
        return pd.Series(sigs)

    docs = _widen_narrow_scan(docs)
    return docs.select("doc_id", sig_udf(F.col(text_col)).alias("sig"))


def _minhash_sig_mat(
    texts: pd.Series, n_hashes: int, shingle_n: int
) -> tuple[list[int], np.ndarray]:
    """Batch MinHash core → (row indices of non-empty docs, int64 matrix
    [n_nonempty × n_hashes]).  All numpy; see ``minhash_signatures``."""
    rng = np.random.default_rng(42)
    a = rng.integers(1, int(_MERSENNE31), size=n_hashes).astype(np.uint64)
    bvec = rng.integers(0, int(_MERSENNE31), size=n_hashes).astype(np.uint64)
    # odd multipliers decorrelating the n window positions (splitmix64-style)
    pos_mult = np.array(
        [0x9E3779B97F4A7C15 * (2 * k + 1) & 0xFFFFFFFFFFFFFFFF for k in range(shingle_n)],
        dtype=np.uint64,
    )
    flat_toks: list[str] = []
    doc_rows: list[int] = []
    doc_lens: list[int] = []
    for row, text in enumerate(texts.fillna("")):
        toks = _simple_tokens(text)
        if not toks:
            continue
        doc_rows.append(row)
        doc_lens.append(len(toks))
        flat_toks.extend(toks)
    if not flat_toks:
        return [], np.empty((0, n_hashes), dtype=np.int64)
    codes, uniques = pd.factorize(np.asarray(flat_toks, dtype=object))
    th = _fnv1a_batch(list(uniques))[codes]
    lens = np.asarray(doc_lens, dtype=np.int64)
    total = th.size
    pad = shingle_n - 1
    # scatter each doc's hashes into a buffer with `pad` zeros between docs
    tgt = np.arange(total, dtype=np.int64) + np.repeat(
        np.arange(len(lens), dtype=np.int64) * pad, lens
    )
    th_pad = np.zeros(total + pad * len(lens), dtype=np.uint64)
    th_pad[tgt] = th
    w = th_pad.size - pad
    sh = th_pad[:w] * pos_mult[0]
    for k in range(1, shingle_n):
        sh = sh ^ (th_pad[k : k + w] * pos_mult[k])
    # every token position is a valid window start (trailing windows XOR
    # in padding zeros = partial suffix shingles); max(tgt) == w-1 since
    # the buffer ends with the last doc's own padding
    sh = sh[tgt]
    h31 = (sh ^ (sh >> np.uint64(31))) & _MERSENNE31
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    sig_mat = np.empty((len(lens), n_hashes), dtype=np.int64)
    for i in range(n_hashes):
        m = (h31 * a[i] + bvec[i]) % _MERSENNE31
        sig_mat[:, i] = np.minimum.reduceat(m, starts).astype(np.int64)
    return doc_rows, sig_mat


def minhash_band_buckets(
    docs: DataFrame,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, band, bucket): LSH band buckets computed *inside* the
    signature UDF (an FNV fold over each band's signature rows, vectorized
    across the batch) — the earlier JVM banding used interpreted higher-order
    functions that re-inlined the slice per band (the CLAUDE.md HOF trap)."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType

    rows_per_band = n_hashes // bands

    @pandas_udf(ArrayType(LongType()))
    def bucket_udf(texts: pd.Series) -> pd.Series:
        out: list = [None] * len(texts)
        doc_rows, sig_mat = _minhash_sig_mat(texts, n_hashes, shingle_n)
        if doc_rows:
            u = sig_mat.astype(np.uint64)
            buckets = np.empty((len(doc_rows), bands), dtype=np.int64)
            for bnd in range(bands):
                h = np.full(len(doc_rows), _FNV_OFFSET, dtype=np.uint64)
                for r in range(rows_per_band):
                    h = (h ^ u[:, bnd * rows_per_band + r]) * _FNV_PRIME
                buckets[:, bnd] = h.astype(np.int64)
            for j, row in enumerate(doc_rows):
                out[row] = buckets[j].tolist()
        return pd.Series(out)

    docs = _widen_narrow_scan(docs)
    return (
        docs.select("doc_id", bucket_udf(F.col(text_col)).alias("buckets"))
        .where(F.col("buckets").isNotNull())
        .select("doc_id", F.posexplode("buckets").alias("band", "bucket"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs: band-bucket candidates, then exact shingle
    Jaccard ≥ threshold verification. → (id_a, id_b, jaccard).

    Dataflow (the 100 TB shape): one UDF scan emits (doc_id, band, bucket) —
    24 bytes × bands per doc, never the text — which self-joins on (band,
    bucket) so only same-bucket collisions shuffle.  The banded frame is
    persisted because a self-join otherwise evaluates the signature UDF
    twice; the candidate pairs are NOT separately materialized — both their
    consumers (the semi-join pruning of the verify scan and the verify
    join) recompute the cheap join+distinct from the cached banded frame,
    so the whole pipeline runs as ONE job instead of three sequential
    materializations (round 7; each job paid its scheduling floor).  The
    trade: the O(docs×bands) banded cache lives until the verify completes
    rather than being released after candidate generation — spillable
    storage, 24 bytes × bands per doc.  The verified result is
    materialized (persist+count) so banded releases before returning; the
    returned frame holds only the above-threshold pairs; callers that
    invoke this in a loop should ``unpersist()`` it when done."""
    docs = _widen_narrow_scan(docs)
    banded = minhash_band_buckets(docs, n_hashes, bands, shingle_n, text_col).persist()
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b")
        )
        .distinct()
    )
    # compute shingles only for docs that appear in candidate pairs — the
    # shingle expression is an interpreted HOF, so prune before evaluating it
    cand_ids = cand.select(F.col("id_a").alias("doc_id")).unionByName(
        cand.select(F.col("id_b").alias("doc_id"))
    ).distinct()
    shingles = (
        # no broadcast hint: at web scale the candidate set can approach
        # corpus size (dup-heavy crawls) — AQE picks broadcast when it's small
        docs.join(cand_ids, "doc_id", "left_semi")
        .select(
            "doc_id",
            F.array_distinct(shingle_col(F.col(text_col), shingle_n)).alias("sh"),
        )
    )
    verified = (
        cand.join(shingles.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(shingles.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", _round4(F.col("jaccard")).alias("jaccard"))
        .persist()
    )
    verified.count()
    banded.unpersist()
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, simhash long): 64-bit bit-majority of token xxhash64-style
    hashes, weighted by term frequency — vectorized numpy inside an Arrow
    pandas UDF (`mapInPandas` would also work; the UDF keeps the plan
    columnar)."""
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        # flatten all docs' tokens, hash once with the vectorized FNV-1a, then
        # per-bit vote tallies via reduceat (64 flat passes — O(total_tokens)
        # memory instead of an O(tokens × 64) bit matrix)
        flat: list[str] = []
        doc_rows: list[int] = []
        doc_starts: list[int] = []
        doc_lens: list[int] = []
        for row, text in enumerate(texts.fillna("")):
            toks = _simple_tokens(text)
            if not toks:
                continue
            doc_rows.append(row)
            doc_starts.append(len(flat))
            doc_lens.append(len(toks))
            flat.extend(toks)
        if flat:
            codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
            hashes = _fnv1a_batch(list(uniques))[codes]
            starts = np.asarray(doc_starts, dtype=np.int64)
            n_toks = np.asarray(doc_lens, dtype=np.int64)
            fp = np.zeros(len(doc_rows), dtype=np.uint64)
            for bit in range(64):
                ones = ((hashes >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
                pos = np.add.reduceat(ones, starts)
                # votes = ones - zeros = 2*pos - n_tokens
                fp |= ((2 * pos > n_toks).astype(np.uint64)) << np.uint64(bit)
            out[np.asarray(doc_rows)] = fp.astype(np.int64)
        return pd.Series(out)

    docs = _widen_narrow_scan(docs)
    return docs.select("doc_id", simhash_udf(F.col(text_col)).alias("simhash"))


def _simple_tokens(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _hash64(token: str) -> int:
    """Deterministic 64-bit FNV-1a (stable across processes, unlike hash()).
    Scalar reference implementation — the hot paths use ``_fnv1a_batch``,
    which is asserted byte-identical to this in tests."""
    h = 0xCBF29CE484222325
    for ch in token.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _fnv1a_batch(strings: list[str]) -> np.ndarray:
    """Vectorized FNV-1a over many strings at once → uint64[len(strings)].

    Column-at-a-time over a single flat UTF-8 buffer: iteration j updates the
    hash lane of every string with ≥ j+1 bytes (h = (h ^ byte) * prime, uint64
    wraparound is numpy's native unsigned semantics).  Python cost is
    O(max_len) numpy calls per batch instead of O(total_bytes) interpreted
    loop steps — this was the round-1 bench hotspot (18 s of the 51 s suite)."""
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    encoded = [s.encode("utf-8") for s in strings]
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=n)
    flat = np.frombuffer(b"".join(encoded), dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    active = np.arange(n)
    for j in range(int(lens.max(initial=0))):
        active = active[lens[active] > j]
        chunk = flat[starts[active] + j].astype(np.uint64)
        h[active] = (h[active] ^ chunk) * _FNV_PRIME
    return h


def simhash_near_dup_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via 4×16-bit band
    buckets (any pair within Hamming ≤ 3 shares at least one exact band)."""
    # persist the fingerprints: the band self-join otherwise evaluates the
    # simhash UDF scan twice (once per join side) — same eager-release
    # pattern as minhash_lsh_pairs (materialize the small result, then
    # unpersist the O(docs) intermediate; the returned frame holds only
    # the near-dup pairs)
    fps = simhash_fingerprints(docs, text_col).persist()
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), b * 16)
            .bitwiseAND(F.lit(0xFFFF))
            .alias("bucket"),
        )
        for b in range(4)
    ]
    banded = fps.select(
        "doc_id", "simhash", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", "simhash", "bb.band", "bb.bucket")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
            F.col("x.simhash").alias("sh_a"),
            F.col("y.simhash").alias("sh_b"),
        )
        .distinct()
    )
    out = (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .persist()
    )
    out.count()
    fps.unpersist()
    return out
