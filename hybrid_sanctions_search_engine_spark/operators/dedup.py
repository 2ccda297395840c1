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

    Universal-hashing MinHash in one vectorized Arrow UDF: one FNV-1a base
    hash per shingle folded to 31 bits, then sig[i] = min over shingles of
    (a_i·h + b_i) mod (2^31−1) — a single uint64 numpy (shingles × seeds)
    matrix op per row, no overflow, no explode, no shuffle.

    (First implementation used nested JVM array lambdas — Spark evaluates
    higher-order functions on the interpreted path and re-inlines the shingle
    expression into every seed lambda: 229 s for 5k docs. This UDF: <1 s.)
    """
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType

    rng = np.random.default_rng(42)
    a = rng.integers(1, int(_MERSENNE31), size=n_hashes).astype(np.uint64)
    bvec = rng.integers(0, int(_MERSENNE31), size=n_hashes).astype(np.uint64)

    @pandas_udf(ArrayType(LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        empty = [int(_MERSENNE31)] * n_hashes
        out = []
        for text in texts.fillna(""):
            toks = _simple_tokens(text)
            if len(toks) < shingle_n:
                shingles = [" ".join(toks)] if toks else []
            else:
                shingles = list(
                    {
                        " ".join(toks[i : i + shingle_n])
                        for i in range(len(toks) - shingle_n + 1)
                    }
                )
            if not shingles:
                out.append(empty)
                continue
            base = np.array([_hash64(sh) for sh in shingles], dtype=np.uint64)
            h31 = (base ^ (base >> np.uint64(31))) & _MERSENNE31
            # (shingles × seeds) matrix: a*h < 2^62 fits uint64
            m = (h31[:, None] * a[None, :] + bvec[None, :]) % _MERSENNE31
            out.append(m.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    return docs.select("doc_id", sig_udf(F.col(text_col)).alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs: band-bucket candidates, then exact shingle
    Jaccard ≥ threshold verification. → (id_a, id_b, jaccard)."""
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(docs, n_hashes, shingle_n, text_col)
    band_ids = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                band_ids,
                lambda bnd: F.struct(
                    bnd.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(
                                    F.col("sig"), bnd * rows_per_band + 1, rows_per_band
                                ),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
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
    )
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
        for row, text in enumerate(texts.fillna("")):
            toks = [t for t in _simple_tokens(text)]
            if not toks:
                continue
            hashes = np.array(
                [_hash64(t) for t in toks], dtype=np.uint64
            )
            bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                np.int64
            )
            votes = (2 * bits - 1).sum(axis=0)
            fp = np.uint64(0)
            for i in np.nonzero(votes > 0)[0]:
                fp |= np.uint64(1) << np.uint64(i)
            out[row] = np.int64(fp.astype(np.int64))
        return pd.Series(out)

    return docs.select("doc_id", simhash_udf(F.col(text_col)).alias("simhash"))


def _simple_tokens(text: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _hash64(token: str) -> int:
    """Deterministic 64-bit FNV-1a (stable across processes, unlike hash())."""
    h = 0xCBF29CE484222325
    for ch in token.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_near_dup_pairs(
    docs: DataFrame, max_hamming: int = 3, text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via 4×16-bit band
    buckets (any pair within Hamming ≤ 3 shares at least one exact band)."""
    fps = simhash_fingerprints(docs, text_col)
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
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
