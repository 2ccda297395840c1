"""Top-k BM25 over the compressed shard index with block-max pruning.

Query lifecycle (mirrors the reference's AC search stage — the posting-list
join inside Elasticsearch, ``elasticsearch_adapters.py:428-484`` — re-expressed
over our own index):

 1. tokenize the query; map terms → shard ids driver-side (same xxhash64 the
    build used) → the parquet scan prunes to |terms| shard directories and,
    via term-sorted row-group stats, to the matching rows only.
 2. compute per-(doc-id-range) chunk upper bounds from the stored block-max
    arrays — *metadata only*, no posting decode (JVM `array_max` + groupBy).
 3. score the most promising chunks first to establish the top-k threshold θ,
    then prune every remaining chunk whose upper bound < θ — exact: a pruned
    chunk cannot contain a doc scoring above θ.  This is block-max WAND
    pruning applied at chunk granularity (per-posting pivoting inside a chunk
    is unnecessary because chunk scoring is a vectorized numpy accumulation).
 4. surviving chunks are scored in parallel (`applyInPandas` per chunk:
    varint-decode gaps, sum float64 contributions with np.bincount, local
    top-k), then merged with a global TakeOrderedAndProject.

Rank-identity vs the uncompressed DataFrame BM25 plan is asserted in
tests/test_wand.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..functions.codec import delta_decode
from ..functions.tokenize import py_index_tokens
from ..operators.bm25 import group_partitioned
from ..sources.index_io import IndexMeta, load_index

RESULT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("score", DoubleType()),
        StructField("n_terms_matched", IntegerType()),
    ]
)


def _shard_of_terms(terms: list[str], n_shards: int) -> dict[str, int]:
    """Driver-side pmod(xxhash64(term), n_shards) — bit-compatible pure-Python
    XXH64 (tests/test_xxhash.py), so query routing costs zero Spark jobs."""
    from ..functions.xxhash import shard_of_term

    return {t: shard_of_term(t, n_shards) for t in terms}


def _score_chunks(
    k: int,
    meta: IndexMeta,
    term_weights: dict[str, float] | None = None,
    min_match: int = 1,
):
    """Per-chunk scorer: decodes tf + doc_len streams and computes the exact
    BM25 contribution from IndexMeta (idf from the stored per-term df) — the
    same float64 numpy expression the old in-encoder scoring used, so results
    stay bitwise identical to the DataFrame plan.

    ``min_match``: drop docs matching fewer than this many query terms
    BEFORE the local top-k (ES minimum_should_match, resolved by the
    caller).  Chunks partition the doc space and hold every query term's
    postings for their docs, so the per-chunk count is the doc's full
    count and the filter composes exactly with θ-pruning (the chunk upper
    bound still bounds every qualifying doc's score)."""
    from ..functions.codec import varint_decode

    k1, b = meta.k1, meta.b
    n_docs, avgdl = float(meta.n_docs), float(meta.avgdl)

    def score(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ids_parts = []
        score_parts = []
        for term, gaps, tfs_blob, dls_blob, df in zip(
            pdf["term"], pdf["doc_gaps"], pdf["tfs"], pdf["doc_lens"], pdf["df"]
        ):
            ids_parts.append(delta_decode(gaps))
            tf = varint_decode(tfs_blob).astype(np.float64)
            dl = varint_decode(dls_blob).astype(np.float64)
            idf = np.log(1.0 + (n_docs - float(df) + 0.5) / (float(df) + 0.5))
            contrib = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dl / avgdl)
            )
            if term_weights is not None:
                contrib = contrib * term_weights.get(term, 1.0)
            score_parts.append(contrib)
        ids = np.concatenate(ids_parts)
        contrib = np.concatenate(score_parts)
        uniq, inv = np.unique(ids, return_inverse=True)
        sums = np.bincount(inv, weights=contrib)
        counts = np.bincount(inv)
        if min_match > 1:
            qual = counts >= min_match
            uniq, sums, counts = uniq[qual], sums[qual], counts[qual]
        # exact per-chunk top-k under the global ordering (score desc, doc asc)
        order = np.lexsort((uniq, -sums))[:k]
        return pd.DataFrame(
            {
                "doc_id": uniq[order],
                "score": sums[order],
                "n_terms_matched": counts[order].astype(np.int32),
            }
        )

    return score


def query_terms(query: str) -> list[str]:
    return py_index_tokens(query)


def topk_search(
    spark: SparkSession,
    index_dir: str,
    query: str | list[str],
    k: int = 10,
    seed_chunks: int = 4,
    index_df: DataFrame | None = None,
    meta: IndexMeta | None = None,
    term_weights: dict[str, float] | None = None,
    max_driver_chunks: int = 4096,
    stats_out: dict | None = None,
    min_should_match: int | str = 1,
    one_shot_chunks: int = 64,
) -> DataFrame:
    """Exact top-k BM25 over the compressed index → (doc_id, score,
    n_terms_matched) ordered (score desc, doc_id asc).

    ``min_should_match``: ES semantics (``operators.bm25.
    es_min_should_match``) — applied inside the chunk scorers, so the k
    results all match at least the resolved number of query terms.

    ``max_driver_chunks`` caps how many chunk-UB rows the driver may hold
    (constant, corpus-independent); past the cap, pruning runs in-cluster.

    ``term_weights`` scales each term's stored contribution (the fuzzy
    stage's edit-ratio discounts); chunk upper bounds stay valid because
    weights are ≤ 1.

    ``stats_out``: pass a dict to receive pruning telemetry —
    ``chunks_total`` (candidate chunks), ``chunks_scored`` (seed +
    survivors actually decoded), ``theta`` (the k-th seed score used as
    the pruning threshold).  Drives the Zipf-corpus pruning-effectiveness
    bench (uniform corpora measure ~100% survival; see BENCH.md)."""
    if index_df is None or meta is None:
        index_df, meta = load_index(spark, index_dir)
    terms = query_terms(query) if isinstance(query, str) else list(query)
    if not terms:
        return spark.createDataFrame([], RESULT_SCHEMA)
    shard_of = _shard_of_terms(terms, meta.n_shards)
    shards = sorted(set(shard_of.values()))

    matched = index_df.where(
        F.col("shard").isin(shards) & F.col("term").isin(terms)
    )

    from ..operators.bm25 import es_min_should_match

    msm_n = es_min_should_match(min_should_match, len(dict.fromkeys(terms)))
    par = spark.sparkContext.defaultParallelism
    # metadata-only fast path: when the WHOLE index has at most
    # one_shot_chunks chunks (dense-id estimate from IndexMeta), every
    # query's candidate set fits the one-shot bound — skip the UB probe
    # job entirely and score all matched chunks in ONE job (exact: the
    # pruning-free upper bound; the probe + θ machinery only ever SKIPS
    # work).  Callers asking for pruning telemetry (stats_out) keep the
    # probing path.
    est_chunks = max(1, int(meta.n_docs) >> meta.chunk_bits)
    if stats_out is None and est_chunks <= max(seed_chunks * 2, one_shot_chunks):
        score_fn = _score_chunks(k, meta, term_weights, min_match=msm_n)
        return (
            group_partitioned(
                matched, F.col("chunk"), max(1, min(est_chunks, par * 2))
            )
            .groupBy("chunk")
            .applyInPandas(score_fn, RESULT_SCHEMA)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    # Chunk upper bounds from block metadata only (no binary decode), kept
    # IN THE CLUSTER: chunk count grows linearly with the corpus
    # (doc_id >> chunk_bits ⇒ ~15M chunks at 10^12 docs), so the driver only
    # ever collects a bounded head of the UB ranking — never the full frame.
    # UB per (term, chunk) = idf(df) · f(max over blocks tf, min over blocks
    # dl): BM25's tf-part is monotone ↑tf ↓dl, so this bounds every posting
    # (row-level max/min is a hair looser than per-block f but keeps the
    # whole expression in whole-stage codegen — array_max/array_min are
    # native functions; a zip_with lambda here runs interpreted per row).
    # The (1+1e-12) inflation absorbs JVM-vs-numpy 1-ulp log() differences
    # so the bound can never under-estimate a numpy-computed score.
    k1, b = meta.k1, meta.b
    n_docs_f, avgdl = float(meta.n_docs), float(meta.avgdl)
    idf = F.log(
        F.lit(1.0) + (F.lit(n_docs_f) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    max_tf = F.array_max("block_max_tf").cast("double")
    min_dl = F.array_min("block_min_dl").cast("double")
    tf_part = (max_tf * (k1 + 1.0)) / (
        max_tf + k1 * (1.0 - b + b * min_dl / avgdl)
    )
    term_ub = idf * tf_part * F.lit(1.0 + 1e-12)
    if term_weights is not None:
        # weights are ≤ 1 multipliers on a term's contribution; scale the
        # bound identically so pruning stays exact under weighted scoring
        wmap = F.create_map(
            *[F.lit(x) for kv in term_weights.items() for x in kv]
        )
        term_ub = term_ub * F.coalesce(wmap[F.col("term")], F.lit(1.0))
    ubs_df = (
        matched.select("chunk", term_ub.alias("term_ub"))
        .groupBy("chunk")
        .agg(F.sum("term_ub").alias("ub"))
    )
    # bounded probe: TakeOrderedAndProject of at most max_driver_chunks+1 UB
    # rows — a CONSTANT cap (~tens of KB), never O(corpus).  When the whole
    # UB ranking fits under the cap (every sandbox/moderate index), seeding
    # and θ-pruning run driver-side with zero extra Spark jobs; only beyond
    # the cap does the semi-join in-cluster path engage (10^12-doc regime,
    # ~15M chunks — the frame then never leaves the executors).
    probe = (
        ubs_df.orderBy(F.desc("ub"), F.asc("chunk"))
        .limit(max_driver_chunks + 1)
        .collect()
    )
    if not probe:
        return spark.createDataFrame([], RESULT_SCHEMA)

    # msm_n resolved above against the DISTINCT term count: n_terms_matched
    # tallies distinct terms, and ES counts each duplicate clause as
    # matched — a duplicate-token query resolved against the duplicate-
    # inclusive count over-filtered (possibly to empty) and diverged from
    # the batch paths
    score_fn = _score_chunks(k, meta, term_weights, min_match=msm_n)

    def run(chunks: list[int]) -> DataFrame:
        # explicit AQE-exempt partitioning: the decode+score work per chunk
        # is CPU-bound, so byte-based AQE coalescing must not serialize it
        # (operators.bm25.group_partitioned)
        return (
            group_partitioned(
                matched.where(F.col("chunk").isin(chunks)),
                F.col("chunk"),
                max(1, min(len(chunks), par * 2)),
            )
            .groupBy("chunk")
            .applyInPandas(score_fn, RESULT_SCHEMA)
        )

    # the probe saw the COMPLETE UB ranking iff it wasn't truncated at the
    # cap — only then may driver-side shortcuts assume full knowledge
    complete = len(probe) <= max_driver_chunks
    if complete and len(probe) <= max(seed_chunks * 2, one_shot_chunks):
        # small candidate set: two-phase pruning can't beat its own extra
        # job round-trips — decoding ≤ one_shot_chunks chunks in ONE job is
        # cheaper than seed-collect + θ-prune + survivor job even at 0%
        # survival (each job pays a scheduling floor; the sf0.1 index is 12
        # chunks and ran three sequential jobs per query).  Exactness is
        # untouched: scoring every candidate chunk is the pruning-free
        # upper bound.  Zipf-scale indexes (hundreds of chunks) keep the
        # two-phase θ path below.
        if stats_out is not None:
            stats_out.update(
                chunks_total=len(probe), chunks_scored=len(probe), theta=None
            )
        return (
            run([int(r["chunk"]) for r in probe])
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    seed = [int(r["chunk"]) for r in probe[:seed_chunks]]
    seed_res = run(seed).orderBy(F.desc("score"), F.asc("doc_id")).limit(k).collect()
    theta = seed_res[-1]["score"] if len(seed_res) >= k else float("-inf")

    # θ pruning: exact — a pruned chunk cannot contain a doc scoring above θ;
    # ties at θ are kept for the doc_id tiebreak.
    if complete:
        # complete UB ranking in hand: prune with a plain isin filter
        survivors = [
            int(r["chunk"])
            for r in probe[seed_chunks:]
            if float(r["ub"]) >= theta
        ]
        if stats_out is not None:
            stats_out.update(
                chunks_total=len(probe),
                chunks_scored=len(seed) + len(survivors),
                theta=theta if theta != float("-inf") else None,
            )
        rest = run(survivors) if survivors else None
    else:
        # truncated ranking: θ-prune as a DataFrame filter + semi-join so the
        # O(chunks) frame stays in the cluster
        if stats_out is not None:
            # counts stay in-cluster here by design; only θ is known
            stats_out.update(chunks_total=None, chunks_scored=None, theta=theta)
        survivor_chunks = ubs_df.where(
            (F.col("ub") >= theta) & ~F.col("chunk").isin(seed)
        ).select("chunk")
        rest = (
            group_partitioned(
                matched.join(survivor_chunks, "chunk", "left_semi"),
                F.col("chunk"),
                par * 2,
            )
            .groupBy("chunk")
            .applyInPandas(score_fn, RESULT_SCHEMA)
        )
    all_res = spark.createDataFrame(seed_res, RESULT_SCHEMA)
    if rest is not None:
        all_res = all_res.unionByName(rest)
    return all_res.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def batch_n_groups(spark: SparkSession, meta: IndexMeta) -> int:
    """The batched scorer's doc-group count — one formula shared by
    ``batch_topk_indexed`` and standing plans that pre-partition their
    cached index on ``pmod(chunk, n_groups)`` so the per-query-batch
    shuffle disappears (see ``HybridSearchPlan``)."""
    n_groups = max(32, spark.sparkContext.defaultParallelism * 2)
    # cap by the index's chunk count (dense-id estimate): pmod groups
    # beyond it are EMPTY partitions, and the explicit repartition
    # launches a task for each — pure overhead at small scale
    est_chunks = max(1, int(meta.n_docs) >> meta.chunk_bits)
    return max(8, min(n_groups, est_chunks))


def batch_topk_indexed(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    index_df: DataFrame | None = None,
    meta: IndexMeta | None = None,
    n_groups: int | None = None,
    query_terms_override: list[tuple[int, str, float]] | None = None,
    min_should_match: int | str = 1,
    pre_grouped: bool = False,
) -> DataFrame:
    """Many queries in ONE job over the COMPRESSED index (the serving shape
    ``operators.bm25.batch_topk`` provides over raw documents, minus its
    corpus re-tokenize): shard+term-pruned scan → per-chunk-group numpy
    scoring (one dense (local docs × queries) accumulator per task, local
    top-k per query) → global per-query window rank ≤ k.

    The round-2 shape (decode → broadcast (query, term) join → JVM
    per-(query, doc) hash aggregate) materialized ~|queries| × |corpus|
    aggregation groups — 215M joined rows / 92M groups / 62 s at 960k docs
    for a 100-query batch.  Scoring inside the Arrow task keeps the
    query×doc fan-out in numpy slice-adds and ships only n_groups × nq × k
    rows out (same 960k-doc batch: 73 s → ~4 s).  Chunks partition the doc
    space, so per-group top-k is exact.

    Scores use the same BM25 formula and stored df as the JVM path; sums run
    in a different float order (per-term numpy accumulation vs hash-agg
    arrival order), so equality with the document-side plan holds to ~1e-12
    relative, not bit-exactly.

    Memory note: the accumulator is dense in the query set (8 B × local docs
    × nq per task) — split query sets of many thousands into sub-batches.

    ``query_terms_override``: explicit (query_id, term, weight) triples
    instead of tokenizing ``queries`` — each term's BM25 contribution is
    multiplied by its weight (the batched fuzzy-expansion shape, where an
    expanded term contributes at its edit-ratio discount).  When BOTH
    ``queries`` and ``query_terms_override`` are given (the fused
    AC+fuzzy serving shape — one scan/decode pass instead of two jobs over
    the same postings), the two query-id spaces must be DISJOINT; each id
    is scored independently, so the fused result is row-identical to
    running the two jobs separately.

    ``min_should_match`` (ES semantics, resolved PER QUERY against its own
    distinct-term count) applies only to the tokenized ``queries`` — for
    ``query_terms_override`` ids the per-doc count tallies matched
    expansion VARIANTS, not original query terms, so a minimum over it
    would be meaningless: override-only calls reject the parameter, and
    fused calls apply it to the tokenized ids only (override ids keep
    minimum 1)."""
    from pyspark.sql import Window

    from ..sources.index_io import decode_shard_arrays

    if index_df is None or meta is None:
        index_df, meta = load_index(spark, index_dir)
    tok_triples = [
        (qid, t, 1.0)
        for qid, q in queries
        for t in dict.fromkeys(py_index_tokens(q))
    ]
    tok_qids = [qid for qid, _ in queries]
    if query_terms_override is not None:
        ovr = list(query_terms_override)
        ovr_qids = [
            q for q in dict.fromkeys(q for q, _, _ in ovr)
        ]
        if queries and set(ovr_qids) & set(tok_qids):
            raise ValueError(
                "fused batch: override query ids must be disjoint from "
                "tokenized query ids"
            )
        triples = tok_triples + ovr
        qid_list = tok_qids + ovr_qids
    else:
        triples = tok_triples
        qid_list = tok_qids
    out_schema = "query_id long, doc_id long, score double, rank int, n_terms_matched int"
    if not triples:
        return spark.createDataFrame([], out_schema)
    all_terms = sorted({t for _, t, _ in triples})
    qidx = {qid: i for i, qid in enumerate(qid_list)}
    term_to_qidx: dict[str, list[tuple[int, float]]] = {}
    for qid, t, wgt in triples:
        term_to_qidx.setdefault(t, []).append((qidx[qid], float(wgt)))
    shard_of = _shard_of_terms(all_terms, meta.n_shards)
    shards = sorted(set(shard_of.values()))
    matched = index_df.where(
        F.col("shard").isin(shards) & F.col("term").isin(all_terms)
    ).select("term", "chunk", "df", "n_docs", "doc_gaps", "tfs", "doc_lens")
    if n_groups is None:
        n_groups = batch_n_groups(spark, meta)

    from ..operators.bm25 import (
        BATCH_SCORE_SCHEMA,
        es_min_should_match,
        make_batch_group_scorer,
    )

    msm_arr = None
    if min_should_match != 1:
        if query_terms_override is not None and not queries:
            raise ValueError(
                "min_should_match cannot combine with query_terms_override"
            )
        n_terms_of = {
            qid: len(dict.fromkeys(py_index_tokens(q))) for qid, q in queries
        }
        # override (fuzzy-expansion) ids always keep minimum 1: their
        # per-doc counts tally matched VARIANTS, not query terms
        msm_arr = [
            es_min_should_match(min_should_match, n_terms_of[qid])
            if qid in n_terms_of
            else 1
            for qid in qid_list
        ]
    score_group = make_batch_group_scorer(
        term_to_qidx, qid_list, meta.n_docs, meta.avgdl, meta.k1, meta.b, k,
        flatten=lambda pdf: decode_shard_arrays(pdf, include_df=True),
        min_match_per_qidx=msm_arr,
    )
    grp_key = F.pmod(F.col("chunk"), F.lit(n_groups))
    # ``pre_grouped``: the caller's index_df is ALREADY hash-partitioned on
    # this exact group key (a standing plan caches it that way, with the
    # same batch_n_groups count) — the groupBy's ClusteredDistribution is
    # then satisfied by the cached layout and Catalyst plans NO exchange
    # (asserted in tests/test_wand.py), so the per-batch job skips the
    # shuffle write+read of the matched posting blobs entirely (guide
    # §2.4: two operations keyed the same way share one exchange; here the
    # exchange moved into the one-time cache materialization).
    src = matched if pre_grouped else group_partitioned(matched, grp_key, n_groups)
    local_topk = (
        src
        .groupBy(grp_key.alias("grp"))
        .applyInPandas(score_group, BATCH_SCORE_SCHEMA)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        local_topk.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank", "n_terms_matched")
    )


PHRASE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_occurrences", IntegerType()),
    ]
)


_PHRASE_POS_BITS = 40  # positions < 2^40 — far beyond any document length


def _phrase_chunk_scorer(
    ordered_terms: list[str], chunk_bits: int, slop: int = 0,
    ordered: bool = True, lucene: bool = False,
):
    """Per-chunk phrase matcher over decoded postings + position streams.

    Fully vectorized: each term's postings flatten to packed int64 keys
    ``(doc_id_within_chunk << 40) | (pos − term_offset)`` (within one chunk,
    local doc ids fit in ``chunk_bits`` bits), and a phrase occurrence is a
    key present for EVERY term — one ``np.intersect1d`` chain per chunk, no
    per-candidate-doc Python loop (round-3 verdict item 8; the loop version
    cost O(candidate docs) interpreter iterations per chunk).

    ``slop`` (anchored contract shared with ``operators.bm25.phrase_match``):
    term i may sit anywhere in ``[p+i, p+i+slop]`` — its keys are expanded
    to the ≤ slop+1 shifted copies before the intersect.  ``ordered=False``
    widens the window to the symmetric ``[p+i-slop, p+i+slop]`` (ES-style
    reordering; 2·slop+1 copies).  A shift that borrows below a document's
    position 0 produces a key no anchor can match (anchors are real
    positions), so no masking is needed.  ``lucene=True`` switches to the
    exact span-budget contract (operators/bm25.py::phrase_match docstring;
    anchors drawn from EVERY term's adjusted positions, bias-packed
    because adjusted positions can be negative)."""
    from ..functions.codec import varint_decode

    def match(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": [], "n_occurrences": []}).astype(
            {"doc_id": np.int64, "n_occurrences": np.int32}
        )
        chunk_base = int(key[0]) << chunk_bits
        per_term = _decode_position_keys(pdf, chunk_base)
        keys = _phrase_intersect(per_term, ordered_terms, slop, ordered, lucene)
        if keys is None or keys.size == 0:
            return empty
        docs, counts = np.unique(keys >> _PHRASE_POS_BITS, return_counts=True)
        return pd.DataFrame(
            {
                "doc_id": docs + chunk_base,
                "n_occurrences": counts.astype(np.int32),
            }
        )

    return match


def _decode_position_keys(pdf: pd.DataFrame, chunk_base: int) -> dict:
    """Per-term packed (local_doc << 40) | position key arrays for one
    chunk's rows — positions via segmented cumsum of the flat delta stream
    (segment k = posting k's tf deltas), all-numpy."""
    from ..functions.codec import varint_decode

    per_term: dict[str, np.ndarray] = {}
    for _, row in pdf.iterrows():
        ids = delta_decode(row["doc_gaps"]).astype(np.int64)
        tfs = varint_decode(row["tfs"]).astype(np.int64)
        deltas = varint_decode(row["positions"]).astype(np.int64)
        c = np.cumsum(deltas)
        starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
        seg_base = np.where(starts > 0, c[starts - 1], 0)
        pos = c - np.repeat(seg_base, tfs)
        local = np.repeat(ids - chunk_base, tfs)
        per_term[row["term"]] = (local << _PHRASE_POS_BITS) | pos
    return per_term


def _phrase_intersect(
    per_term: dict, ordered_terms: list[str], slop: int,
    ordered: bool = True, lucene: bool = False,
) -> "np.ndarray | None":
    """Anchor keys of phrase occurrences: a phrase occurrence at (doc, p)
    needs term i within [p + i, p + i + slop] (ordered contract) or the
    symmetric [p + i − slop, p + i + slop] (``ordered=False``, ES-style
    reordering) — shift each term's keys by its offset (and the slop
    window's extra displacements) and intersect.

    ``lucene=True`` (exact span-budget contract, see
    operators/bm25.py::phrase_match): anchors are drawn from EVERY term's
    offset-adjusted positions, and every term — term 0 included — must
    land in [s+i, s+i+slop].  Adjusted positions can be NEGATIVE ("b a"
    for phrase "a b" witnesses s=−1 at slop=2), which would borrow into
    the packed doc-id bits, so all key arithmetic carries a
    ``+(n_terms−1+slop)`` position bias: biased pos ≥ pos−(n−1)+B = slop
    ≥ the largest window displacement d, so neither the anchors nor the
    ``−d`` expansions ever underflow position 0 of their doc.  Repeated
    phrase terms additionally pass Lucene's distinct-position requirement
    via per-anchor Hall-run counts (searchsorted range counts over the
    term's sorted keys; see operators/bm25.py::phrase_match).  Returned
    keys keep the bias (callers only use ``key >> pos_bits``, unaffected
    since biased positions stay ≪ 2^pos_bits)."""
    if any(t not in per_term for t in ordered_terms):
        return None
    if lucene:
        from ..operators.bm25 import _repeated_term_runs

        bias = len(ordered_terms) - 1 + slop
        adj = [
            per_term[t] - offset + bias
            for offset, t in enumerate(ordered_terms)
        ]
        keys = np.unique(np.concatenate(adj)) if len(adj) > 1 else adj[0]
        for kt in adj:
            if slop:
                kt = np.unique(
                    np.concatenate([kt - d for d in range(0, slop + 1)])
                )
            keys = np.intersect1d(keys, kt, assume_unique=True)
            if keys.size == 0:
                return keys
        pos_mask = (np.int64(1) << _PHRASE_POS_BITS) - 1
        for first_off, lo_off, hi_off, need in _repeated_term_runs(
            ordered_terms, slop
        ):
            kt = np.sort(per_term[ordered_terms[first_off]])
            doc_base = keys & ~pos_mask
            # anchor key k = (doc << bits) | (s + bias); count raw positions
            # of the term in [s+lo_off, s+hi_off], clamped to the doc's own
            # position range so negative bounds can't borrow into doc bits
            lo = np.maximum(keys - bias + lo_off, doc_base)
            hi = np.maximum(keys - bias + hi_off, doc_base - 1)
            cnt = np.searchsorted(kt, hi, side="right") - np.searchsorted(
                kt, lo, side="left"
            )
            keys = keys[cnt >= need]
            if keys.size == 0:
                return keys
        return keys
    lo = -slop if not ordered else 0
    keys = per_term[ordered_terms[0]]
    for offset, t in enumerate(ordered_terms[1:], start=1):
        kt = per_term[t] - offset  # (doc << 40) | (pos - offset)
        if slop:
            kt = np.unique(
                np.concatenate([kt - d for d in range(lo, slop + 1)])
            )
        keys = np.intersect1d(keys, kt, assume_unique=True)
        if keys.size == 0:
            return keys
    return keys


def phrase_search(
    spark: SparkSession,
    index_dir: str,
    phrase: str | list[str],
    index_df: DataFrame | None = None,
    meta: IndexMeta | None = None,
    slop: int = 0,
    ordered: bool = True,
    lucene: bool = False,
) -> DataFrame:
    """Phrase match over a positions-enabled compressed index
    → (doc_id, n_occurrences).  Same shard/row-group pruning as topk_search;
    adjacency (or the anchored ``slop`` window / symmetric ``ordered=False``
    window / exact-Lucene span budget ``lucene=True`` — see
    ``operators.bm25.phrase_match`` for the three contracts; the
    reference's watchlist adapter queries with slop=1,
    ``elasticsearch_watchlist_adapter.py:218-229``) verified from the
    varint position streams per chunk.

    Rank-identity vs the DataFrame ``operators.bm25.phrase_match`` is
    asserted in tests/test_wand.py (slop 0, 1, 2; all three contracts)."""
    if index_df is None or meta is None:
        index_df, meta = load_index(spark, index_dir)
    if not meta.has_positions:
        raise ValueError(
            "index was built without positions (store_positions=False); "
            "rebuild with build_index(..., store_positions=True)"
        )
    terms = query_terms(phrase) if isinstance(phrase, str) else list(phrase)
    if not terms:
        return spark.createDataFrame([], PHRASE_SCHEMA)
    shard_of = _shard_of_terms(terms, meta.n_shards)
    shards = sorted(set(shard_of.values()))
    matched = index_df.where(
        F.col("shard").isin(shards) & F.col("term").isin(terms)
    )
    est_chunks = max(1, int(meta.n_docs) >> meta.chunk_bits)
    n_parts = max(
        8, min(spark.sparkContext.defaultParallelism * 2, est_chunks)
    )
    return (
        group_partitioned(matched, F.col("chunk"), n_parts)
        .groupBy("chunk")
        .applyInPandas(
            _phrase_chunk_scorer(terms, meta.chunk_bits, slop, ordered, lucene),
            PHRASE_SCHEMA,
        )
        .orderBy("doc_id")
    )


BATCH_PHRASE_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("n_occurrences", IntegerType()),
    ]
)


def batch_phrase_search(
    spark: SparkSession,
    index_dir: str,
    phrases: list[tuple[int, "str | list[str]"]],
    index_df: DataFrame | None = None,
    meta: IndexMeta | None = None,
    slop: int = 0,
    ordered: bool = True,
    lucene: bool = False,
) -> DataFrame:
    """Many phrases in ONE job (the msearch shape for phrase queries — the
    reference's watchlist adapter issues match_phrase per request;
    ``elasticsearch_watchlist_adapter.py:218-229``): the scan prunes to the
    UNION of all phrases' shards/terms, each chunk task decodes every needed
    term's position keys ONCE, and every phrase's intersect chain runs over
    the shared decode → (query_id, doc_id, n_occurrences).

    Per-phrase results are identical to ``phrase_search`` (parity-tested);
    the win is one job + one decode for the whole batch instead of a job
    and a decode per phrase."""
    if index_df is None or meta is None:
        index_df, meta = load_index(spark, index_dir)
    if not meta.has_positions:
        raise ValueError(
            "index was built without positions (store_positions=False); "
            "rebuild with build_index(..., store_positions=True)"
        )
    qterms = [
        (qid, query_terms(p) if isinstance(p, str) else list(p))
        for qid, p in phrases
    ]
    qterms = [(qid, ts) for qid, ts in qterms if ts]
    if not qterms:
        return spark.createDataFrame([], BATCH_PHRASE_SCHEMA)
    all_terms = sorted({t for _, ts in qterms for t in ts})
    shard_of = _shard_of_terms(all_terms, meta.n_shards)
    shards = sorted(set(shard_of.values()))
    matched = index_df.where(
        F.col("shard").isin(shards) & F.col("term").isin(all_terms)
    )
    chunk_bits = meta.chunk_bits

    def match_many(key, pdf: pd.DataFrame) -> pd.DataFrame:
        chunk_base = int(key[0]) << chunk_bits
        per_term = _decode_position_keys(pdf, chunk_base)
        out_q, out_d, out_n = [], [], []
        for qid, ts in qterms:
            keys = _phrase_intersect(per_term, ts, slop, ordered, lucene)
            if keys is None or keys.size == 0:
                continue
            docs, counts = np.unique(keys >> _PHRASE_POS_BITS, return_counts=True)
            out_q.append(np.full(docs.size, qid, dtype=np.int64))
            out_d.append(docs + chunk_base)
            out_n.append(counts.astype(np.int32))
        if not out_q:
            return pd.DataFrame(
                {"query_id": [], "doc_id": [], "n_occurrences": []}
            ).astype(
                {"query_id": np.int64, "doc_id": np.int64,
                 "n_occurrences": np.int32}
            )
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "n_occurrences": np.concatenate(out_n),
            }
        )

    est_chunks = max(1, int(meta.n_docs) >> meta.chunk_bits)
    n_parts = max(
        8, min(spark.sparkContext.defaultParallelism * 2, est_chunks)
    )
    return (
        group_partitioned(matched, F.col("chunk"), n_parts)
        .groupBy("chunk")
        .applyInPandas(match_many, BATCH_PHRASE_SCHEMA)
        .orderBy("query_id", "doc_id")
    )
