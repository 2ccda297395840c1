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


def test_merge_compact_rank_identity(spark, sf_smoke_dir, tmp_path):
    """merge_compact folds delta postings into the base index WITHOUT
    re-tokenizing the corpus, and the result scores IDENTICALLY to an index
    built from scratch on base ∪ delta (same n_docs/avgdl/df ⇒ same BM25)."""
    import os as _os

    from pyspark.sql import functions as F

    from hybrid_sanctions_search_engine_spark.operators.postings import (
        build_postings,
    )
    from hybrid_sanctions_search_engine_spark.plans.wand import topk_search
    from hybrid_sanctions_search_engine_spark.sources.index_io import (
        IndexMeta,
        build_index,
        load_index,
    )
    from hybrid_sanctions_search_engine_spark.streaming.incremental import (
        merge_compact,
    )

    docs = spark.read.parquet(_os.path.join(sf_smoke_dir, "documents.parquet"))
    base_docs = docs.where(F.col("doc_id") % 5 != 0)
    delta_docs = docs.where(F.col("doc_id") % 5 == 0)

    merged_dir = str(tmp_path / "merged_idx")
    build_index(base_docs, merged_dir, n_shards=4, chunk_bits=6, resume=False)
    delta_postings = build_postings(delta_docs, positions=False)
    report = merge_compact(spark, merged_dir, delta_postings)
    assert report["new_docs"] > 0 and report["shards_compacted"]

    scratch_dir = str(tmp_path / "scratch_idx")
    build_index(docs, scratch_dir, n_shards=4, chunk_bits=6, resume=False)

    m_meta = IndexMeta.load(merged_dir)
    s_meta = IndexMeta.load(scratch_dir)
    assert m_meta.n_docs == s_meta.n_docs
    assert m_meta.total_tokens == s_meta.total_tokens
    assert m_meta.avgdl == s_meta.avgdl  # exact, thanks to total_tokens

    m_idx, _ = load_index(spark, merged_dir)
    s_idx, _ = load_index(spark, scratch_dir)
    for q in ["spark query join", "window", "scan merge sort hash agg", "the"]:
        got = [
            (r["doc_id"], round(r["score"], 9), r["n_terms_matched"])
            for r in topk_search(spark, merged_dir, q, k=15,
                                 index_df=m_idx, meta=m_meta).collect()
        ]
        want = [
            (r["doc_id"], round(r["score"], 9), r["n_terms_matched"])
            for r in topk_search(spark, scratch_dir, q, k=15,
                                 index_df=s_idx, meta=s_meta).collect()
        ]
        assert got == want, q

    # postings parity: identical total postings across both indexes
    m_total = m_idx.agg(F.sum("n_docs")).collect()[0][0]
    s_total = s_idx.agg(F.sum("n_docs")).collect()[0][0]
    assert m_total == s_total


def test_compacting_manifest_invalidates_resume(tmp_path):
    """A shard left with status='compacting' (crash mid-swap) is NOT treated
    as complete — build_index(resume=True) would rebuild it."""
    import json
    import os as _os

    from hybrid_sanctions_search_engine_spark.sources.index_io import (
        completed_shards,
    )

    idx = tmp_path / "crash_idx"
    for s, status in [(0, "complete"), (1, "compacting"), (2, "complete")]:
        d = idx / f"shard={s}"
        d.mkdir(parents=True)
        (d / "_manifest.json").write_text(json.dumps({"status": status, "shard": s}))
    assert completed_shards(str(idx), 3) == [0, 2]


def test_two_wave_merge_compact(spark, sf_smoke_dir, tmp_path):
    """Two sequential merge compactions converge to the same index state a
    single from-scratch build produces (associativity of the fold)."""
    import os as _os

    from pyspark.sql import functions as F

    from hybrid_sanctions_search_engine_spark.operators.postings import (
        build_postings,
    )
    from hybrid_sanctions_search_engine_spark.plans.wand import topk_search
    from hybrid_sanctions_search_engine_spark.sources.index_io import (
        IndexMeta,
        build_index,
        load_index,
    )
    from hybrid_sanctions_search_engine_spark.streaming.incremental import (
        merge_compact,
    )

    docs = spark.read.parquet(_os.path.join(sf_smoke_dir, "documents.parquet"))
    base = docs.where(F.col("doc_id") % 3 == 0)
    wave1 = docs.where(F.col("doc_id") % 3 == 1)
    wave2 = docs.where(F.col("doc_id") % 3 == 2)

    merged_dir = str(tmp_path / "two_wave_idx")
    build_index(base, merged_dir, n_shards=4, chunk_bits=6, resume=False)
    merge_compact(spark, merged_dir, build_postings(wave1, positions=False))
    merge_compact(spark, merged_dir, build_postings(wave2, positions=False))

    scratch_dir = str(tmp_path / "two_wave_scratch")
    build_index(docs, scratch_dir, n_shards=4, chunk_bits=6, resume=False)

    m_meta, s_meta = IndexMeta.load(merged_dir), IndexMeta.load(scratch_dir)
    assert (m_meta.n_docs, m_meta.total_tokens, m_meta.avgdl) == (
        s_meta.n_docs, s_meta.total_tokens, s_meta.avgdl
    )
    m_idx, _ = load_index(spark, merged_dir)
    s_idx, _ = load_index(spark, scratch_dir)
    for q in ["spark query join", "the", "window"]:
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk_search(spark, merged_dir, q, k=12,
                                 index_df=m_idx, meta=m_meta).collect()
        ]
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk_search(spark, scratch_dir, q, k=12,
                                 index_df=s_idx, meta=s_meta).collect()
        ]
        assert got == want, q


def test_merge_compact_rerun_is_idempotent(spark, sf_smoke_dir, tmp_path):
    """Crash-recovery matrix for the swap protocol: (a) rerun after a crash
    before the IndexMeta commit (shards already finalized) must NOT re-fold
    the delta; (b) a shard left status='compacting' with the same
    fingerprint and no pending dot-file is finalized, not re-merged;
    (c) rerun after full success is a fingerprint no-op."""
    import json
    import os as _os
    from dataclasses import asdict

    from pyspark.sql import functions as F

    from hybrid_sanctions_search_engine_spark.operators.postings import (
        build_postings,
    )
    from hybrid_sanctions_search_engine_spark.plans.wand import topk_search
    from hybrid_sanctions_search_engine_spark.sources.index_io import (
        IndexMeta,
        build_index,
        load_index,
    )
    from hybrid_sanctions_search_engine_spark.streaming.incremental import (
        merge_compact,
    )

    docs = spark.read.parquet(_os.path.join(sf_smoke_dir, "documents.parquet"))
    base_docs = docs.where(F.col("doc_id") % 4 != 0)
    delta_docs = docs.where(F.col("doc_id") % 4 == 0)
    delta = build_postings(delta_docs, positions=False)

    idx_dir = str(tmp_path / "rerun_idx")
    build_index(base_docs, idx_dir, n_shards=4, chunk_bits=6, resume=False)
    pre_meta = IndexMeta.load(idx_dir)
    merge_compact(spark, idx_dir, delta)
    good_meta = IndexMeta.load(idx_dir)
    fp = good_meta.last_delta_fp
    assert fp

    def topk(q="spark query join"):
        i, m = load_index(spark, idx_dir)
        return [
            (r["doc_id"], round(r["score"], 9))
            for r in topk_search(spark, idx_dir, q, k=10, index_df=i, meta=m).collect()
        ]

    want = topk()

    # (c) rerun after success: fingerprint no-op, nothing changes
    rep = merge_compact(spark, idx_dir, delta)
    assert rep.get("noop") and rep["new_docs"] == 0
    assert IndexMeta.load(idx_dir) == good_meta and topk() == want

    # (a) crash before the meta commit: restore the PRE-merge meta while the
    # shards stay merged+finalized; rerun must skip all merging yet fix meta
    with open(_os.path.join(idx_dir, "_index_meta.json"), "w") as fh:
        json.dump(asdict(pre_meta), fh)
    rep = merge_compact(spark, idx_dir, delta)
    assert rep["shards_compacted"] == []  # nothing re-merged
    assert IndexMeta.load(idx_dir) == good_meta and topk() == want

    # (b) a shard crashed between replace and final commit: manifest says
    # 'compacting' with the right fp, dot-file gone, data already merged
    s = rep.get("already_swapped_probe", None)
    shard_dirs = [d for d in _os.listdir(idx_dir) if d.startswith("shard=")]
    victim = _os.path.join(idx_dir, shard_dirs[0])
    with open(_os.path.join(victim, "_manifest.json"), "w") as fh:
        json.dump({"status": "compacting", "shard": 0, "delta_fp": fp}, fh)
    with open(_os.path.join(idx_dir, "_index_meta.json"), "w") as fh:
        json.dump(asdict(pre_meta), fh)
    rep = merge_compact(spark, idx_dir, delta)
    mf = json.load(open(_os.path.join(victim, "_manifest.json")))
    assert mf["status"] == "complete" and mf.get("recovered")
    assert IndexMeta.load(idx_dir).n_docs == good_meta.n_docs
    assert topk() == want


def test_per_file_fold_idempotency(spark, sf_smoke_dir, tmp_path):
    """ADVICE r2: a crash AFTER the meta commit but BEFORE the delta files
    are deleted, followed by a new stream arrival, must not double-fold the
    old files — merge_compact(delta_files=...) excludes files recorded in
    IndexMeta.folded_delta_files and folds only the new arrival."""
    import os as _os

    from pyspark.sql import functions as F

    from hybrid_sanctions_search_engine_spark.operators.postings import build_postings
    from hybrid_sanctions_search_engine_spark.plans.wand import topk_search
    from hybrid_sanctions_search_engine_spark.sources.index_io import IndexMeta
    from hybrid_sanctions_search_engine_spark.streaming.incremental import merge_compact

    docs = spark.read.parquet(_os.path.join(sf_smoke_dir, "documents.parquet"))
    base_docs = docs.where(F.col("doc_id") % 3 == 0)
    wave1_docs = docs.where(F.col("doc_id") % 3 == 1)
    wave2_docs = docs.where(F.col("doc_id") % 3 == 2)

    idx_dir = str(tmp_path / "pf_idx")
    delta_dir = str(tmp_path / "pf_delta")
    build_index(base_docs, idx_dir, n_shards=4, chunk_bits=6, resume=False)

    def delta_files():
        return sorted(
            _os.path.join(delta_dir, f)
            for f in _os.listdir(delta_dir)
            if f.endswith(".parquet")
        )

    build_postings(wave1_docs, positions=False).coalesce(1).write.mode(
        "append"
    ).parquet(delta_dir)
    wave1_files = delta_files()
    rep1 = merge_compact(spark, idx_dir, delta_files=wave1_files)
    assert sorted(rep1["files_folded"]) == sorted(
        _os.path.basename(f) for f in wave1_files
    )
    meta1 = IndexMeta.load(idx_dir)
    assert set(meta1.folded_delta_files) == {
        _os.path.basename(f) for f in wave1_files
    }

    # crash window: wave-1 files NOT deleted; the stream appends wave 2
    build_postings(wave2_docs, positions=False).coalesce(1).write.mode(
        "append"
    ).parquet(delta_dir)
    all_files = delta_files()
    assert len(all_files) > len(wave1_files)
    rep2 = merge_compact(spark, idx_dir, delta_files=all_files)
    assert sorted(rep2["files_excluded"]) == sorted(
        _os.path.basename(f) for f in wave1_files
    )
    assert rep2["files_folded"] == sorted(
        _os.path.basename(f) for f in all_files if f not in wave1_files
    )

    # state must equal a from-scratch build over ALL docs (no double fold)
    scratch = str(tmp_path / "pf_scratch")
    build_index(docs, scratch, n_shards=4, chunk_bits=6, resume=False)
    m, s = IndexMeta.load(idx_dir), IndexMeta.load(scratch)
    assert (m.n_docs, m.total_tokens) == (s.n_docs, s.total_tokens)
    for q in ["spark query join", "window"]:
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk_search(spark, idx_dir, q, k=10).collect()
        ]
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk_search(spark, scratch, q, k=10).collect()
        ]
        assert got == want, q

    # a rerun with everything already folded is a per-file no-op
    rep3 = merge_compact(spark, idx_dir, delta_files=all_files)
    assert rep3["noop"] and rep3["files_folded"] == []


def test_half_finished_object_store_swap(spark, sf_smoke_dir, tmp_path):
    """ADVICE r2: on object stores fs.move is copy+delete; a crash in between
    leaves BOTH the new data.parquet and the tmp file.  The recovery pre-pass
    must compare data.parquet against the size+rows recorded in the
    'compacting' manifest: match ⇒ swap finished (finalize, delete tmp, no
    re-merge); mismatch ⇒ original data intact (safe re-merge)."""
    import json
    import shutil as _sh
    import os as _os
    from dataclasses import asdict

    from pyspark.sql import functions as F

    from hybrid_sanctions_search_engine_spark.operators.postings import build_postings
    from hybrid_sanctions_search_engine_spark.plans.wand import topk_search
    from hybrid_sanctions_search_engine_spark.sources.index_io import IndexMeta
    from hybrid_sanctions_search_engine_spark.streaming.incremental import merge_compact

    docs = spark.read.parquet(_os.path.join(sf_smoke_dir, "documents.parquet"))
    base_docs = docs.where(F.col("doc_id") % 4 != 0)
    delta = build_postings(
        docs.where(F.col("doc_id") % 4 == 0), positions=False
    )

    idx_dir = str(tmp_path / "swap_idx")
    build_index(base_docs, idx_dir, n_shards=4, chunk_bits=6, resume=False)
    pre_meta = IndexMeta.load(idx_dir)
    # keep pristine pre-merge copies of every shard
    backup = str(tmp_path / "swap_backup")
    _sh.copytree(idx_dir, backup)

    merge_compact(spark, idx_dir, delta)
    good_meta = IndexMeta.load(idx_dir)
    fp = good_meta.last_delta_fp

    def topk(q="spark query join"):
        return [
            (r["doc_id"], round(r["score"], 9))
            for r in topk_search(spark, idx_dir, q, k=10).collect()
        ]

    want = topk()
    victim = _os.path.join(idx_dir, "shard=0")
    final_mf = json.load(open(_os.path.join(victim, "_manifest.json")))
    merged_data = _os.path.join(victim, "data.parquet")

    # --- case 1: copy landed, tmp delete pending -------------------------
    _sh.copyfile(merged_data, _os.path.join(victim, ".tmp-merge.parquet"))
    json.dump(
        {
            "status": "compacting",
            "shard": 0,
            "delta_fp": fp,
            "merged_bytes": final_mf["bytes"],
            "merged_rows": final_mf["chunks"],
        },
        open(_os.path.join(victim, "_manifest.json"), "w"),
    )
    json.dump(asdict(pre_meta), open(_os.path.join(idx_dir, "_index_meta.json"), "w"))
    rep = merge_compact(spark, idx_dir, delta)
    assert 0 in rep["shards_recovered"] and 0 not in rep["shards_compacted"]
    assert not _os.path.exists(_os.path.join(victim, ".tmp-merge.parquet"))
    mf = json.load(open(_os.path.join(victim, "_manifest.json")))
    assert mf["status"] == "complete"
    assert IndexMeta.load(idx_dir).n_docs == good_meta.n_docs
    assert topk() == want

    # --- case 2: replace never ran (original data intact) ----------------
    _sh.copyfile(merged_data, _os.path.join(victim, ".tmp-merge.parquet"))
    _sh.copyfile(_os.path.join(backup, "shard=0", "data.parquet"), merged_data)
    assert _os.path.getsize(merged_data) != final_mf["bytes"]  # states differ
    json.dump(
        {
            "status": "compacting",
            "shard": 0,
            "delta_fp": fp,
            "merged_bytes": final_mf["bytes"],
            "merged_rows": final_mf["chunks"],
        },
        open(_os.path.join(victim, "_manifest.json"), "w"),
    )
    json.dump(asdict(pre_meta), open(_os.path.join(idx_dir, "_index_meta.json"), "w"))
    rep = merge_compact(spark, idx_dir, delta)
    assert 0 in rep["shards_compacted"]  # genuinely re-merged
    mf = json.load(open(_os.path.join(victim, "_manifest.json")))
    assert mf["status"] == "complete"
    assert topk() == want


def test_search_many_with_delta_parity(spark, sf_smoke_dir, tmp_path):
    """Batched overlay serving ≡ per-query search_with_delta for a mixed
    query set (hits in base only, delta only, both, and nowhere)."""
    import os as _os

    from pyspark.sql import functions as F

    from hybrid_sanctions_search_engine_spark.operators.postings import build_postings
    from hybrid_sanctions_search_engine_spark.streaming.incremental import (
        search_many_with_delta,
        search_with_delta,
    )

    docs = spark.read.parquet(_os.path.join(sf_smoke_dir, "documents.parquet"))
    base_docs = docs.where(F.col("doc_id") % 3 != 0)
    delta_docs = docs.where(F.col("doc_id") % 3 == 0)
    idx_dir = str(tmp_path / "om_idx")
    build_index(base_docs, idx_dir, n_shards=4, chunk_bits=6, resume=False)
    delta = build_postings(delta_docs, positions=False).select(
        "term", "doc_id", "doc_len", "tf"
    )

    queries = [
        (1, "spark query join"),
        (2, "window"),
        (3, "zzz_nothing"),
        (4, "merge sort customer"),
    ]
    batched = search_many_with_delta(spark, idx_dir, delta, queries, k=8)
    got: dict[int, list] = {qid: [] for qid, _ in queries}
    for r in batched.collect():
        got[r["query_id"]].append((r["rank"], r["doc_id"], round(r["score"], 9)))
    for qid, q in queries:
        want = [
            (i + 1, r["doc_id"], round(r["score"], 9))
            for i, r in enumerate(
                search_with_delta(spark, idx_dir, delta, q, k=8).collect()
            )
        ]
        assert sorted(got[qid]) == want, q

    # empty delta degenerates to the plain indexed batch
    empty = search_many_with_delta(spark, idx_dir, None, queries[:2], k=5)
    assert empty.count() > 0


def test_delta_stats_manifest(spark, tmp_path):
    """The delta stream maintains (n_docs, total_len) in _delta_stats.json;
    serving with the manifest stats is row-identical to recomputing them,
    the manifest matches a fresh distinct().agg(), and a retried batch_id
    does not double-count."""
    import os as _os

    from pyspark.sql import functions as F

    from hybrid_sanctions_search_engine_spark.streaming.incremental import (
        _fold_delta_stats,
        load_delta_postings,
        load_delta_stats,
        search_many_with_delta,
        search_with_delta,
        start_delta_stream,
    )

    d = {k: str(tmp_path / k) for k in ("input", "delta", "ckpt", "index")}
    _os.makedirs(d["input"], exist_ok=True)
    base_docs = spark.createDataFrame(
        [(i, f"base doc number {i} spark query value", "en", "b", 30) for i in range(40)],
        SCHEMA,
    )
    build_index(base_docs, d["index"], n_shards=2, chunk_bits=6)

    _write_docs(
        spark, d["input"],
        [(900001, "zyzzyva streamed one two three", "en", "s", 30),
         (900002, "zyzzyva spark four five", "en", "s", 23)],
    )
    q = start_delta_stream(spark, d["input"], d["delta"], d["ckpt"], SCHEMA)
    q.awaitTermination(120)
    _write_docs(
        spark, d["input"],
        [(900003, "zyzzyva value six", "en", "s", 17)],
    )
    q2 = start_delta_stream(spark, d["input"], d["delta"], d["ckpt"], SCHEMA)
    q2.awaitTermination(120)

    delta = load_delta_postings(spark, d["delta"])
    stats = load_delta_stats(d["delta"])
    assert stats is not None
    row = (
        delta.select("doc_id", "doc_len").distinct()
        .agg(F.count("*").alias("n"), F.sum("doc_len").alias("t")).collect()[0]
    )
    assert stats[0] == int(row["n"]) == 3
    assert stats[1] == pytest.approx(float(row["t"]) / int(row["n"]))

    # batch-id replay guard: folding an already-seen batch id WITHIN the
    # same stream lineage is a no-op; a different lineage would land
    import hashlib as _hl

    lineage = _hl.sha256(
        _os.path.abspath(d["ckpt"]).encode()
    ).hexdigest()[:16]
    before = load_delta_stats(d["delta"])
    _fold_delta_stats(
        d["delta"], batch_id=0, n_docs=99, total_len=9999, lineage=lineage
    )
    assert load_delta_stats(d["delta"]) == before

    queries = [(1, "zyzzyva"), (2, "spark query"), (3, "nothing_zz")]
    with_stats = search_many_with_delta(
        spark, d["index"], delta, queries, k=5, delta_stats=stats
    ).collect()
    without = search_many_with_delta(
        spark, d["index"], delta, queries, k=5
    ).collect()
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
    assert sorted(map(key, with_stats)) == sorted(map(key, without))

    one_with = search_with_delta(
        spark, d["index"], delta, "zyzzyva", k=5, delta_stats=stats
    ).collect()
    one_without = search_with_delta(spark, d["index"], delta, "zyzzyva", k=5).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in one_with] == [
        (r["doc_id"], round(r["score"], 9)) for r in one_without
    ]


def test_delta_stats_survive_compaction_and_new_lineage(spark, tmp_path):
    """Round-4 review findings: (a) merge_compact subtracts the folded
    docs' stats from the delta manifest (idempotently per fingerprint), so
    the REMAINING delta keeps serving under correct (n_docs, avgdl); (b) a
    NEW stream lineage (fresh checkpoint → batch ids restart at 0) still
    folds its stats instead of being mistaken for a replay."""
    import os as _os

    from pyspark.sql import functions as F

    from hybrid_sanctions_search_engine_spark.streaming.incremental import (
        load_delta_postings,
        load_delta_stats,
        merge_compact,
        start_delta_stream,
    )

    d = {k: str(tmp_path / k) for k in ("input", "delta", "ckpt", "ckpt2", "index")}
    _os.makedirs(d["input"], exist_ok=True)
    base_docs = spark.createDataFrame(
        [(i, f"base doc {i} alpha beta", "en", "b", 20) for i in range(30)],
        SCHEMA,
    )
    build_index(base_docs, d["index"], n_shards=2, chunk_bits=6)

    # wave 1 via checkpoint 1
    _write_docs(
        spark, d["input"],
        [(800001, "gamma delta one", "en", "s", 15),
         (800002, "gamma epsilon two", "en", "s", 17)],
    )
    start_delta_stream(
        spark, d["input"], d["delta"], d["ckpt"], SCHEMA
    ).awaitTermination(120)
    assert load_delta_stats(d["delta"])[0] == 2

    # fold wave 1; its stats must LEAVE the manifest
    files = [
        _os.path.join(d["delta"], f)
        for f in _os.listdir(d["delta"])
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    report = merge_compact(spark, d["index"], delta_files=files)
    assert report["new_docs"] == 2
    stats_after = load_delta_stats(d["delta"])
    assert stats_after == (0, 0.0)
    # idempotent: a rerun no-ops at the meta fingerprint and must not
    # subtract a second time
    fp_rerun = merge_compact(spark, d["index"], delta_files=files)
    assert fp_rerun.get("noop")
    assert load_delta_stats(d["delta"]) == (0, 0.0)

    # caller deletes the folded files (the compact_job contract)
    for f in files:
        _os.remove(f)

    # wave 2 arrives via a FRESH checkpoint — batch ids restart at 0; the
    # per-lineage guard must fold its stats (a global guard dropped them)
    _write_docs(
        spark, d["input"],
        [(800003, "zeta eta three four five", "en", "s", 24)],
    )
    start_delta_stream(
        spark, d["input"], d["delta"], d["ckpt2"], SCHEMA
    ).awaitTermination(120)
    stats2 = load_delta_stats(d["delta"])
    delta = load_delta_postings(spark, d["delta"])
    row = (
        delta.select("doc_id", "doc_len").distinct()
        .agg(F.count("*").alias("n"), F.avg("doc_len").alias("a")).collect()[0]
    )
    # NOTE: checkpoint 2 reprocesses ALL input files (fresh source state),
    # so the delta now holds waves 1+2 again — stats must equal the actual
    # remaining-file recompute either way
    assert stats2[0] == int(row["n"])
    assert stats2[1] == pytest.approx(float(row["a"]))


def test_interleaved_lineage_folds_never_lose_updates(tmp_path):
    """The round-5 race fix's contract, tested directly: two stream
    lineages folding into ONE delta_dir with arbitrarily interleaved
    writes lose nothing (each lineage owns its manifest file — the old
    shared-file read-modify-write dropped one side's fold when commits
    interleaved), per-lineage replay guards stay independent, and the
    compaction subtraction ledger applies once per fingerprint."""
    import os as _os

    from hybrid_sanctions_search_engine_spark.streaming.incremental import (
        _fold_delta_stats,
        _subtract_delta_stats,
        load_delta_stats,
    )

    d = str(tmp_path / "delta")
    _os.makedirs(d, exist_ok=True)
    # interleave: A0, B0, A1, B1, A1-retry (must no-op), B2
    _fold_delta_stats(d, 0, 10, 100, lineage="streamA")
    _fold_delta_stats(d, 0, 5, 50, lineage="streamB")
    _fold_delta_stats(d, 1, 20, 200, lineage="streamA")
    _fold_delta_stats(d, 1, 7, 70, lineage="streamB")
    _fold_delta_stats(d, 1, 999, 9999, lineage="streamA")  # replay: no-op
    _fold_delta_stats(d, 2, 8, 80, lineage="streamB")
    n, avgdl = load_delta_stats(d)
    assert n == 10 + 20 + 5 + 7 + 8
    assert avgdl == (100 + 200 + 50 + 70 + 80) / n
    # compaction subtracts once per fingerprint, even on rerun
    _subtract_delta_stats(d, "fp-1", 30, 300)
    _subtract_delta_stats(d, "fp-1", 30, 300)  # rerun after crash: no-op
    n2, avgdl2 = load_delta_stats(d)
    assert n2 == 50 - 30
    assert avgdl2 == (500 - 300) / 20
    # a tmp leftover from a crashed commit must not be counted
    lineage_files = [
        f for f in _os.listdir(d) if f.startswith("_delta_stats_lineage_")
    ]
    assert lineage_files
    src = _os.path.join(d, lineage_files[0])
    with open(src + ".tmp", "w") as fh, open(src) as rf:
        fh.write(rf.read())
    assert load_delta_stats(d) == (n2, avgdl2)


def test_subtraction_ledger_keeps_all_fingerprints(tmp_path):
    """Round-6 ADVICE fix: a crash-rerun of a compaction whose fingerprint
    had rotated out of the old 64-entry window double-subtracted its stats.
    The ledger now keeps every fp — replaying an OLD compaction after 100
    newer ones must be a no-op."""
    from hybrid_sanctions_search_engine_spark.sources.fs import fs_for
    from hybrid_sanctions_search_engine_spark.streaming.incremental import (
        DELTA_STATS_SUB_FILE,
        _subtract_delta_stats,
    )

    d = str(tmp_path)
    _subtract_delta_stats(d, "fp-old", 10, 100)
    for i in range(100):
        _subtract_delta_stats(d, f"fp-{i}", 1, 10)
    _subtract_delta_stats(d, "fp-old", 10, 100)  # crash rerun
    sub = fs_for(d).read_json(os.path.join(d, DELTA_STATS_SUB_FILE))
    assert sub["n_docs"] == 110 and sub["total_len"] == 1100
    assert len(sub["fps"]) == 101


def test_merge_compact_recovers_crashed_fold_before_meta_commit(
    spark, sf_smoke_dir, tmp_path
):
    """Crash AFTER every shard swapped+finalized for delta A but BEFORE the
    IndexMeta commit, then the stream appends B: the rerun over {A, B} must
    recognize the foreign shard fingerprints (recorded delta_files still in
    the snapshot, absent from folded_delta_files), finalize fold A on its
    own snapshot, and fold only B — never re-merge A into shards that
    already contain its postings."""
    import json as _json
    import os as _os

    from hybrid_sanctions_search_engine_spark.operators.postings import (
        build_postings,
    )
    from hybrid_sanctions_search_engine_spark.plans.wand import topk_search
    from hybrid_sanctions_search_engine_spark.sources.index_io import IndexMeta
    from hybrid_sanctions_search_engine_spark.streaming.incremental import (
        DELTA_STATS_SUB_FILE,
        merge_compact,
    )

    docs = spark.read.parquet(_os.path.join(sf_smoke_dir, "documents.parquet"))
    base_docs = docs.where(F.col("doc_id") % 3 == 0)
    wave1_docs = docs.where(F.col("doc_id") % 3 == 1)
    wave2_docs = docs.where(F.col("doc_id") % 3 == 2)

    idx_dir = str(tmp_path / "rc_idx")
    delta_dir = str(tmp_path / "rc_delta")
    build_index(base_docs, idx_dir, n_shards=4, chunk_bits=6, resume=False)

    def delta_files():
        return sorted(
            _os.path.join(delta_dir, f)
            for f in _os.listdir(delta_dir)
            if f.endswith(".parquet")
        )

    meta_path = _os.path.join(idx_dir, "_index_meta.json")
    with open(meta_path) as fh:
        pre_meta = fh.read()

    build_postings(wave1_docs, positions=False).coalesce(1).write.mode(
        "append"
    ).parquet(delta_dir)
    wave1_files = delta_files()
    merge_compact(spark, idx_dir, delta_files=wave1_files)
    # simulate the crash: shard manifests are final (delta_fp = fold A),
    # but the IndexMeta commit and the stats subtraction never happened
    with open(meta_path, "w") as fh:
        fh.write(pre_meta)
    sub_path = _os.path.join(delta_dir, DELTA_STATS_SUB_FILE)
    if _os.path.exists(sub_path):
        _os.remove(sub_path)

    build_postings(wave2_docs, positions=False).coalesce(1).write.mode(
        "append"
    ).parquet(delta_dir)
    all_files = delta_files()
    rep = merge_compact(spark, idx_dir, delta_files=all_files)
    assert not rep.get("noop")

    # the index must equal a from-scratch build over ALL docs (A folded
    # exactly once, B folded)
    scratch = str(tmp_path / "rc_scratch")
    build_index(docs, scratch, n_shards=4, chunk_bits=6, resume=False)
    m, s = IndexMeta.load(idx_dir), IndexMeta.load(scratch)
    assert (m.n_docs, m.total_tokens) == (s.n_docs, s.total_tokens)
    for q in ["spark query join", "window"]:
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk_search(spark, idx_dir, q, k=10).collect()
        ]
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk_search(spark, scratch, q, k=10).collect()
        ]
        assert got == want, q
    # both folds' stats left the delta manifest side
    with open(sub_path) as fh:
        sub = _json.load(fh)
    assert len(sub["fps"]) == 2


def test_recovery_recursion_preserves_prior_fold_ledger(
    spark, sf_smoke_dir, tmp_path
):
    """A COMPLETED fold A whose files are still in the delta dir (crash in
    the delete window), then fold B crashes before ITS meta commit, then C
    arrives.  The rerun's recovery recursion re-runs fold B on B's subset
    snapshot — its ledger commit must PRESERVE A's entry (the old code
    intersected the ledger with the subset snapshot, dropping A, and the
    full-snapshot redo then re-merged A's postings into shards that
    already contain them — silent double-fold)."""
    import json as _json
    import os as _os

    from hybrid_sanctions_search_engine_spark.operators.postings import (
        build_postings,
    )
    from hybrid_sanctions_search_engine_spark.plans.wand import topk_search
    from hybrid_sanctions_search_engine_spark.sources.index_io import IndexMeta
    from hybrid_sanctions_search_engine_spark.streaming.incremental import (
        DELTA_STATS_SUB_FILE,
        merge_compact,
    )

    docs = spark.read.parquet(_os.path.join(sf_smoke_dir, "documents.parquet"))
    base_docs = docs.where(F.col("doc_id") % 4 == 0)
    waves = [docs.where(F.col("doc_id") % 4 == r) for r in (1, 2, 3)]

    idx_dir = str(tmp_path / "dl_idx")
    delta_dir = str(tmp_path / "dl_delta")
    build_index(base_docs, idx_dir, n_shards=4, chunk_bits=6, resume=False)

    def delta_files():
        return sorted(
            _os.path.join(delta_dir, f)
            for f in _os.listdir(delta_dir)
            if f.endswith(".parquet")
        )

    meta_path = _os.path.join(idx_dir, "_index_meta.json")
    sub_path = _os.path.join(delta_dir, DELTA_STATS_SUB_FILE)

    # fold A COMPLETES (meta records A in folded_delta_files) but its file
    # is never deleted from the delta dir
    build_postings(waves[0], positions=False).coalesce(1).write.mode(
        "append"
    ).parquet(delta_dir)
    merge_compact(spark, idx_dir, delta_files=delta_files())
    assert IndexMeta.load(idx_dir).folded_delta_files

    # snapshot the post-A state, then fold B and crash before ITS meta
    # commit (shard manifests final for B, meta + stats ledger restored)
    with open(meta_path) as fh:
        post_a_meta = fh.read()
    with open(sub_path) as fh:
        post_a_sub = fh.read()
    build_postings(waves[1], positions=False).coalesce(1).write.mode(
        "append"
    ).parquet(delta_dir)
    merge_compact(spark, idx_dir, delta_files=delta_files())
    with open(meta_path, "w") as fh:
        fh.write(post_a_meta)
    with open(sub_path, "w") as fh:
        fh.write(post_a_sub)

    # C arrives; the rerun over {A, B, C} must recover fold B and fold C
    # exactly once each, never re-merging A
    build_postings(waves[2], positions=False).coalesce(1).write.mode(
        "append"
    ).parquet(delta_dir)
    rep = merge_compact(spark, idx_dir, delta_files=delta_files())
    assert not rep.get("noop")

    scratch = str(tmp_path / "dl_scratch")
    build_index(docs, scratch, n_shards=4, chunk_bits=6, resume=False)
    m, s = IndexMeta.load(idx_dir), IndexMeta.load(scratch)
    assert (m.n_docs, m.total_tokens) == (s.n_docs, s.total_tokens)
    for q in ["spark query join", "window"]:
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk_search(spark, idx_dir, q, k=10).collect()
        ]
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in topk_search(spark, scratch, q, k=10).collect()
        ]
        assert got == want, q


def test_merge_compact_fp_distinguishes_aliasing_deltas(
    spark, sf_smoke_dir, tmp_path
):
    """{2,3} and {1,4} with equal doc_len totals share count+tokens+id_sum;
    the xxhash64 digest in the fingerprint must keep the second fold from
    becoming a silent noop."""
    import os as _os

    from hybrid_sanctions_search_engine_spark.operators.postings import (
        build_postings,
    )
    from hybrid_sanctions_search_engine_spark.streaming.incremental import (
        merge_compact,
    )

    docs = spark.read.parquet(_os.path.join(sf_smoke_dir, "documents.parquet"))
    base_docs = docs.where(F.col("doc_id") >= 100)
    idx_dir = str(tmp_path / "alias_idx")
    build_index(base_docs, idx_dir, n_shards=4, chunk_bits=6, resume=False)

    rows_a = [
        (2, "alpha beta gamma", "en", "synthetic", 16),
        (3, "delta epsilon zeta", "en", "synthetic", 18),
    ]
    rows_b = [
        (1, "alpha beta gamma", "en", "synthetic", 16),
        (4, "delta epsilon zeta", "en", "synthetic", 18),
    ]
    delta_a = build_postings(spark.createDataFrame(rows_a, SCHEMA), positions=False)
    delta_b = build_postings(spark.createDataFrame(rows_b, SCHEMA), positions=False)
    rep_a = merge_compact(spark, idx_dir, delta_a)
    assert rep_a["new_docs"] == 2
    rep_b = merge_compact(spark, idx_dir, delta_b)
    assert not rep_b.get("noop") and rep_b["new_docs"] == 2


def test_merge_compact_subtracts_before_meta_commit(
    spark, sf_smoke_dir, tmp_path
):
    """The stats subtraction runs BEFORE the IndexMeta commit, so every
    crash window converges on rerun: a crash between the two re-enters the
    fold path (shards already complete → skipped), re-calls the
    fp-idempotent subtraction (no double-subtract), and commits the meta.
    An interleaved bare-DataFrame fold must also PRESERVE the per-file
    ledger (committing None would make a later files rerun re-fold
    everything)."""
    import json as _json
    import os as _os

    from hybrid_sanctions_search_engine_spark.operators.postings import (
        build_postings,
    )
    from hybrid_sanctions_search_engine_spark.sources.index_io import IndexMeta
    from hybrid_sanctions_search_engine_spark.streaming.incremental import (
        DELTA_STATS_SUB_FILE,
        merge_compact,
    )

    docs = spark.read.parquet(_os.path.join(sf_smoke_dir, "documents.parquet"))
    base_docs = docs.where(F.col("doc_id") % 2 == 0)
    wave_docs = docs.where(F.col("doc_id") % 2 == 1)
    idx_dir = str(tmp_path / "sub_idx")
    delta_dir = str(tmp_path / "sub_delta")
    build_index(base_docs, idx_dir, n_shards=4, chunk_bits=6, resume=False)
    meta_path = _os.path.join(idx_dir, "_index_meta.json")
    with open(meta_path) as fh:
        pre_meta = fh.read()
    build_postings(wave_docs, positions=False).coalesce(1).write.mode(
        "append"
    ).parquet(delta_dir)
    files = sorted(
        _os.path.join(delta_dir, f)
        for f in _os.listdir(delta_dir)
        if f.endswith(".parquet")
    )
    rep = merge_compact(spark, idx_dir, delta_files=files)
    sub_path = _os.path.join(delta_dir, DELTA_STATS_SUB_FILE)
    with open(sub_path) as fh:
        sub1 = _json.load(fh)
    assert sub1["n_docs"] == rep["new_docs"]
    meta_after = IndexMeta.load(idx_dir)

    # crash between the subtraction and the meta commit: restore the old
    # meta, keep the subtraction ledger — the rerun must re-complete the
    # fold without subtracting twice
    with open(meta_path, "w") as fh:
        fh.write(pre_meta)
    rerun = merge_compact(spark, idx_dir, delta_files=files)
    assert not rerun.get("noop")
    with open(sub_path) as fh:
        sub2 = _json.load(fh)
    assert sub2 == sub1  # fp-idempotent: no double subtraction
    m = IndexMeta.load(idx_dir)
    assert (m.n_docs, m.total_tokens) == (
        meta_after.n_docs,
        meta_after.total_tokens,
    )

    # interleaved bare-DataFrame fold preserves the per-file ledger
    extra = build_postings(
        spark.createDataFrame(
            [(700001, "omicron sigma tau", "en", "synthetic", 17)], SCHEMA
        ),
        positions=False,
    )
    merge_compact(spark, idx_dir, extra)
    assert set(IndexMeta.load(idx_dir).folded_delta_files or []) == {
        _os.path.basename(f) for f in files
    }
    rerun2 = merge_compact(spark, idx_dir, delta_files=files)
    assert rerun2.get("noop")
