"""Web-page ingestion (north-rule input shape): extraction spec invariants.

The corpus contract is ``(url, warc_ts, html binary, text, lang)`` with a
per-row invariant: byte-identical extracted text per url, across runs and
across engines.  Pinned three ways: Spark Column expr ≡ pure-Python twin
(independent implementation), Spark ≡ DuckDB SQL (driver oracle, also in
tests/test_entry_oracle.py via the webpage_extract contract query), and a
second Spark run ≡ the first."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hybrid_sanctions_search_engine_spark.sources.webpages import (
    WEBPAGE_SCHEMA,
    extract_text_col,
    py_extract_text,
    synth_webpages,
    webpages_to_documents,
)

NASTY_HTML = [
    b"<html><body><p>plain text</p></body></html>",
    b"<SCRIPT>alert('<b>bold</b>')</SCRIPT>visible",
    b"<style type='text/css'>body { color: red }</style>after style",
    b"<!-- comment with <tags> inside -->kept",
    b"a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;end",
    b"&amp;lt; stays literal lt entity",
    b"unclosed <div then text",
    b"  \t\n lots \r\n of   whitespace \t ",
    b"<p>multi</p><p>paragraph</p><br/><span>spans</span>",
    "юникод <b>жирный</b> текст".encode("utf-8"),
]


def test_extract_matches_python_twin(spark):
    rows = [(i, h) for i, h in enumerate(NASTY_HTML)]
    df = spark.createDataFrame(rows, "id long, html binary")
    got = {
        r["id"]: r["text"]
        for r in df.select("id", extract_text_col(F.col("html")).alias("text")).collect()
    }
    for i, h in rows:
        assert got[i] == py_extract_text(h), (i, h)


def test_synth_pages_deterministic_and_extractable(spark, sf_smoke_dir):
    docs = spark.read.parquet(os.path.join(sf_smoke_dir, "documents.parquet"))
    pages = synth_webpages(docs)
    assert dict(pages.dtypes)["html"] == "binary"
    assert dict(pages.dtypes)["warc_ts"] == "timestamp"
    a = sorted(
        (r["url"], r["text"]) for r in
        pages.select("url", extract_text_col(F.col("html")).alias("text")).collect()
    )
    b = sorted(
        (r["url"], r["text"]) for r in
        synth_webpages(docs).select(
            "url", extract_text_col(F.col("html")).alias("text")
        ).collect()
    )
    assert a == b  # byte-identical per url across runs
    # python-twin parity over the whole synthetic corpus
    raw = {r["url"]: bytes(r["html"]) for r in pages.collect()}
    got = dict(a)
    for url, html in raw.items():
        assert got[url] == py_extract_text(html), url
    # the original document text survives inside the extraction (the synth
    # layout only adds chrome; & is entity-roundtripped)
    one = docs.select("doc_id", "text").first()
    assert one["text"].replace("&", "&") in got[
        f"https://corpus.example/doc/{one['doc_id']}"
    ]


def test_ingest_to_documents_and_index(spark, sf_smoke_dir, tmp_path):
    """End-to-end: pages → documents shape → compressed index → BM25 finds
    page content.  This is the 10^12-row build path over the input_hint
    schema."""
    from hybrid_sanctions_search_engine_spark.plans.wand import topk_search
    from hybrid_sanctions_search_engine_spark.sources.index_io import (
        build_index,
        load_index,
    )

    docs = spark.read.parquet(os.path.join(sf_smoke_dir, "documents.parquet"))
    pages = synth_webpages(docs.limit(120))
    ingested = webpages_to_documents(pages)
    assert ingested.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert ingested.where(F.col("doc_id").isNull()).count() == 0
    n = ingested.count()
    assert ingested.select("doc_id").distinct().count() == n  # url-hash unique
    idx_dir = str(tmp_path / "web_idx")
    build_index(ingested, idx_dir, n_shards=2, chunk_bits=10)
    idx, meta = load_index(spark, idx_dir)
    assert meta.n_docs == n
    res = topk_search(spark, idx_dir, "docs", k=5, index_df=idx, meta=meta)
    assert res.count() > 0  # "docs" comes from the variant-0 nav chrome


def test_extraction_stays_jvm_side(spark, sf_smoke_dir):
    """The extraction chain must plan as pure Column expressions — no
    Python eval stage (BatchEvalPython/ArrowEvalPython) in the physical
    plan; at 10^12 rows the scan+extract is the whole build cost."""
    docs = spark.read.parquet(os.path.join(sf_smoke_dir, "documents.parquet"))
    out = webpages_to_documents(synth_webpages(docs))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_ingest_detect_lang_fills_missing(spark):
    """webpages_to_documents(detect_lang=True): null/empty lang values are
    filled from the config-driven detector over the EXTRACTED text; stored
    non-empty values are trusted and kept; the column stays a plain string
    (no struct leaks into the documents shape)."""
    from hybrid_sanctions_search_engine_spark.sources.webpages import (
        webpages_to_documents,
    )

    body = "the quick brown fox and the lazy dog went to the market"
    pages = spark.createDataFrame(
        [
            ("https://a/1", b"<html><body><p>" + body.encode() + b"</p></body></html>", None),
            ("https://a/2", b"<html><body><p>" + body.encode() + b"</p></body></html>", ""),
            ("https://a/3", b"<html><body><p>" + body.encode() + b"</p></body></html>", "uk"),
            ("https://a/4", "<html><body><p>Иван Петров перевод денег был дома</p></body></html>".encode(), None),
        ],
        "url string, html binary, lang string",
    )
    docs = webpages_to_documents(pages, detect_lang=True)
    assert docs.schema["lang"].dataType.simpleString() == "string"
    langs = [r["lang"] for r in docs.collect()]
    # two english pages filled as en, the russian page as ru, stored uk kept
    assert sorted(langs) == ["en", "en", "ru", "uk"], langs
    # without the flag, behavior is unchanged (nulls stay null)
    plain = webpages_to_documents(pages).select("lang").collect()
    assert sorted(r["lang"] or "" for r in plain) == ["", "", "", "uk"]
