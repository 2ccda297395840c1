"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k over sf0.001 documents.
``queries()`` — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query (same column names; floats
rounded to 4 decimals on both sides).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hybrid_sanctions_search_engine_spark.operators import bm25 as bm25_ops
from hybrid_sanctions_search_engine_spark.operators import postings as post_ops

# ---------------------------------------------------------------------------
# shared fragments
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS = ["spark", "query", "join"]

# DuckDB CTEs mirroring the JVM index tokenizer + postings build exactly.
_ORACLE_TOKS = """
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '') AS tokens
  FROM documents
),
dl AS (SELECT doc_id, len(tokens) AS doc_len FROM toks),
post AS (SELECT doc_id, unnest(tokens) AS term FROM toks),
tfs AS (SELECT term, doc_id, count(*)::INT AS tf FROM post GROUP BY 1, 2)
"""


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf, "documents.parquet"))


def _tbl(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# fulltext queries
# ---------------------------------------------------------------------------

def q_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    res = bm25_ops.bm25_topk(_docs(spark, sf), BM25_QUERY_TERMS, k=10)
    return res.select(
        "doc_id", F.round("score", 4).alias("score"), "n_terms_matched"
    )


def q_postings_tf(spark: SparkSession, sf: str) -> DataFrame:
    postings = post_ops.build_postings(_docs(spark, sf), positions=False)
    return postings.where(F.col("term").isin(BM25_QUERY_TERMS)).select(
        "term", "doc_id", "tf"
    )


def q_term_df_top20(spark: SparkSession, sf: str) -> DataFrame:
    postings = post_ops.build_postings(_docs(spark, sf), positions=False)
    return (
        post_ops.term_doc_freq(postings)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(20)
    )


def q_corpus_stats(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf)
    return post_ops.doc_lengths(docs).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg("doc_len"), 4).alias("avgdl"),
    )


def q_phrase_match(spark: SparkSession, sf: str) -> DataFrame:
    return bm25_ops.phrase_match(_docs(spark, sf), ["key", "order"])


def q_prefix_terms(spark: SparkSession, sf: str) -> DataFrame:
    postings = post_ops.build_postings(_docs(spark, sf), positions=False)
    return bm25_ops.prefix_match_terms(postings, "sc")


def q_wildcard_docs(spark: SparkSession, sf: str) -> DataFrame:
    postings = post_ops.build_postings(_docs(spark, sf), positions=False)
    return bm25_ops.wildcard_match(postings, "wind")


def q_salted_term_df(spark: SparkSession, sf: str) -> DataFrame:
    return (
        post_ops.salted_term_doc_counts(_docs(spark, sf), n_salts=8)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# relational operators (SURVEY.md §2.4-2.7) on the TPC-H-ish tables
# ---------------------------------------------------------------------------

def q_top_orders(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _tbl(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("o_totalprice"))
    )


def q_window_rank(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _tbl(spark, sf, "orders")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


def q_agg_pricing(spark: SparkSession, sf: str) -> DataFrame:
    li = _tbl(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


def q_join_revenue_by_segment(spark: SparkSession, sf: str) -> DataFrame:
    cust = _tbl(spark, sf, "customer")
    orders = _tbl(spark, sf, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.count("*").cast("long").alias("n_orders"),
        )
    )


def q_semi_join_customers(spark: SparkSession, sf: str) -> DataFrame:
    cust = _tbl(spark, sf, "customer")
    orders = _tbl(spark, sf, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


def q_tier_boost(spark: SparkSession, sf: str) -> DataFrame:
    """L11-style tier boosts: reference multiplies AC scores ×2.0 (tier 0) /
    ×1.5 (tier 1); here event_type plays the tier role."""
    ev = _tbl(spark, sf, "events")
    boosted = ev.withColumn(
        "boosted",
        F.col("value")
        * F.when(F.col("event_type") == "purchase", 2.0)
        .when(F.col("event_type") == "click", 1.5)
        .otherwise(1.0),
    )
    return boosted.groupBy("event_type").agg(
        F.round(F.sum("boosted"), 4).alias("sum_boosted"),
        F.count("*").cast("long").alias("n"),
    )


def q_score_fusion(spark: SparkSession, sf: str) -> DataFrame:
    """A4 weighted fusion (0.6 ac + 0.4 vec, +0.1 both-present bonus) over two
    per-user score sets derived from events (click avg = 'ac', view avg =
    'vec'); mirrors _combine_results semantics."""
    ev = _tbl(spark, sf, "events")
    ac = ev.where(F.col("event_type") == "click").groupBy("user_id").agg(
        F.avg("value").alias("ac_score")
    )
    vec = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.avg("value").alias("vec_score")
    )
    fused = (
        ac.join(vec, "user_id", "full_outer")
        .withColumn(
            "fused",
            F.coalesce(F.col("ac_score"), F.lit(0.0)) * 0.6
            + F.coalesce(F.col("vec_score"), F.lit(0.0)) * 0.4
            + F.when(
                F.col("ac_score").isNotNull() & F.col("vec_score").isNotNull(), 0.1
            ).otherwise(0.0),
        )
    )
    return (
        fused.select("user_id", F.round("fused", 4).alias("fused"))
        .orderBy(F.desc("fused"), F.asc("user_id"))
        .limit(50)
    )


def q_percentile_latency(spark: SparkSession, sf: str) -> DataFrame:
    """A5/W4: exact p50/p95 per event_type (reference keeps rolling p95)."""
    ev = _tbl(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.95), 4).alias("p95"),
    )


def q_dis_max(spark: SparkSession, sf: str) -> DataFrame:
    """L2 dis-max combine (tie_breaker=0.3) of two per-user field scores."""
    ev = _tbl(spark, sf, "events")
    f1 = ev.where(F.col("event_type") == "click").groupBy("user_id").agg(
        F.avg("value").alias("score")
    ).select(F.col("user_id").alias("doc_id"), "score")
    f2 = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.avg("value").alias("score")
    ).select(F.col("user_id").alias("doc_id"), "score")
    return bm25_ops.dis_max([f1, f2], tie_breaker=0.3).select(
        F.col("doc_id").alias("user_id"), F.round("score", 4).alias("score")
    )


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over the sf0.001 documents corpus."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk": q_bm25_topk,
        "postings_tf": q_postings_tf,
        "term_df_top20": q_term_df_top20,
        "corpus_stats": q_corpus_stats,
        "phrase_match": q_phrase_match,
        "prefix_terms": q_prefix_terms,
        "wildcard_docs": q_wildcard_docs,
        "salted_term_df": q_salted_term_df,
        "top_orders": q_top_orders,
        "window_rank": q_window_rank,
        "agg_pricing": q_agg_pricing,
        "join_revenue_by_segment": q_join_revenue_by_segment,
        "semi_join_customers": q_semi_join_customers,
        "tier_boost": q_tier_boost,
        "score_fusion": q_score_fusion,
        "percentile_latency": q_percentile_latency,
        "dis_max": q_dis_max,
    }


def oracle_sql() -> dict[str, str]:
    terms_values = ", ".join(f"('{t}')" for t in BM25_QUERY_TERMS)
    terms_in = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)
    return {
        "bm25_topk": f"""
WITH {_ORACLE_TOKS},
stats AS (SELECT count(*)::DOUBLE AS n, avg(doc_len) AS avgdl FROM dl),
q(term) AS (VALUES {terms_values}),
tdf AS (SELECT term, count(*)::DOUBLE AS df FROM tfs WHERE term IN (SELECT term FROM q) GROUP BY 1),
scored AS (
  SELECT t.doc_id,
         ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * (1.2 + 1.0)) / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.doc_len / s.avgdl)) AS ts
  FROM tfs t
  JOIN tdf d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id, round(sum(ts), 4) AS score, count(*)::INT AS n_terms_matched
FROM scored GROUP BY doc_id
ORDER BY sum(ts) DESC, doc_id LIMIT 10
""",
        "postings_tf": f"""
WITH {_ORACLE_TOKS}
SELECT term, doc_id, tf FROM tfs WHERE term IN ({terms_in})
""",
        "term_df_top20": f"""
WITH {_ORACLE_TOKS}
SELECT term, count(*)::BIGINT AS df FROM tfs GROUP BY term
ORDER BY df DESC, term LIMIT 20
""",
        "corpus_stats": f"""
WITH {_ORACLE_TOKS}
SELECT count(*)::BIGINT AS n_docs, round(avg(doc_len), 4) AS avgdl FROM dl
""",
        "phrase_match": f"""
WITH {_ORACLE_TOKS},
pos AS (
  SELECT doc_id, generate_subscripts(tokens, 1) AS i, unnest(tokens) AS tok FROM toks
)
SELECT a.doc_id, count(*)::INT AS n_occurrences
FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
WHERE a.tok = 'key' AND b.tok = 'order'
GROUP BY a.doc_id
""",
        "prefix_terms": f"""
WITH {_ORACLE_TOKS}
SELECT DISTINCT term FROM tfs WHERE term LIKE 'sc%' AND length(term) >= 2
""",
        "wildcard_docs": f"""
WITH {_ORACLE_TOKS}
SELECT DISTINCT doc_id FROM tfs WHERE term LIKE 'wind%'
""",
        "salted_term_df": f"""
WITH {_ORACLE_TOKS}
SELECT term, count(*)::BIGINT AS df FROM tfs GROUP BY term
ORDER BY df DESC, term LIMIT 20
""",
        "top_orders": """
SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
        "window_rank": """
SELECT o_custkey, o_orderkey, rnk FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)::INT AS rnk
  FROM orders
) WHERE rnk <= 3
""",
        "agg_pricing": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       count(*)::BIGINT AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "join_revenue_by_segment": """
SELECT c_mktsegment, round(sum(o_totalprice), 4) AS revenue, count(*)::BIGINT AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
        "semi_join_customers": """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
        "tier_boost": """
SELECT event_type,
       round(sum(value * CASE event_type WHEN 'purchase' THEN 2.0 WHEN 'click' THEN 1.5 ELSE 1.0 END), 4) AS sum_boosted,
       count(*)::BIGINT AS n
FROM events GROUP BY event_type
""",
        "score_fusion": """
WITH ac AS (SELECT user_id, avg(value) AS ac_score FROM events WHERE event_type = 'click' GROUP BY user_id),
vec AS (SELECT user_id, avg(value) AS vec_score FROM events WHERE event_type = 'view' GROUP BY user_id),
fused AS (
  SELECT coalesce(ac.user_id, vec.user_id) AS user_id,
         coalesce(ac_score, 0.0) * 0.6 + coalesce(vec_score, 0.0) * 0.4
         + CASE WHEN ac_score IS NOT NULL AND vec_score IS NOT NULL THEN 0.1 ELSE 0.0 END AS f
  FROM ac FULL OUTER JOIN vec ON ac.user_id = vec.user_id
)
SELECT user_id, round(f, 4) AS fused FROM fused ORDER BY f DESC, user_id LIMIT 50
""",
        "percentile_latency": """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95
FROM events GROUP BY event_type
""",
        "dis_max": """
WITH f1 AS (SELECT user_id AS doc_id, avg(value) AS score FROM events WHERE event_type = 'click' GROUP BY user_id),
f2 AS (SELECT user_id AS doc_id, avg(value) AS score FROM events WHERE event_type = 'view' GROUP BY user_id),
u AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2)
SELECT doc_id AS user_id,
       round(max(score) + 0.3 * (sum(score) - max(score)), 4) AS score
FROM u GROUP BY doc_id
""",
    }
