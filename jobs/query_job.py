"""spark-submit entry point: serve top-k BM25 / phrase queries from an index.

    spark-submit --py-files hse.zip jobs/query_job.py \
        --index-dir /path/to/index --query "spark join" --k 10
    spark-submit ... --queries-file queries.tsv --k 10      # batch: id\\tquery
    spark-submit ... --phrase "key order"
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--index-dir", required=True)
    parser.add_argument("--query")
    parser.add_argument("--phrase")
    parser.add_argument("--queries-file", help="TSV of query_id<TAB>query")
    parser.add_argument("--docs", help="documents parquet (needed for batch mode)")
    parser.add_argument("--k", type=int, default=10)
    args = parser.parse_args()

    from pyspark.sql import SparkSession

    from hybrid_sanctions_search_engine_spark.plans.wand import (
        phrase_search,
        topk_search,
    )

    spark = SparkSession.builder.appName("bm25-query").getOrCreate()
    if args.phrase:
        res = phrase_search(spark, args.index_dir, args.phrase)
    elif args.queries_file:
        from hybrid_sanctions_search_engine_spark.operators.bm25 import batch_topk

        queries = []
        with open(args.queries_file) as fh:
            for line in fh:
                qid, q = line.rstrip("\n").split("\t", 1)
                queries.append((int(qid), q))
        docs = spark.read.parquet(args.docs)
        res = batch_topk(docs, queries, k=args.k)
    else:
        res = topk_search(spark, args.index_dir, args.query or "", k=args.k)
    for row in res.collect():
        print(json.dumps(row.asDict()))
    spark.stop()


if __name__ == "__main__":
    main()
