"""spark-submit entry point: serve top-k BM25 / phrase queries from an index.

    spark-submit --py-files hse.zip jobs/query_job.py \
        --index-dir /path/to/index --query "spark join" --k 10
    spark-submit ... --queries-file queries.tsv --k 10      # batch: id\\tquery
                                                            # (served off the
                                                            # compressed index;
                                                            # --docs switches to
                                                            # the document-side
                                                            # plan)
    spark-submit ... --phrase "key order" --slop 1
    spark-submit ... --phrases-file phrases.tsv --slop 1    # batch: id\\tphrase
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
    parser.add_argument("--phrases-file", help="TSV of query_id<TAB>phrase")
    parser.add_argument(
        "--docs",
        help="documents parquet — optional: switches batch mode to the "
        "document-side plan instead of the compressed index",
    )
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--slop", type=int, default=0)
    args = parser.parse_args()

    from pyspark.sql import SparkSession

    from hybrid_sanctions_search_engine_spark.plans.wand import (
        batch_phrase_search,
        batch_topk_indexed,
        phrase_search,
        topk_search,
    )

    def read_tsv(path):
        out = []
        with open(path) as fh:
            for line in fh:
                qid, q = line.rstrip("\n").split("\t", 1)
                out.append((int(qid), q))
        return out

    spark = SparkSession.builder.appName("bm25-query").getOrCreate()
    if args.phrase:
        res = phrase_search(spark, args.index_dir, args.phrase, slop=args.slop)
    elif args.phrases_file:
        res = batch_phrase_search(
            spark, args.index_dir, read_tsv(args.phrases_file), slop=args.slop
        )
    elif args.queries_file:
        queries = read_tsv(args.queries_file)
        if args.docs:
            from hybrid_sanctions_search_engine_spark.operators.bm25 import (
                batch_topk,
            )

            res = batch_topk(
                spark.read.parquet(args.docs), queries, k=args.k
            )
        else:
            # production batch serving: straight off the compressed index,
            # no corpus re-tokenize
            res = batch_topk_indexed(spark, args.index_dir, queries, k=args.k)
    else:
        res = topk_search(spark, args.index_dir, args.query or "", k=args.k)
    for row in res.collect():
        print(json.dumps(row.asDict()))
    spark.stop()


if __name__ == "__main__":
    main()
