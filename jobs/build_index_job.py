"""spark-submit entry point: build (or resume) the compressed inverted index.

    spark-submit --py-files hse.zip jobs/build_index_job.py \
        --input /path/to/documents_parquet_or_iceberg_table \
        --index-dir /path/to/index --n-shards 512 --positions

On a cluster, package the library with
``cd /root/repo && zip -r hse.zip hybrid_sanctions_search_engine_spark`` and
pass it via ``--py-files``; the job reads its input either as a parquet path
or (with ``--table``) an Iceberg/catalog table name.  The build is resumable:
re-submitting after a failure skips shards whose ``_manifest.json`` is
complete.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="parquet path or table name")
    parser.add_argument("--table", action="store_true", help="treat --input as a catalog table")
    parser.add_argument("--index-dir", required=True)
    parser.add_argument("--n-shards", type=int, default=64)
    parser.add_argument("--chunk-bits", type=int, default=20)
    parser.add_argument("--positions", action="store_true")
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--no-resume", action="store_true")
    args = parser.parse_args()

    from pyspark.sql import SparkSession

    from hybrid_sanctions_search_engine_spark.sources.index_io import build_index

    spark = SparkSession.builder.appName("build-inverted-index").getOrCreate()
    docs = (
        spark.read.table(args.input) if args.table else spark.read.parquet(args.input)
    )
    report = build_index(
        docs,
        args.index_dir,
        n_shards=args.n_shards,
        chunk_bits=args.chunk_bits,
        text_col=args.text_col,
        resume=not args.no_resume,
        store_positions=args.positions,
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
