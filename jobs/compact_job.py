"""spark-submit entry point: fold streamed delta postings into the index.

    spark-submit --py-files hse.zip jobs/compact_job.py \
        --index-dir /path/to/index --delta-dir /path/to/delta_postings \
        [--keep-delta]

Merge-based: touched shards decode→merge→re-encode (no corpus
re-tokenization; see streaming/incremental.py::merge_compact).  The delta
directory is truncated after a successful compaction unless --keep-delta.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--index-dir", required=True)
    parser.add_argument("--delta-dir", required=True)
    parser.add_argument("--keep-delta", action="store_true")
    parser.add_argument("--cores", type=int, default=0, help="local[N] for testing")
    args = parser.parse_args()

    from hybrid_sanctions_search_engine_spark.session import get_spark
    from hybrid_sanctions_search_engine_spark.streaming.incremental import (
        load_delta_postings,
        merge_compact,
    )

    spark = get_spark("compact", cores=args.cores or None)
    delta = load_delta_postings(spark, args.delta_dir)
    if delta is None or delta.isEmpty():
        print(json.dumps({"status": "noop", "reason": "empty delta"}))
        return
    report = merge_compact(spark, args.index_dir, delta)
    if not args.keep_delta:
        shutil.rmtree(args.delta_dir, ignore_errors=True)
    print(json.dumps({"status": "ok", **report}))
    spark.stop()


if __name__ == "__main__":
    main()
