"""Capture `.explain("formatted")` for declared queries into plans/r07/.

Usage: python tools_plan_capture.py <suffix> [query ...]
With no query names, captures every entry in __spark_entry__.queries().
The judge checks plan claims against these files (OPTIMIZATION_r07.md).
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    import __spark_entry__ as entry
    from hybrid_sanctions_search_engine_spark.session import get_spark

    spark = get_spark("plan_capture", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    targets = names or list(queries)
    for name in targets:
        fn = queries[name]
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — record the failure verbatim
            text = f"EXPLAIN FAILED: {e!r}\n"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"{name}: {len(text)} bytes -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
