"""North-rule deployment contract: `spark-submit --py-files hse.zip`.

The whole job must run from a CLEAN working directory with the engine
shipped as a zip — driver and python workers both import the package from
`--py-files`, nothing from the repo checkout.  (Without the zip the
workers' cloudpickle by-reference imports fail with ModuleNotFoundError —
verified while writing this test.)"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_query_job_via_py_files(spark, sf_smoke_dir, tmp_path):
    from hybrid_sanctions_search_engine_spark.sources.index_io import build_index

    docs = spark.read.parquet(os.path.join(sf_smoke_dir, "documents.parquet"))
    index_dir = str(tmp_path / "idx")
    build_index(docs.limit(200), index_dir, n_shards=2, chunk_bits=7)

    workdir = tmp_path / "clean"
    workdir.mkdir()
    zip_path = str(workdir / "hse.zip")
    pkg_root = os.path.join(REPO, "hybrid_sanctions_search_engine_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in root:
                continue
            for f in files:
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    shutil.copy(os.path.join(REPO, "jobs", "query_job.py"), workdir)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            "spark-submit", "--master", "local[2]", "--py-files", "hse.zip",
            "query_job.py", "--index-dir", index_dir,
            "--query", "spark query", "--k", "3",
        ],
        cwd=str(workdir),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [
        json.loads(line)
        for line in proc.stdout.splitlines()
        if line.startswith("{")
    ]
    assert len(rows) == 3
    assert all("doc_id" in r and "score" in r for r in rows)
    # deterministic order contract survives the deployment boundary
    assert rows == sorted(rows, key=lambda r: (-r["score"], r["doc_id"]))
