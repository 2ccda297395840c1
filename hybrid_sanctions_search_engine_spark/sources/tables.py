"""Loaders for the harness tables (parquet dirs under $SPARK_GRAFT_SF_DIR).

At production scale these would be ``spark.read.table`` over Iceberg; the
parquet reader keeps identical semantics (columnar scan, predicate pushdown,
column pruning) at test scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def sf_dir(default: str = "/root/testdata/sf0.1") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_table(spark: SparkSession, name: str, directory: str | None = None) -> DataFrame:
    directory = directory or sf_dir()
    return spark.read.parquet(os.path.join(directory, f"{name}.parquet"))


def load_documents(spark: SparkSession, directory: str | None = None) -> DataFrame:
    return load_table(spark, "documents", directory)
