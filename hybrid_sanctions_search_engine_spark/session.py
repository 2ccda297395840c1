"""SparkSession factory tuned for the local test harness.

At cluster scale the same settings apply, except parallelism-derived ones
(``spark.sql.shuffle.partitions``) which should track total executor cores.
AQE stays on so skewed shuffle partitions get split at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hybrid-fulltext-spark", cores: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` drives both the local master thread count and the shuffle
    partition count; defaults to $SPARK_GRAFT_CPUS or 32.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # tmpfs for shuffle/spill when available: the sandbox's virtual disk
    # serializes concurrent writers, which caps shuffle-heavy jobs well below
    # CPU speed (on a real cluster each executor has its own local disks)
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
        os.makedirs(local_dir, exist_ok=True)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    return builder.getOrCreate()
