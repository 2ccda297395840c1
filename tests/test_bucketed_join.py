"""Bucketed co-located joins: the pay-the-shuffle-once standing-table shape.

The brief's scale checklist calls for bucketing for co-located joins; this
pins the actual physical-plan property — a join between two tables bucketed
on the join key contains NO shuffle exchange (both sides scan bucket-aligned
files), while the same join over plain parquet shuffles both sides.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hybrid_sanctions_search_engine_spark.sources.tables import write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_smoke_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("bucketed_wh")
    cust = spark.read.parquet(os.path.join(sf_smoke_dir, "customer.parquet"))
    orders = spark.read.parquet(os.path.join(sf_smoke_dir, "orders.parquet"))
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "custkey"), "cust_b", "custkey", 8,
        path=str(warehouse / "cust_b"),
    )
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"), "orders_b", "custkey", 8,
        path=str(warehouse / "orders_b"),
    )
    yield cust, orders
    spark.sql("DROP TABLE IF EXISTS cust_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    cust, orders = bucketed
    # disable broadcast so the join strategy question is real (SMJ vs SMJ)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j_bucketed = (
            spark.table("cust_b")
            .join(spark.table("orders_b"), "custkey")
            .groupBy("c_mktsegment")
            .agg(F.sum("o_totalprice").alias("rev"))
        )
        j_plain = (
            cust.withColumnRenamed("c_custkey", "custkey")
            .join(orders.withColumnRenamed("o_custkey", "custkey"), "custkey")
            .groupBy("c_mktsegment")
            .agg(F.sum("o_totalprice").alias("rev"))
        )
        # the bucketed join itself is exchange-free (only the final groupBy
        # aggregation may shuffle); the plain join shuffles both join sides
        assert _n_exchanges(j_bucketed) < _n_exchanges(j_plain)
        plan = j_bucketed._jdf.queryExecution().executedPlan().toString()
        before_agg = plan.split("HashAggregate")[-1]  # below the agg = the join
        assert "Exchange hashpartitioning(custkey" not in before_agg
        # and values are identical
        a = sorted((r["c_mktsegment"], round(r["rev"], 4)) for r in j_bucketed.collect())
        b = sorted((r["c_mktsegment"], round(r["rev"], 4)) for r in j_plain.collect())
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
