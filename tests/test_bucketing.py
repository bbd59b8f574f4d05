"""Bucketed tables join without a shuffle — the co-located-join contract
of sinks.write_bucketed."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_pipeline_spark.io.sinks import write_bucketed
from spark_pipeline_spark.io.sources import read_file
from tests.conftest import SF_SMALL


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    o = read_file(spark, f"{SF_SMALL}/orders.parquet").select("o_orderkey", "o_custkey")
    c = read_file(spark, f"{SF_SMALL}/customer.parquet").select("c_custkey", "c_name")

    for tbl in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    write_bucketed(o, "b_orders", "o_custkey", 8, path=str(tmp_path / "b_orders"))
    write_bucketed(c, "b_customer", "c_custkey", 8, path=str(tmp_path / "b_customer"))

    # pin the plan to sort-merge so the assertion is about bucketing, not
    # broadcast/AQE rewrites
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and the result is the ordinary join result
        expected = o.join(c, o.o_custkey == c.c_custkey).count()
        assert joined.count() == expected
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        for tbl in ("b_orders", "b_customer"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
