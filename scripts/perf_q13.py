#!/usr/bin/env python
"""Probe q13 plan variants at a given SF dir (default benchdata/sf1).

Variants:
  cascade      current catalog shape: groupBy(day,user) -> groupBy(day)
  daypart      repartition(day) then both aggs partition-local (one exchange)
  expand       plain multi-distinct (Catalyst Expand x3)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ecom_snowflake_duckdb_migration_spark.queries.catalog_core import BP, to_bp, load
from ecom_snowflake_duckdb_migration_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf1"
N = 7


def cascade(spark):
    from ecom_snowflake_duckdb_migration_spark.queries.catalog_core import (
        q13_conditional_activity,
    )

    return q13_conditional_activity(spark, SF_DIR)


def _final_agg(per_user):
    return per_user.groupBy("day").agg(
        F.sum("n_purch").cast("long").alias("purchases"),
        F.count(F.when(F.col("n_purch") > 0, 1)).alias("purchasers"),
        F.sum("n_click").cast("long").alias("clicks"),
        F.count(F.lit(1)).alias("active_users"),
        (F.sum("val_bp") / F.lit(float(BP))).cast("double").alias("purchase_value"),
    )


def daypart(spark):
    e = load(spark, SF_DIR, "events").select(
        F.to_date("ts").alias("day"),
        "user_id",
        (F.col("event_type") == "purchase").alias("is_p"),
        (F.col("event_type") == "click").alias("is_c"),
        "value",
    )
    per_user = (
        e.repartition("day")
        .groupBy("day", "user_id")
        .agg(
            F.count(F.when(F.col("is_p"), 1)).alias("n_purch"),
            F.count(F.when(F.col("is_c"), 1)).alias("n_click"),
            F.sum(to_bp(F.when(F.col("is_p"), F.col("value")).otherwise(0))).alias("val_bp"),
        )
    )
    return _final_agg(per_user)


def expand(spark):
    e = load(spark, SF_DIR, "events")
    is_p = F.col("event_type") == "purchase"
    return e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.when(is_p, 1)).alias("purchases"),
        F.countDistinct(F.when(is_p, F.col("user_id"))).alias("purchasers"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
        F.countDistinct("user_id").alias("active_users"),
        (F.sum(to_bp(F.when(is_p, F.col("value")).otherwise(0))) / F.lit(float(BP)))
        .cast("double")
        .alias("purchase_value"),
    )


def main():
    sf1 = "sf1" in SF_DIR
    spark = get_spark(
        app_name="perf_q13",
        shuffle_partitions=32 if sf1 else 4,
        extra_conf={
            "spark.sql.adaptive.enabled": "true" if sf1 else "false",
            "spark.sql.files.maxPartitionBytes": "8388608" if sf1 else "16777216",
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
            "spark.local.dir": "/dev/shm/spark-bench",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8388608",
        },
    )
    variants = {"cascade": cascade, "daypart": daypart, "expand": expand}
    for name, fn in variants.items():
        for _ in range(4):
            fn(spark).toArrow()  # warm
        best = min(
            (lambda t0=time.perf_counter(): (fn(spark).toArrow(), time.perf_counter() - t0)[1])()
            for _ in range(N)
        )
        print(f"{name}: {best:.4f}s rows={fn(spark).count()}")
    spark.stop()


if __name__ == "__main__":
    main()
