"""Static-conf experiment: shuffle dirs on tmpfs + uncompressed shuffle.
Run SOLO in a fresh process."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from ecom_snowflake_duckdb_migration_spark.queries import all_queries
from ecom_snowflake_duckdb_migration_spark.session import get_spark

HEADLINE = ["q01_pricing_summary","q02_revenue_by_nation","q03_top_parts_by_revenue",
"q05_nation_trade_roles","q06_multikey_min_price_join","q07_dedup_keep_newest",
"q13_conditional_activity","q22_count_distinct_quirk","q24_grouped_column_reuse","q40_dedup_exact"]
sf_dir = "/root/testdata/sf0.1"

spark = get_spark(app_name="tmpfs", shuffle_partitions=8,
    extra_conf={
        "spark.sql.files.maxPartitionBytes": "4194304",
        "spark.local.dir": "/dev/shm/spark-local",
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
        "spark.sql.adaptive.enabled": "false",
    })

def best_of(n, fn):
    best = None
    for _ in range(n):
        t0 = time.perf_counter(); fn(); t1 = time.perf_counter()
        best = t1-t0 if best is None else min(best, t1-t0)
    return round(best, 4)

spark.range(1000).agg(F.sum("id")).toArrow()
mk = lambda: spark.range(1_000_000, numPartitions=4).withColumn("k", F.col("id") % 100).groupBy("k").agg(F.sum("id")).toArrow()
mk()
print("2-stage agg sp=8 tmpfs+nocompress:", best_of(5, mk))

specs = all_queries()
for n in HEADLINE:
    specs[n].fn(spark, "/root/testdata/sf0.001").toArrow()
    specs[n].fn(spark, sf_dir).toArrow()
out = {}
for n in HEADLINE:
    out[n] = best_of(3, lambda: specs[n].fn(spark, sf_dir).toArrow())
print({"total": round(sum(out.values()), 4), "q": out})
spark.stop()
