"""Decompose the ~100ms parquet scan-job floor. Run SOLO."""
import sys
import time

sys.path.insert(0, "/root/repo")
from ecom_snowflake_duckdb_migration_spark.session import get_spark

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="scanfloor", shuffle_partitions=4,
    extra_conf={"spark.sql.files.maxPartitionBytes": str(16*1024*1024)})
spark.conf.set("spark.sql.adaptive.enabled", "false")

def best_of(n, fn):
    best = None
    for _ in range(n):
        t0 = time.perf_counter(); fn(); dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best*1000, 1)

li = f"{sf_dir}/lineitem.parquet"
na = f"{sf_dir}/nation.parquet"

# warm
spark.read.parquet(li).count()
spark.read.parquet(na).count()

print("fresh-df li count():      ", best_of(7, lambda: spark.read.parquet(li).count()))
print("fresh-df nation count():  ", best_of(7, lambda: spark.read.parquet(na).count()))
df_li = spark.read.parquet(li)
print("same-df li count():       ", best_of(7, lambda: df_li.count()))
print("range(600k).count():      ", best_of(7, lambda: spark.range(600_000).count()))

for sp in (1, 4):
    spark.conf.set("spark.sql.shuffle.partitions", str(sp))
    print(f"sp={sp} li sum(qty) toArrow:", best_of(7, lambda: spark.read.parquet(li).selectExpr("sum(l_quantity) s").toArrow()))
spark.conf.set("spark.sql.shuffle.partitions", "4")

for key, val in [
    ("spark.sql.parquet.enableVectorizedReader", "false"),
    ("spark.sql.parquet.enableVectorizedReader", "true"),
    ("spark.sql.parquet.columnarReaderBatchSize", "16384"),
    ("spark.sql.parquet.aggregatePushdown", "true"),
]:
    spark.conf.set(key, val)
    print(f"{key}={val}: li count:", best_of(5, lambda: spark.read.parquet(li).count()),
          " 2col-agg:", best_of(5, lambda: spark.read.parquet(li).selectExpr("sum(l_quantity) s", "sum(l_extendedprice) p").toArrow()))
spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "4096")

# split sweep on the 2col agg
for mb in (2, 4, 8, 16, 32):
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(mb*1024*1024))
    print(f"split={mb}MB 2col-agg:", best_of(5, lambda: spark.read.parquet(li).selectExpr("sum(l_quantity) s", "sum(l_extendedprice) p").toArrow()))

# is it the arrow collect? same agg via .collect()
spark.conf.set("spark.sql.files.maxPartitionBytes", str(16*1024*1024))
print("2col-agg collect():", best_of(5, lambda: spark.read.parquet(li).selectExpr("sum(l_quantity) s", "sum(l_extendedprice) p").collect()))
spark.stop()
