"""Pin Spark local-mode per-job/per-stage floor costs. Run SOLO."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from ecom_snowflake_duckdb_migration_spark.queries import all_queries, clear_load_cache
from ecom_snowflake_duckdb_migration_spark.session import get_spark

spark = get_spark(app_name="floor", shuffle_partitions=8,
    extra_conf={"spark.sql.files.maxPartitionBytes": "4194304"})
spark.conf.set("spark.sql.adaptive.enabled", "false")
sf_dir = "/root/testdata/sf0.1"

def best_of(n, fn):
    best = None
    for _ in range(n):
        t0 = time.perf_counter(); fn(); t1 = time.perf_counter()
        best = t1-t0 if best is None else min(best, t1-t0)
    return round(best, 4)

# warm
spark.range(1000).agg(F.sum("id")).toArrow()
one_stage = spark.range(1_000_000, numPartitions=4).agg(F.sum("id"))
one_stage.toArrow()
print("1-stage agg (no shuffle):", best_of(5, lambda: one_stage.toArrow()))

for sp in (2, 8, 32):
    spark.conf.set("spark.sql.shuffle.partitions", str(sp))
    two = spark.range(1_000_000, numPartitions=4).withColumn("k", F.col("id") % 100).groupBy("k").agg(F.sum("id"))
    two.toArrow()
    print(f"2-stage agg sp={sp}:", best_of(5, lambda: spark.range(1_000_000, numPartitions=4).withColumn("k", F.col("id") % 100).groupBy("k").agg(F.sum("id")).toArrow()))

spark.conf.set("spark.sql.shuffle.partitions", "8")
# broadcast build cost: join big with tiny dim
nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
bj = lambda: lineitem.join(F.broadcast(nation), lineitem.l_suppkey % 25 == nation.n_nationkey).agg(F.count(F.lit(1))).toArrow()
bj()
print("scan+1broadcast join+agg:", best_of(5, bj))

# pure scan+count of lineitem
sc = lambda: lineitem.agg(F.count(F.lit(1))).toArrow()
sc()
print("lineitem scan+count:", best_of(5, sc))
# scan+count with wide projection (force read all cols)
sc2 = lambda: lineitem.agg(*[F.count(c).alias(c) for c in lineitem.columns]).toArrow()
sc2()
print("lineitem scan all cols count:", best_of(5, sc2))

# py4j+arrow floor: 0-job action
empty = spark.range(1)
empty.toArrow()
print("1-row range toArrow:", best_of(5, lambda: empty.toArrow()))

# shuffle compression off effect on a real query
specs = all_queries()
for label, conf in [("compress_on", "true"), ("compress_off", "false")]:
    spark.conf.set("spark.shuffle.compress", conf)
    spark.conf.set("spark.shuffle.spill.compress", conf)
    clear_load_cache()
    specs["q22_count_distinct_quirk"].fn(spark, sf_dir).toArrow()
    print(f"q22 {label}:", best_of(3, lambda: specs["q22_count_distinct_quirk"].fn(spark, sf_dir).toArrow()))
spark.stop()
