"""One-session grid over runtime confs for the bench profile.
Run SOLO: python scripts/perf_grid3.py"""
import sys
import time

sys.path.insert(0, "/root/repo")
from ecom_snowflake_duckdb_migration_spark.queries import all_queries, clear_load_cache
from ecom_snowflake_duckdb_migration_spark.session import get_spark

sf_dir = "/root/testdata/sf0.1"
HEAD = ["q01_pricing_summary","q02_revenue_by_nation","q03_top_parts_by_revenue",
"q05_nation_trade_roles","q06_multikey_min_price_join","q07_dedup_keep_newest",
"q13_conditional_activity","q22_count_distinct_quirk","q24_grouped_column_reuse","q40_dedup_exact"]

spark = get_spark(app_name="grid3", shuffle_partitions=8,
    extra_conf={"spark.sql.files.maxPartitionBytes": "4194304"})
specs = all_queries()
for n in HEAD:
    specs[n].fn(spark, "/root/testdata/sf0.001").toArrow()
    specs[n].fn(spark, sf_dir).toArrow()

def run_config(aqe, sp, split, n=3):
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    spark.conf.set("spark.sql.shuffle.partitions", str(sp))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    tot = 0.0
    per = {}
    for name in HEAD:
        fn = specs[name].fn
        fn(spark, sf_dir).toArrow()  # warm under this conf
        best = None
        for _ in range(n):
            t0 = time.perf_counter(); fn(spark, sf_dir).toArrow()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        per[name] = round(best, 3)
        tot += best
    print(f"aqe={aqe} sp={sp:3d} split={split//1048576}MB total={tot:6.3f} {per}", flush=True)
    return tot

for sp in (2, 4, 8, 16):
    run_config("false", sp, 4 * 1048576)
run_config("true", 8, 4 * 1048576)
run_config("true", 32, 4 * 1048576)
# split sweep at sp=4
for split in (2, 8, 16):
    run_config("false", 4, split * 1048576)
spark.stop()
