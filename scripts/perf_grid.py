"""Conf grid for the bench: fresh-execution total under AQE on/off x sp x split."""
import itertools, os, sys, time, json
sys.path.insert(0, "/root/repo")

HEADLINE = ["q01_pricing_summary","q02_revenue_by_nation","q03_top_parts_by_revenue",
"q05_nation_trade_roles","q06_multikey_min_price_join","q07_dedup_keep_newest",
"q13_conditional_activity","q22_count_distinct_quirk","q24_grouped_column_reuse","q40_dedup_exact"]
sf_dir = "/root/testdata/sf0.1"

def run_conf(aqe, sp, split):
    # fresh JVM per conf would be ideal but slow; AQE etc are runtime confs? 
    # spark.sql.adaptive.enabled IS runtime-settable. shuffle.partitions too. maxPartitionBytes too.
    from ecom_snowflake_duckdb_migration_spark.queries import all_queries, clear_load_cache
    from ecom_snowflake_duckdb_migration_spark.session import get_spark
    spark = get_spark(app_name="grid", shuffle_partitions=8,
        extra_conf={"spark.sql.files.maxPartitionBytes": "4194304"})
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    spark.conf.set("spark.sql.shuffle.partitions", str(sp))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8388608")
    clear_load_cache()
    specs = all_queries()
    for n in HEADLINE:
        specs[n].fn(spark, sf_dir).toArrow()
    out = {}
    for n in HEADLINE:
        best = None
        for _ in range(3):
            t0 = time.perf_counter(); specs[n].fn(spark, sf_dir).toArrow(); t1 = time.perf_counter()
            best = t1-t0 if best is None else min(best, t1-t0)
        out[n] = round(best, 4)
    return out

confs = [(True,8,4<<20),(False,8,4<<20),(False,4,4<<20),(False,2,4<<20),(True,4,4<<20),(False,4,16<<20),(False,32,4<<20)]
for aqe, sp, split in confs:
    t = run_conf(aqe, sp, split)
    print(json.dumps({"aqe":aqe,"sp":sp,"split":split,"total":round(sum(t.values()),4),"q":t}))
