"""Clean conf grid with per-query job/stage counts. Run SOLO:
python scripts/perf_grid2.py
"""
import json, sys, time

sys.path.insert(0, "/root/repo")
from ecom_snowflake_duckdb_migration_spark.queries import all_queries, clear_load_cache
from ecom_snowflake_duckdb_migration_spark.session import get_spark

HEADLINE = ["q01_pricing_summary","q02_revenue_by_nation","q03_top_parts_by_revenue",
"q05_nation_trade_roles","q06_multikey_min_price_join","q07_dedup_keep_newest",
"q13_conditional_activity","q22_count_distinct_quirk","q24_grouped_column_reuse","q40_dedup_exact"]
sf_dir = "/root/testdata/sf0.1"

spark = get_spark(app_name="grid2", shuffle_partitions=8,
    extra_conf={"spark.sql.files.maxPartitionBytes": "4194304"})
specs = all_queries()
tracker = spark.sparkContext.statusTracker()

CONFS = [
    ("aqe8_4M",  {"spark.sql.adaptive.enabled": "true",  "spark.sql.shuffle.partitions": "8", "spark.sql.files.maxPartitionBytes": str(4<<20)}),
    ("noaqe8_4M",{"spark.sql.adaptive.enabled": "false", "spark.sql.shuffle.partitions": "8", "spark.sql.files.maxPartitionBytes": str(4<<20)}),
    ("noaqe4_16M",{"spark.sql.adaptive.enabled": "false","spark.sql.shuffle.partitions": "4", "spark.sql.files.maxPartitionBytes": str(16<<20)}),
    ("noaqe2_64M",{"spark.sql.adaptive.enabled": "false","spark.sql.shuffle.partitions": "2", "spark.sql.files.maxPartitionBytes": str(64<<20)}),
    ("noaqe1_64M",{"spark.sql.adaptive.enabled": "false","spark.sql.shuffle.partitions": "1", "spark.sql.files.maxPartitionBytes": str(64<<20)}),
    ("aqe2_64M", {"spark.sql.adaptive.enabled": "true",  "spark.sql.shuffle.partitions": "2", "spark.sql.files.maxPartitionBytes": str(64<<20)}),
    ("noaqe2_16M",{"spark.sql.adaptive.enabled": "false","spark.sql.shuffle.partitions": "2", "spark.sql.files.maxPartitionBytes": str(16<<20)}),
]

def jobs_stages(fn):
    before = set(tracker.getJobIdsForGroup(None) or [])
    fn()
    after = set(tracker.getJobIdsForGroup(None) or [])
    new = sorted(after - before)
    nstages = 0
    for j in new:
        ji = tracker.getJobInfo(j)
        if ji:
            nstages += len(ji.stageIds)
    return len(new), nstages

for label, conf in CONFS:
    for k, v in conf.items():
        spark.conf.set(k, v)
    clear_load_cache()
    # warm pass
    for n in HEADLINE:
        specs[n].fn(spark, sf_dir).toArrow()
    out, jobs = {}, {}
    for n in HEADLINE:
        nj, ns = jobs_stages(lambda: specs[n].fn(spark, sf_dir).toArrow())
        best = None
        for _ in range(3):
            t0 = time.perf_counter(); specs[n].fn(spark, sf_dir).toArrow(); t1 = time.perf_counter()
            best = t1-t0 if best is None else min(best, t1-t0)
        out[n] = round(best, 4)
        jobs[n] = f"{nj}j{ns}s"
    print(json.dumps({"conf": label, "total": round(sum(out.values()), 4), "q": out, "jobs": jobs}), flush=True)
spark.stop()
