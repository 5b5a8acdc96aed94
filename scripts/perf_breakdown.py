"""Per-query breakdown at bench config: fn-build time vs execute(toArrow)
time vs job count, AQE on/off. Run SOLO: python scripts/perf_breakdown.py"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from ecom_snowflake_duckdb_migration_spark.queries import all_queries
from ecom_snowflake_duckdb_migration_spark.session import get_spark

sf_dir = "/root/testdata/sf0.1"
HEADLINE = [
    "q01_pricing_summary", "q02_revenue_by_nation", "q03_top_parts_by_revenue",
    "q05_nation_trade_roles", "q06_multikey_min_price_join",
    "q07_dedup_keep_newest", "q13_conditional_activity",
    "q22_count_distinct_quirk", "q24_grouped_column_reuse", "q40_dedup_exact",
]

spark = get_spark(
    app_name="breakdown", shuffle_partitions=8,
    extra_conf={
        "spark.sql.files.maxPartitionBytes": "4194304",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8388608",
    },
)
sc = spark.sparkContext
specs = all_queries()

def best_of(n, fn):
    best = None
    for _ in range(n):
        t0 = time.perf_counter(); fn(); dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best

# Warm: small then target scale.
for name in HEADLINE:
    specs[name].fn(spark, "/root/testdata/sf0.001").toArrow()
    specs[name].fn(spark, sf_dir).toArrow()

for aqe in ("true", "false"):
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    rows = []
    for name in HEADLINE:
        spec = specs[name]
        # build-only: construct the DataFrame (parse+analyze), no action
        t_build = best_of(3, lambda: spec.fn(spark, sf_dir))
        df = spec.fn(spark, sf_dir)
        # warm once under this AQE setting
        df.toArrow()
        j0 = sc.statusTracker().getJobIdsForGroup(None)
        t_reuse = best_of(3, lambda: df.toArrow())          # pre-built plan
        t_full = best_of(3, lambda: spec.fn(spark, sf_dir).toArrow())
        njobs = len(sc.statusTracker().getJobIdsForGroup(None))
        rows.append((name, t_build, t_reuse, t_full))
    print(f"--- AQE={aqe}")
    tot_b = tot_r = tot_f = 0.0
    for name, b, r, f in rows:
        print(f"{name:32s} build={b*1000:6.1f}ms reuse_exec={r*1000:7.1f}ms full={f*1000:7.1f}ms")
        tot_b += b; tot_r += r; tot_f += f
    print(f"{'TOTAL':32s} build={tot_b*1000:6.1f}ms reuse_exec={tot_r*1000:7.1f}ms full={tot_f*1000:7.1f}ms")

# floor probes
empty = spark.range(1); empty.toArrow()
print("0-job-ish toArrow floor:", round(best_of(5, lambda: empty.toArrow()) * 1000, 1), "ms")
one = spark.range(1_000_000, numPartitions=4).selectExpr("sum(id) s"); one.toArrow()
print("1-stage agg exec:", round(best_of(5, lambda: one.toArrow()) * 1000, 1), "ms")
spark.stop()
