"""Break down per-query cost: plan build vs execution (cached DataFrame),
under the bench conf. Run: python scripts/perf_probe.py"""
import os, sys, time
sys.path.insert(0, "/root/repo")
from ecom_snowflake_duckdb_migration_spark.queries import all_queries
from ecom_snowflake_duckdb_migration_spark.session import get_spark

HEADLINE = ["q01_pricing_summary","q02_revenue_by_nation","q03_top_parts_by_revenue",
"q05_nation_trade_roles","q06_multikey_min_price_join","q07_dedup_keep_newest",
"q13_conditional_activity","q22_count_distinct_quirk","q24_grouped_column_reuse","q40_dedup_exact"]

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="probe", shuffle_partitions=8,
    extra_conf={"spark.sql.files.maxPartitionBytes": "4194304",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8388608"})
specs = all_queries()
# warm
for n in HEADLINE:
    specs[n].fn(spark, "/root/testdata/sf0.001").toArrow()
    specs[n].fn(spark, sf_dir).toArrow()

print(f"{'query':32s} {'build':>7s} {'exec_cached':>11s} {'exec_fresh':>10s}")
tb_tot = tc_tot = tf_tot = 0.0
for n in HEADLINE:
    spec = specs[n]
    # build time: min-of-5 construction of the DataFrame (no action)
    tb = min((lambda: (time.perf_counter(), spec.fn(spark, sf_dir), time.perf_counter()))() and 0 or 0 for _ in range(1)) if False else None
    best_b = None
    for _ in range(5):
        t0 = time.perf_counter(); df = spec.fn(spark, sf_dir); t1 = time.perf_counter()
        best_b = t1-t0 if best_b is None else min(best_b, t1-t0)
    df = spec.fn(spark, sf_dir)
    df.toArrow()  # warm this exact DataFrame
    best_c = None
    for _ in range(5):
        t0 = time.perf_counter(); df.toArrow(); t1 = time.perf_counter()
        best_c = t1-t0 if best_c is None else min(best_c, t1-t0)
    best_f = None
    for _ in range(5):
        t0 = time.perf_counter(); spec.fn(spark, sf_dir).toArrow(); t1 = time.perf_counter()
        best_f = t1-t0 if best_f is None else min(best_f, t1-t0)
    tb_tot += best_b; tc_tot += best_c; tf_tot += best_f
    print(f"{n:32s} {best_b:7.4f} {best_c:11.4f} {best_f:10.4f}")
print(f"{'TOTAL':32s} {tb_tot:7.4f} {tc_tot:11.4f} {tf_tot:10.4f}")
spark.stop()
