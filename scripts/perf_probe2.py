"""Split fresh-query cost into: Catalyst planning vs first execution vs
prepared re-execution (fresh physical plan from the cached optimized logical
plan -> new shuffle IDs -> NO stage skipping).

Run: python scripts/perf_probe2.py
"""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import DataFrame

from ecom_snowflake_duckdb_migration_spark.queries import all_queries
from ecom_snowflake_duckdb_migration_spark.session import get_spark

HEADLINE = ["q01_pricing_summary","q02_revenue_by_nation","q03_top_parts_by_revenue",
"q05_nation_trade_roles","q06_multikey_min_price_join","q07_dedup_keep_newest",
"q13_conditional_activity","q22_count_distinct_quirk","q24_grouped_column_reuse","q40_dedup_exact"]

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="probe2", shuffle_partitions=8,
    extra_conf={"spark.sql.files.maxPartitionBytes": "4194304",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8388608"})
specs = all_queries()


def of_rows(plan):
    try:
        Dataset = spark._jvm.org.apache.spark.sql.classic.Dataset
        return DataFrame(Dataset.ofRows(spark._jsparkSession, plan), spark)
    except Exception:
        Dataset = spark._jvm.org.apache.spark.sql.Dataset
        return DataFrame(Dataset.ofRows(spark._jsparkSession, plan), spark)


# warm codegen/JIT at tiny scale + page cache at bench scale
for n in HEADLINE:
    specs[n].fn(spark, "/root/testdata/sf0.001").toArrow()
    specs[n].fn(spark, sf_dir).toArrow()

tracker = spark.sparkContext.statusTracker()

print(f"{'query':32s} {'plan':>7s} {'exec1':>7s} {'reexec':>7s} {'jobs_re':>7s}")
tp_tot = te_tot = tr_tot = 0.0
for n in HEADLINE:
    spec = specs[n]
    df = spec.fn(spark, sf_dir)
    t0 = time.perf_counter()
    df._jdf.queryExecution().executedPlan()
    opt = df._jdf.queryExecution().optimizedPlan()
    t1 = time.perf_counter()
    plan_t = t1 - t0
    t0 = time.perf_counter()
    df.toArrow()
    exec1 = time.perf_counter() - t0
    # prepared re-execution: fresh QueryExecution from the optimized plan
    best = None
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    for _ in range(3):
        t0 = time.perf_counter()
        of_rows(opt).toArrow()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    tp_tot += plan_t; te_tot += exec1; tr_tot += best
    print(f"{n:32s} {plan_t:7.4f} {exec1:7.4f} {best:7.4f}")
print(f"{'TOTAL':32s} {tp_tot:7.4f} {te_tot:7.4f} {tr_tot:7.4f}")

# sanity: prove re-execution is not stage-skipped — run q02 twice from the
# same optimized plan and show stage counts per job are stable
import json
q2 = specs["q02_revenue_by_nation"].fn(spark, sf_dir)
opt2 = q2._jdf.queryExecution().optimizedPlan()
for i in range(2):
    before = set(tracker.getActiveStageIds() or [])
    jb = tracker.getJobIdsForGroup(None) or []
    of_rows(opt2).toArrow()
    ja = tracker.getJobIdsForGroup(None) or []
    new_jobs = sorted(set(ja) - set(jb))
    stages = []
    for j in new_jobs:
        ji = tracker.getJobInfo(j)
        if ji:
            stages.extend(ji.stageIds)
    print(f"run {i}: new_jobs={len(new_jobs)} stages={len(stages)}")
spark.stop()
