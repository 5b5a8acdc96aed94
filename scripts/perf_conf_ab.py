"""Static-conf A/B for the bench profile: run the Spark headline set under a
conf overlay given as a JSON argv, print per-query + total. Run SOLO, one
process per conf (static confs like GC / local.dir / shuffle.compress only
take effect at JVM launch).

Usage: python scripts/perf_conf_ab.py '{"spark.driver.extraJavaOptions": "-XX:+UseParallelGC"}' [sf_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from ecom_snowflake_duckdb_migration_spark.queries import all_queries
from ecom_snowflake_duckdb_migration_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary", "q02_revenue_by_nation", "q03_top_parts_by_revenue",
    "q05_nation_trade_roles", "q06_multikey_min_price_join",
    "q07_dedup_keep_newest", "q13_conditional_activity",
    "q22_count_distinct_quirk", "q24_grouped_column_reuse", "q40_dedup_exact",
]

overlay = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
sf1_plus = "sf1" in os.path.basename(sf_dir.rstrip("/")) or "/sf1" in sf_dir

conf = {
    "spark.sql.files.maxPartitionBytes": "8388608" if sf1_plus else "16777216",
    "spark.sql.adaptive.enabled": "true" if sf1_plus else "false",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8388608",
}
conf.update(overlay)
spark = get_spark(
    app_name="conf_ab",
    shuffle_partitions=32 if sf1_plus else 4,
    extra_conf=conf,
)

specs = all_queries()

def best_of(n, fn):
    best = None
    for _ in range(n):
        t0 = time.perf_counter(); fn(); dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)

for name in HEADLINE:
    spec = specs[name]
    spec.fn(spark, "/root/testdata/sf0.001").toArrow()
    spec.fn(spark, sf_dir).toArrow()

timings = {}
for name in HEADLINE:
    spec = specs[name]
    timings[name] = best_of(5, lambda: spec.fn(spark, sf_dir).toArrow())

total = round(sum(timings.values()), 4)
print(json.dumps({"total": total, "queries": timings, "overlay": overlay}))
spark.stop()
