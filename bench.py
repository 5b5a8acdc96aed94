#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. The driver records this per round
against BASELINE.md (target: within 2x of DuckDB on the same queries).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_parts_by_revenue",
    "q05_nation_trade_roles",
    "q06_multikey_min_price_join",
    "q07_dedup_keep_newest",
    "q13_conditional_activity",
    "q22_count_distinct_quirk",
    "q24_grouped_column_reuse",
    "q40_dedup_exact",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1)) if match else None

    from ecom_snowflake_duckdb_migration_spark.queries import all_queries
    from ecom_snowflake_duckdb_migration_spark.session import get_spark

    spark = get_spark(app_name="bench")
    specs = all_queries()

    # Warm up the JVM/codegen paths so per-query timings measure the engine,
    # not one-time class loading.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = specs.get(name)
        if spec is None:
            continue
        start = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        rows = df.collect()
        timings[name] = round(time.perf_counter() - start, 4)
        del rows

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
