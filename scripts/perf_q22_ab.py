"""A/B q22 shapes: 3-branch UNION (three scans of lineitem) vs a
single-scan posexplode into (branch, word, bit) rows — same map-side
bit_or partial volume, one third the scan bandwidth.

Usage: python scripts/perf_q22_ab.py <sf_dir> [n=4]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from ecom_snowflake_duckdb_migration_spark.queries import all_queries, run_sql
from ecom_snowflake_duckdb_migration_spark.session import get_spark

Q22_ONESCAN = """
    WITH triples AS (
        SELECT l_returnflag, t.br, t.w, t.b
        FROM {lineitem}
        LATERAL VIEW explode(array(
            named_struct('br', 'q', 'w', CAST(l_quantity AS BIGINT) div 64,
                         'b', shiftleft(1L, CAST(l_quantity AS BIGINT) % 64)),
            named_struct('br', 'p', 'w', l_partkey div 64,
                         'b', shiftleft(1L, l_partkey % 64)),
            named_struct('br', 's', 'w', l_suppkey div 64,
                         'b', shiftleft(1L, l_suppkey % 64)))) t AS t
    ),
    agg AS (
        SELECT l_returnflag, br, w, bit_or(b) AS bits
        FROM triples GROUP BY 1, 2, 3
    )
    SELECT l_returnflag,
           CAST(sum(CASE WHEN br = 'q' THEN bit_count(bits) END) AS BIGINT) AS review_count_quirk,
           CAST(sum(CASE WHEN br = 'p' THEN bit_count(bits) END) AS BIGINT) AS n_parts,
           CAST(sum(CASE WHEN br = 's' THEN bit_count(bits) END) AS BIGINT) AS n_suppliers
    FROM agg GROUP BY l_returnflag
"""


def main() -> int:
    sf_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    os.makedirs("/dev/shm/spark-bench", exist_ok=True)
    sf1_plus = "sf0." not in sf_dir
    spark = get_spark(
        app_name="q22ab",
        shuffle_partitions=32 if sf1_plus else 4,
        extra_conf={
            "spark.sql.warehouse.dir": "/root/repo/spark-warehouse",
            "spark.sql.files.maxPartitionBytes": "8388608" if sf1_plus else "16777216",
            "spark.sql.adaptive.enabled": "true" if sf1_plus else "false",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8388608",
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
            "spark.local.dir": "/dev/shm/spark-bench",
        },
    )
    from ecom_snowflake_duckdb_migration_spark.sources.bucketed import (
        ensure_bucketed_facts,
    )

    ensure_bucketed_facts(spark, sf_dir, buckets=32 if sf1_plus else 16)
    specs = all_queries()
    variants = {
        "union3": lambda: specs["q22_count_distinct_quirk"].fn(spark, sf_dir).toArrow(),
        "onescan": lambda: run_sql(spark, sf_dir, Q22_ONESCAN).toArrow(),
    }
    a, b = variants["union3"](), variants["onescan"]()
    ka = sorted(zip(*[a.column(i).to_pylist() for i in range(a.num_columns)]))
    kb = sorted(zip(*[b.column(b.schema.get_field_index(nm)).to_pylist() for nm in a.schema.names]))
    assert ka == kb, "variant results differ"
    print("parity ok:", ka, flush=True)
    best: dict[str, float] = {}
    for _p in range(2):
        for name, fn in variants.items():
            for _ in range(max(1, n // 2)):
                t0 = time.perf_counter()
                fn()
                dt = time.perf_counter() - t0
                best[name] = min(best.get(name, 1e9), dt)
                print(f"{name}: {dt:.3f}", flush=True)
    print({k: round(v, 3) for k, v in best.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
