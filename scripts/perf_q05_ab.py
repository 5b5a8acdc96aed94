"""A/B q05 shapes at a large SF: current (4 broadcast probes) vs
pre-joined dim maps (customer|supplier each pre-joined to nation and
broadcast as ONE map — 2 probes per fact row instead of 4).

Variants interleave within one process in blocks (bench protocol: blocks
beat round-robin for JIT, interleaving macro-passes cancels host-noise
windows). Usage: python scripts/perf_q05_ab.py <sf_dir> [n=4]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from ecom_snowflake_duckdb_migration_spark.queries import all_queries, run_sql
from ecom_snowflake_duckdb_migration_spark.queries.catalog_core import BP, _bucketed_facts
from ecom_snowflake_duckdb_migration_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    os.makedirs("/dev/shm/spark-bench", exist_ok=True)
    spark = get_spark(
        app_name="q05ab",
        shuffle_partitions=32,
        extra_conf={
            "spark.sql.warehouse.dir": "/root/repo/spark-warehouse",
            "spark.sql.files.maxPartitionBytes": "8388608",
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8388608",
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
            "spark.local.dir": "/dev/shm/spark-bench",
        },
    )
    from ecom_snowflake_duckdb_migration_spark.sources.bucketed import (
        ensure_bucketed_facts,
    )

    ensure_bucketed_facts(spark, sf_dir, buckets=32)
    specs = all_queries()
    bt = _bucketed_facts(spark, sf_dir)
    assert bt, "bucketed facts required for the A/B"

    lproj = (
        "SELECT l_orderkey, l_suppkey,"
        f" CAST(floor((l_extendedprice * (1 - l_discount)) * {BP} + 0.5D) AS BIGINT) AS _rev"
        f" FROM {bt['lineitem']}"
    )
    dimmap_sql = f"""
        SELECT /*+ MERGE(o), BROADCAST(cd), BROADCAST(sd) */
               cd.cust_nation, sd.supp_nation,
               count(*) AS n_lines,
               CAST(CAST(sum(l._rev) AS BIGINT) / {BP}.0D AS DOUBLE) AS volume
        FROM ({lproj}) l
        JOIN {bt['orders']} o ON o.o_orderkey = l.l_orderkey
        JOIN (SELECT /*+ BROADCAST(cn) */ c_custkey, cn.n_name AS cust_nation
              FROM {{customer}} c JOIN {{nation}} cn ON cn.n_nationkey = c.c_nationkey) cd
          ON cd.c_custkey = o.o_custkey
        JOIN (SELECT /*+ BROADCAST(sn) */ s_suppkey, sn.n_name AS supp_nation
              FROM {{supplier}} s JOIN {{nation}} sn ON sn.n_nationkey = s.s_nationkey) sd
          ON sd.s_suppkey = l.l_suppkey
        GROUP BY cd.cust_nation, sd.supp_nation
    """

    variants = {
        "current": lambda: specs["q05_nation_trade_roles"].fn(spark, sf_dir).toArrow(),
        "dimmap": lambda: run_sql(spark, sf_dir, dimmap_sql).toArrow(),
    }
    # sanity: identical results
    a = variants["current"]()
    b = variants["dimmap"]()
    ka = sorted(zip(*[a.column(i).to_pylist() for i in range(a.num_columns)]))
    kb = sorted(zip(*[b.column(i).to_pylist() for i in range(b.num_columns)]))
    assert ka == kb, "variant results differ"
    print("parity ok:", len(ka), "rows", flush=True)

    best: dict[str, float] = {}
    for _pass in range(2):
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
