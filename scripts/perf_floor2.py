"""Round-6 floor probe: where do the ~135 ms/query go at sf0.1, and which
protocol-legitimate levers shrink them?

Variants (Spark):
  A rebuild+toArrow   — current bench protocol (spec.fn per run)
  B prebuilt+toArrow  — build the DataFrame once, re-execute per run
  C prebuilt+cached   — B plus .cache() on the input relations
  D prebuilt+collect  — B but row collect() instead of Arrow

DuckDB:
  A views             — current protocol (execute per run on parquet views)
  B native tables     — CREATE TABLE AS read_parquet, execute per run

Usage: python scripts/perf_floor2.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5

HEADLINE = [
    "q01_pricing_summary", "q02_revenue_by_nation", "q03_top_parts_by_revenue",
    "q05_nation_trade_roles", "q06_multikey_min_price_join", "q07_dedup_keep_newest",
    "q13_conditional_activity", "q22_count_distinct_quirk", "q24_grouped_column_reuse",
    "q40_dedup_exact",
]


def blocked(fns, n=N):
    best = {}
    first = n - n // 2
    for pass_n in (first, n - first):
        for name, fn in fns.items():
            for _ in range(pass_n):
                t0 = time.perf_counter()
                fn()
                dt = time.perf_counter() - t0
                if name not in best or dt < best[name]:
                    best[name] = dt
    return {k: round(v, 4) for k, v in best.items()}


def main():
    import duckdb

    from ecom_snowflake_duckdb_migration_spark.queries import all_queries, clear_load_cache
    from ecom_snowflake_duckdb_migration_spark.session import get_spark

    specs = all_queries()

    # ---- DuckDB variants
    con = duckdb.connect()
    tables = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fns = {}
    for name in HEADLINE:
        sql = specs[name].oracle
        con.execute(sql).fetch_arrow_table()
        fns[name] = lambda sql=sql: con.execute(sql).fetch_arrow_table()
    duck_a = blocked(fns)

    con2 = duckdb.connect()
    for t in tables:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con2.execute(f"CREATE TABLE {t} AS SELECT * FROM read_parquet('{p}')")
    fns = {}
    for name in HEADLINE:
        sql = specs[name].oracle
        con2.execute(sql).fetch_arrow_table()
        fns[name] = lambda sql=sql: con2.execute(sql).fetch_arrow_table()
    duck_b = blocked(fns)

    # ---- Spark
    spark = get_spark(
        app_name="floor2", shuffle_partitions=4,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "16777216",
            "spark.sql.adaptive.enabled": "false",
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
        },
    )
    # warm codegen at sf0.001 then 3 passes at bench scale
    for name in HEADLINE:
        specs[name].fn(spark, "/root/testdata/sf0.001").toArrow()
    for _ in range(3):
        for name in HEADLINE:
            specs[name].fn(spark, SF_DIR).toArrow()

    spark_a = blocked({n_: (lambda s=specs[n_]: s.fn(spark, SF_DIR).toArrow()) for n_ in HEADLINE})

    pre = {n_: specs[n_].fn(spark, SF_DIR) for n_ in HEADLINE}
    for df in pre.values():
        df.toArrow()
    spark_b = blocked({n_: (lambda d=pre[n_]: d.toArrow()) for n_ in HEADLINE})
    spark_d = blocked({n_: (lambda d=pre[n_]: d.collect()) for n_ in HEADLINE})

    # C: cache inputs, rebuild prebuilt DFs on cached relations
    clear_load_cache()
    from ecom_snowflake_duckdb_migration_spark import queries as qmod
    orig_load = qmod.load

    cached = {}

    def load_cached(sp, sf_dir, table):
        key = (sf_dir, table)
        if key not in cached:
            cached[key] = orig_load(sp, sf_dir, table).cache()
        return cached[key]

    qmod.load = load_cached
    for mod in ("catalog_core", "catalog_llm", "catalog_ext", "catalog_sketches"):
        m = getattr(qmod, mod, None)
        if m is not None and hasattr(m, "load"):
            m.load = load_cached
    try:
        pre_c = {n_: specs[n_].fn(spark, SF_DIR) for n_ in HEADLINE}
        for df in pre_c.values():
            df.toArrow()  # materializes caches
        spark_c = blocked({n_: (lambda d=pre_c[n_]: d.toArrow()) for n_ in HEADLINE})
    finally:
        qmod.load = orig_load
        for mod in ("catalog_core", "catalog_llm", "catalog_ext", "catalog_sketches"):
            m = getattr(qmod, mod, None)
            if m is not None and hasattr(m, "load"):
                m.load = orig_load

    out = {
        "duck_views": duck_a, "duck_tables": duck_b,
        "spark_rebuild": spark_a, "spark_prebuilt": spark_b,
        "spark_prebuilt_cached": spark_c, "spark_collect": spark_d,
    }
    for k, v in out.items():
        print(f"{k:22s} total={sum(v.values()):.3f}  {v}")
    print(json.dumps({k: round(sum(v.values()), 4) for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
