"""sf1 config grid + q02 shape probes. Run SOLO: python scripts/perf_sf1.py"""
import sys
import time

sys.path.insert(0, "/root/repo")
from ecom_snowflake_duckdb_migration_spark.queries import all_queries, run_sql
from ecom_snowflake_duckdb_migration_spark.session import get_spark

sf_dir = "/root/repo/benchdata/sf1"
BP = "10000"
BPS = f"CAST(floor((l_extendedprice * (1 - l_discount)) * {BP} + 0.5D) AS BIGINT)"
HEAD = ["q01_pricing_summary","q02_revenue_by_nation","q03_top_parts_by_revenue",
"q05_nation_trade_roles","q06_multikey_min_price_join","q07_dedup_keep_newest",
"q13_conditional_activity","q22_count_distinct_quirk","q24_grouped_column_reuse","q40_dedup_exact"]

spark = get_spark(app_name="sf1", shuffle_partitions=32,
    extra_conf={"spark.sql.files.maxPartitionBytes": str(8*1024*1024)})
specs = all_queries()
for n in HEAD:
    specs[n].fn(spark, sf_dir).toArrow()

def best_of(n, fn):
    best = None
    for _ in range(n):
        t0 = time.perf_counter(); fn(); dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best

def run_config(aqe, sp, split, n=3):
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    spark.conf.set("spark.sql.shuffle.partitions", str(sp))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    tot = 0.0; per = {}
    for name in HEAD:
        fn = specs[name].fn
        fn(spark, sf_dir).toArrow()
        b = best_of(n, lambda: fn(spark, sf_dir).toArrow())
        per[name] = round(b, 3); tot += b
    print(f"aqe={aqe} sp={sp} split={split//1048576}MB total={tot:6.3f} {per}", flush=True)

run_config("false", 32, 8*1048576)
run_config("true", 32, 8*1048576)
run_config("false", 64, 8*1048576)
run_config("false", 32, 4*1048576)

# q02 shapes at sf1
spark.conf.set("spark.sql.adaptive.enabled", "false")
spark.conf.set("spark.sql.shuffle.partitions", "32")
spark.conf.set("spark.sql.files.maxPartitionBytes", str(8*1048576))

def canon(tbl):
    names = sorted(tbl.column_names)
    return tbl.select(names).sort_by([(n, "ascending") for n in names]).to_pydict()

base = canon(specs["q02_revenue_by_nation"].fn(spark, sf_dir).toArrow())

def t_sql(label, sql, n=3):
    try:
        tbl = run_sql(spark, sf_dir, sql).toArrow()
        ok = canon(tbl) == base
        print(f"{label:24s} {best_of(n, lambda: run_sql(spark, sf_dir, sql).toArrow())*1000:8.1f}ms equal={ok}", flush=True)
    except Exception as e:
        print(f"{label:24s} FAILED {str(e)[:120]}", flush=True)

t_sql("q02 shj-direct", f"""
    WITH per_cust AS (
        SELECT /*+ SHUFFLE_HASH(o) */ o.o_custkey, sum({BPS}) AS _crev
        FROM {{lineitem}} l
        JOIN (SELECT o_orderkey, o_custkey FROM {{orders}}) o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey
    )
    SELECT /*+ BROADCAST(c), BROADCAST(n), BROADCAST(r) */
           r.r_name, n.n_name,
           CAST(sum(_crev) / {BP}.0D AS DOUBLE) AS revenue, count(*) AS n_customers
    FROM per_cust pc
    JOIN {{customer}} c ON pc.o_custkey = c.c_custkey
    JOIN {{nation}} n ON n.n_nationkey = c.c_nationkey
    JOIN {{region}} r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name, n.n_name""")
t_sql("q02 cascade(cur)", f"""
    WITH lrev AS (
        SELECT l_orderkey, sum({BPS}) AS _rev
        FROM {{lineitem}} GROUP BY l_orderkey
    ),
    per_cust AS (
        SELECT o.o_custkey, sum(_rev) AS _crev
        FROM {{orders}} o JOIN lrev ON lrev.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey
    )
    SELECT /*+ BROADCAST(n), BROADCAST(r) */
           r.r_name, n.n_name,
           CAST(sum(_crev) / {BP}.0D AS DOUBLE) AS revenue, count(*) AS n_customers
    FROM per_cust pc
    JOIN {{customer}} c ON pc.o_custkey = c.c_custkey
    JOIN {{nation}} n ON n.n_nationkey = c.c_nationkey
    JOIN {{region}} r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name, n.n_name""")
t_sql("q02 cascade-shj", f"""
    WITH lrev AS (
        SELECT l_orderkey, sum({BPS}) AS _rev
        FROM {{lineitem}} GROUP BY l_orderkey
    ),
    per_cust AS (
        SELECT /*+ SHUFFLE_HASH(o) */ o.o_custkey, sum(_rev) AS _crev
        FROM {{orders}} o JOIN lrev ON lrev.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey
    )
    SELECT /*+ BROADCAST(n), BROADCAST(r) */
           r.r_name, n.n_name,
           CAST(sum(_crev) / {BP}.0D AS DOUBLE) AS revenue, count(*) AS n_customers
    FROM per_cust pc
    JOIN {{customer}} c ON pc.o_custkey = c.c_custkey
    JOIN {{nation}} n ON n.n_nationkey = c.c_nationkey
    JOIN {{region}} r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name, n.n_name""")
spark.stop()
