"""Batch 4: REPARTITION-hint width pinning + q05 SHJ. sp=4, 16MB, AQE off.
Run SOLO: python scripts/perf_shapes4.py"""
import sys
import time

sys.path.insert(0, "/root/repo")
from ecom_snowflake_duckdb_migration_spark.queries import all_queries, run_sql
from ecom_snowflake_duckdb_migration_spark.session import get_spark

sf_dir = "/root/testdata/sf0.1"
BP = "10000"
BPS = f"CAST(floor((l_extendedprice * (1 - l_discount)) * {BP} + 0.5D) AS BIGINT)"

spark = get_spark(app_name="shapes4", shuffle_partitions=4,
    extra_conf={"spark.sql.files.maxPartitionBytes": str(16*1024*1024)})
spark.conf.set("spark.sql.adaptive.enabled", "false")
specs = all_queries()

def best_of(n, fn):
    best = None
    for _ in range(n):
        t0 = time.perf_counter(); fn(); dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best

def canon(tbl):
    names = sorted(tbl.column_names)
    return tbl.select(names).sort_by([(n, "ascending") for n in names]).to_pydict()

def t_sql(label, sql, base=None, n=7):
    try:
        tbl = run_sql(spark, sf_dir, sql).toArrow()
        ok = "" if base is None else f" equal={canon(tbl) == base}"
        t = best_of(n, lambda: run_sql(spark, sf_dir, sql).toArrow())
        print(f"{label:28s} {t*1000:7.1f}ms{ok}", flush=True)
    except Exception as e:
        print(f"{label:28s} FAILED {str(e)[:150]}", flush=True)

def base_of(name):
    return canon(specs[name].fn(spark, sf_dir).toArrow())

b24 = base_of("q24_grouped_column_reuse")
for w in (8, 16, 32):
    t_sql(f"q24 repart({w})", f"""
        SELECT /*+ SHUFFLE_HASH(o) */ o.o_orderkey, o.o_totalprice,
               CAST(round(o_totalprice * 100, 0) AS BIGINT)
                   div nullif(count(DISTINCT l.l_partkey), 0) AS price_cents_per_part
        FROM (SELECT /*+ REPARTITION({w}, o_orderkey) */ o_orderkey, o_totalprice FROM {{orders}}) o
        JOIN (SELECT /*+ REPARTITION({w}, l_orderkey) */ l_orderkey, l_partkey FROM {{lineitem}}) l
          ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_totalprice""", b24, n=5)

b06 = base_of("q06_multikey_min_price_join")
for w in (8, 16):
    t_sql(f"q06 window repart({w})", f"""
        SELECT l_suppkey, count(*) AS n_lines,
               count(CASE WHEN l_extendedprice = min_price THEN 1 END) AS n_at_min
        FROM (SELECT l_suppkey, l_extendedprice,
                     min(l_extendedprice) OVER (PARTITION BY l_partkey, l_suppkey) AS min_price
              FROM (SELECT /*+ REPARTITION({w}, l_partkey, l_suppkey) */
                           l_partkey, l_suppkey, l_extendedprice FROM {{lineitem}}))
        GROUP BY l_suppkey""", b06, n=5)

b05 = base_of("q05_nation_trade_roles")
t_sql("q05 shj16", f"""
    SELECT /*+ SHUFFLE_HASH(o), BROADCAST(c), BROADCAST(s), BROADCAST(cn), BROADCAST(sn) */
           cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           count(*) AS n_lines, CAST(sum({BPS}) / {BP}.0D AS DOUBLE) AS volume
    FROM (SELECT /*+ REPARTITION(16, l_orderkey) */ l_orderkey, l_suppkey, l_extendedprice, l_discount FROM {{lineitem}}) l
    JOIN (SELECT /*+ REPARTITION(16, o_orderkey) */ o_orderkey, o_custkey FROM {{orders}}) o ON o.o_orderkey = l.l_orderkey
    JOIN (SELECT c_custkey, c_nationkey FROM {{customer}}) c ON c.c_custkey = o.o_custkey
    JOIN (SELECT s_suppkey, s_nationkey FROM {{supplier}}) s ON s.s_suppkey = l.l_suppkey
    JOIN {{nation}} cn ON cn.n_nationkey = c.c_nationkey
    JOIN {{nation}} sn ON sn.n_nationkey = s.s_nationkey
    GROUP BY cn.n_name, sn.n_name""", b05, n=5)

b22 = base_of("q22_count_distinct_quirk")
# per-query sp via conf around the build (exchange width is baked at planning)
for sp in (8, 12):
    spark.conf.set("spark.sql.shuffle.partitions", str(sp))
    t_sql(f"q22 sp={sp}", """
        SELECT l_returnflag, count(DISTINCT l_quantity) AS review_count_quirk,
               count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_suppliers
        FROM {lineitem} GROUP BY l_returnflag""", b22, n=5)
spark.conf.set("spark.sql.shuffle.partitions", "4")

# q02 winner re-check + batchsize conf
b02 = base_of("q02_revenue_by_nation")
Q02V = f"""
    WITH per_cust AS (
        SELECT /*+ BROADCAST(o) */ o.o_custkey, sum({BPS}) AS _crev
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
    GROUP BY r.r_name, n.n_name"""
t_sql("q02 bcast_orders", Q02V, b02, n=5)
spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "16384")
t_sql("q02 bcast+batch16k", Q02V, b02, n=5)
b01 = base_of("q01_pricing_summary")
t_sql("q01 batch16k", f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(floor(l_quantity * {BP} + 0.5D) AS BIGINT)) / {BP}.0D AS DOUBLE) AS sum_qty0
    FROM {{lineitem}} WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus""", None, n=5)
spark.stop()
