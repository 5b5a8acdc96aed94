"""sf1 batch 3: broadcast-threshold cap, q05 SHJ, q06/q22 cascades at scale.
Run SOLO: python scripts/perf_sf1b.py"""
import sys
import time

sys.path.insert(0, "/root/repo")
from ecom_snowflake_duckdb_migration_spark.queries import all_queries, run_sql
from ecom_snowflake_duckdb_migration_spark.session import get_spark

sf_dir = "/root/repo/benchdata/sf1"
BP = "10000"
BPS = f"CAST(floor((l_extendedprice * (1 - l_discount)) * {BP} + 0.5D) AS BIGINT)"

spark = get_spark(app_name="sf1b", shuffle_partitions=32,
    extra_conf={"spark.sql.files.maxPartitionBytes": str(8*1024*1024)})
spark.conf.set("spark.sql.adaptive.enabled", "true")
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

def t_sql(label, sql, base=None, n=5):
    try:
        tbl = run_sql(spark, sf_dir, sql).toArrow()
        ok = "" if base is None else f" equal={canon(tbl) == base}"
        t = best_of(n, lambda: run_sql(spark, sf_dir, sql).toArrow())
        print(f"{label:26s} {t*1000:8.1f}ms{ok}", flush=True)
    except Exception as e:
        print(f"{label:26s} FAILED {str(e)[:120]}", flush=True)

def t_spec(name, n=5, label=None):
    fn = specs[name].fn
    fn(spark, sf_dir).toArrow()
    fnl = label or name
    print(f"{fnl:26s} {best_of(n, lambda: fn(spark, sf_dir).toArrow())*1000:8.1f}ms", flush=True)

# baseline q05 under default 64MB threshold
t_spec("q05_nation_trade_roles", label="q05 base thr=64M")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(8*1024*1024))
t_spec("q05_nation_trade_roles", label="q05 base thr=8M")
b05 = canon(specs["q05_nation_trade_roles"].fn(spark, sf_dir).toArrow())
t_sql("q05 shj explicit", f"""
    SELECT /*+ SHUFFLE_HASH(o), BROADCAST(c), BROADCAST(s), BROADCAST(cn), BROADCAST(sn) */
           cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           count(*) AS n_lines, CAST(sum({BPS}) / {BP}.0D AS DOUBLE) AS volume
    FROM {{lineitem}} l
    JOIN (SELECT o_orderkey, o_custkey FROM {{orders}}) o ON o.o_orderkey = l.l_orderkey
    JOIN (SELECT c_custkey, c_nationkey FROM {{customer}}) c ON c.c_custkey = o.o_custkey
    JOIN (SELECT s_suppkey, s_nationkey FROM {{supplier}}) s ON s.s_suppkey = l.l_suppkey
    JOIN {{nation}} cn ON cn.n_nationkey = c.c_nationkey
    JOIN {{nation}} sn ON sn.n_nationkey = s.s_nationkey
    GROUP BY cn.n_name, sn.n_name""", b05)
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64*1024*1024))

# other heavy queries under the 8MB cap
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(8*1024*1024))
for q in ("q02_revenue_by_nation","q06_multikey_min_price_join","q22_count_distinct_quirk","q24_grouped_column_reuse","q13_conditional_activity","q07_dedup_keep_newest","q01_pricing_summary","q03_top_parts_by_revenue","q40_dedup_exact"):
    t_spec(q)
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64*1024*1024))

# q06 cascade at sf1 with OHA threshold bumped
b06 = canon(specs["q06_multikey_min_price_join"].fn(spark, sf_dir).toArrow())
spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "8000000")
t_sql("q06 structmin sf1", """
    WITH per_price AS (
        SELECT l_partkey, l_suppkey, l_extendedprice p, count(*) AS cnt
        FROM {lineitem} GROUP BY 1, 2, 3
    ),
    per_ps AS (
        SELECT l_suppkey, sum(cnt) AS n_lines, min(struct(p, cnt)).cnt AS n_at_min
        FROM per_price GROUP BY l_partkey, l_suppkey
    )
    SELECT l_suppkey, CAST(sum(n_lines) AS BIGINT) AS n_lines,
           CAST(sum(n_at_min) AS BIGINT) AS n_at_min
    FROM per_ps GROUP BY l_suppkey""", b06)

# q22 3-scan cascade at sf1
b22 = canon(specs["q22_count_distinct_quirk"].fn(spark, sf_dir).toArrow())
t_sql("q22 cascade sf1", """
    WITH q AS (SELECT l_returnflag, l_quantity v FROM {lineitem} GROUP BY 1, 2),
         p AS (SELECT l_returnflag, l_partkey  v FROM {lineitem} GROUP BY 1, 2),
         s AS (SELECT l_returnflag, l_suppkey  v FROM {lineitem} GROUP BY 1, 2),
         qq AS (SELECT l_returnflag, count(*) c FROM q GROUP BY 1),
         pp AS (SELECT l_returnflag, count(*) c FROM p GROUP BY 1),
         ss AS (SELECT l_returnflag, count(*) c FROM s GROUP BY 1)
    SELECT /*+ BROADCAST(pp), BROADCAST(ss) */
           qq.l_returnflag, qq.c AS review_count_quirk, pp.c AS n_parts, ss.c AS n_suppliers
    FROM qq JOIN pp ON qq.l_returnflag = pp.l_returnflag
            JOIN ss ON qq.l_returnflag = ss.l_returnflag""", b22)
spark.stop()
