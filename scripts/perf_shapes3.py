"""Batch 3: q05/q06/q22/q24 deep variants under sp=4, split=16MB, AQE off.
Run SOLO: python scripts/perf_shapes3.py"""
import sys
import time

sys.path.insert(0, "/root/repo")
from ecom_snowflake_duckdb_migration_spark.queries import all_queries, run_sql
from ecom_snowflake_duckdb_migration_spark.session import get_spark

sf_dir = "/root/testdata/sf0.1"
BP = "10000"
BPS = f"CAST(floor((l_extendedprice * (1 - l_discount)) * {BP} + 0.5D) AS BIGINT)"

spark = get_spark(app_name="shapes3", shuffle_partitions=4,
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
        print(f"{label:28s} FAILED {str(e)[:120]}", flush=True)

def base_of(name):
    return canon(specs[name].fn(spark, sf_dir).toArrow())

# ---------- q06 ----------
b = base_of("q06_multikey_min_price_join")
t_sql("q06 base(window)", """
    SELECT l_suppkey, count(*) AS n_lines,
           count(CASE WHEN l_extendedprice = min_price THEN 1 END) AS n_at_min
    FROM (SELECT l_suppkey, l_extendedprice,
                 min(l_extendedprice) OVER (PARTITION BY l_partkey, l_suppkey) AS min_price
          FROM {lineitem})
    GROUP BY l_suppkey""", b)
spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "5000000")
t_sql("q06 cascade+OHA", """
    WITH per_price AS (
        SELECT l_partkey, l_suppkey, l_extendedprice, count(*) AS cnt
        FROM {lineitem} GROUP BY 1, 2, 3
    ),
    per_ps AS (
        SELECT l_suppkey, sum(cnt) AS n_lines, min_by(cnt, l_extendedprice) AS n_at_min
        FROM per_price GROUP BY l_partkey, l_suppkey
    )
    SELECT l_suppkey, CAST(sum(n_lines) AS BIGINT) AS n_lines,
           CAST(sum(n_at_min) AS BIGINT) AS n_at_min
    FROM per_ps GROUP BY l_suppkey""", b)
# struct-min trick: min(struct(price, 1-as-count...)) won't count ties; instead
# two plain hash aggs: (pk,sk)->min price via groupBy, rejoin via SHUFFLE_HASH
t_sql("q06 agg+shj", """
    WITH ps AS (
        SELECT l_partkey, l_suppkey, min(l_extendedprice) AS min_price
        FROM {lineitem} GROUP BY l_partkey, l_suppkey
    )
    SELECT /*+ SHUFFLE_HASH(ps) */ l.l_suppkey, count(*) AS n_lines,
           count(CASE WHEN l.l_extendedprice = ps.min_price THEN 1 END) AS n_at_min
    FROM {lineitem} l
    JOIN ps ON ps.l_partkey = l.l_partkey AND ps.l_suppkey = l.l_suppkey
    GROUP BY l.l_suppkey""", b)
# pure-hash-agg cascade without min_by: per (pk,sk): n_at_min = count of rows
# whose price equals the min -> two-level: first (pk,sk,price) counts, then
# use min(struct(price,cnt)).cnt (min over struct = lexicographic, price first)
t_sql("q06 structmin", """
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
    FROM per_ps GROUP BY l_suppkey""", b)

# ---------- q22 ----------
b = base_of("q22_count_distinct_quirk")
t_sql("q22 base(expand)", """
    SELECT l_returnflag, count(DISTINCT l_quantity) AS review_count_quirk,
           count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_suppliers
    FROM {lineitem} GROUP BY l_returnflag""", b)
for sp in (8, 16, 32):
    spark.conf.set("spark.sql.shuffle.partitions", str(sp))
    t_sql(f"q22 expand sp={sp}", """
        SELECT l_returnflag, count(DISTINCT l_quantity) AS review_count_quirk,
               count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_suppliers
        FROM {lineitem} GROUP BY l_returnflag""", b, n=5)
spark.conf.set("spark.sql.shuffle.partitions", "4")

# ---------- q24 ----------
b = base_of("q24_grouped_column_reuse")
t_sql("q24 base(shj)", """
    SELECT /*+ SHUFFLE_HASH(o) */ o.o_orderkey, o.o_totalprice,
           CAST(round(o_totalprice * 100, 0) AS BIGINT)
               div nullif(count(DISTINCT l.l_partkey), 0) AS price_cents_per_part
    FROM {orders} o JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice""", b)
for sp in (8, 16):
    spark.conf.set("spark.sql.shuffle.partitions", str(sp))
    t_sql(f"q24 shj sp={sp}", """
        SELECT /*+ SHUFFLE_HASH(o) */ o.o_orderkey, o.o_totalprice,
               CAST(round(o_totalprice * 100, 0) AS BIGINT)
                   div nullif(count(DISTINCT l.l_partkey), 0) AS price_cents_per_part
        FROM {orders} o JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_totalprice""", b, n=5)
spark.conf.set("spark.sql.shuffle.partitions", "4")
# distinct pre-collapse: dedup (orderkey, partkey) BEFORE the join, then plain count
t_sql("q24 dedup-first", """
    SELECT /*+ SHUFFLE_HASH(o) */ o.o_orderkey, o.o_totalprice,
           CAST(round(o_totalprice * 100, 0) AS BIGINT)
               div nullif(count(l.l_partkey), 0) AS price_cents_per_part
    FROM {orders} o
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM {lineitem}) l
      ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice""", b)

# ---------- q05 ----------
b = base_of("q05_nation_trade_roles")
for sp in (4, 8):
    spark.conf.set("spark.sql.shuffle.partitions", str(sp))
    t_sql(f"q05 premap sp={sp}", f"""
        SELECT /*+ BROADCAST(oc), BROADCAST(s), BROADCAST(sn) */
               oc.cust_nation, sn.n_name AS supp_nation,
               count(*) AS n_lines, CAST(sum({BPS}) / {BP}.0D AS DOUBLE) AS volume
        FROM {{lineitem}} l
        JOIN (
            SELECT /*+ BROADCAST(c), BROADCAST(cn) */ o.o_orderkey, cn.n_name AS cust_nation
            FROM {{orders}} o
            JOIN (SELECT c_custkey, c_nationkey FROM {{customer}}) c ON c.c_custkey = o.o_custkey
            JOIN {{nation}} cn ON cn.n_nationkey = c.c_nationkey
        ) oc ON oc.o_orderkey = l.l_orderkey
        JOIN (SELECT s_suppkey, s_nationkey FROM {{supplier}}) s ON s.s_suppkey = l.l_suppkey
        JOIN {{nation}} sn ON sn.n_nationkey = s.s_nationkey
        GROUP BY oc.cust_nation, sn.n_name""", b, n=5)
spark.conf.set("spark.sql.shuffle.partitions", "4")
# cascade: rollup lineitem per (orderkey, suppnation) first? suppnation via bcast s+sn;
# then SHUFFLE join with orders (no orders broadcast at all)
t_sql("q05 halfcascade", f"""
    WITH lsn AS (
        SELECT /*+ BROADCAST(s), BROADCAST(sn) */
               l.l_orderkey, sn.n_name AS supp_nation,
               count(*) AS n_l, sum({BPS}) AS vol_bp
        FROM {{lineitem}} l
        JOIN (SELECT s_suppkey, s_nationkey FROM {{supplier}}) s ON s.s_suppkey = l.l_suppkey
        JOIN {{nation}} sn ON sn.n_nationkey = s.s_nationkey
        GROUP BY l.l_orderkey, sn.n_name
    )
    SELECT /*+ BROADCAST(c), BROADCAST(cn) */
           cn.n_name AS cust_nation, lsn.supp_nation,
           CAST(sum(n_l) AS BIGINT) AS n_lines,
           CAST(sum(vol_bp) / {BP}.0D AS DOUBLE) AS volume
    FROM lsn
    JOIN {{orders}} o ON o.o_orderkey = lsn.l_orderkey
    JOIN (SELECT c_custkey, c_nationkey FROM {{customer}}) c ON c.c_custkey = o.o_custkey
    JOIN {{nation}} cn ON cn.n_nationkey = c.c_nationkey
    GROUP BY cn.n_name, lsn.supp_nation""", b)
spark.stop()
