"""Round 2 of shape probing under the best static config (AQE off, sp=4,
split=16MB): re-time winners n=7, bisect q05, q07 max_by, q01 scan floor.
Run SOLO: python scripts/perf_shapes2.py"""
import sys
import time

sys.path.insert(0, "/root/repo")
from ecom_snowflake_duckdb_migration_spark.queries import all_queries, run_sql
from ecom_snowflake_duckdb_migration_spark.session import get_spark

sf_dir = "/root/testdata/sf0.1"
BP = "10000"
BPS = f"CAST(floor((l_extendedprice * (1 - l_discount)) * {BP} + 0.5D) AS BIGINT)"

spark = get_spark(app_name="shapes2", shuffle_partitions=4,
    extra_conf={"spark.sql.files.maxPartitionBytes": str(16*1024*1024)})
spark.conf.set("spark.sql.adaptive.enabled", "false")
specs = all_queries()

def best_of(n, fn):
    best = None
    for _ in range(n):
        t0 = time.perf_counter(); fn(); dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best

def t_sql(label, sql, n=7):
    run_sql(spark, sf_dir, sql).toArrow()
    print(f"{label:28s} {best_of(n, lambda: run_sql(spark, sf_dir, sql).toArrow())*1000:7.1f}ms", flush=True)

def t_spec(name, n=7):
    fn = specs[name].fn
    fn(spark, sf_dir).toArrow()
    print(f"{name:28s} {best_of(n, lambda: fn(spark, sf_dir).toArrow())*1000:7.1f}ms", flush=True)

# --- bisect q05 cost ---
t_sql("scan lineitem count", "SELECT count(*) c FROM {lineitem}")
t_sql("scan li 3cols agg", f"SELECT l_suppkey % 10 k, sum({BPS}) s FROM {{lineitem}} GROUP BY l_suppkey % 10")
t_sql("li + s + sn bcast", f"""
    SELECT /*+ BROADCAST(s), BROADCAST(sn) */ sn.n_name, sum({BPS}) s
    FROM {{lineitem}} l
    JOIN (SELECT s_suppkey, s_nationkey FROM {{supplier}}) s ON s.s_suppkey = l.l_suppkey
    JOIN {{nation}} sn ON sn.n_nationkey = s.s_nationkey
    GROUP BY sn.n_name""")
t_sql("li + bcast orders", f"""
    SELECT /*+ BROADCAST(o) */ o.o_custkey % 10 k, sum({BPS}) s
    FROM {{lineitem}} l
    JOIN (SELECT o_orderkey, o_custkey FROM {{orders}}) o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_custkey % 10""")
t_sql("bcast orders build only", "SELECT /*+ BROADCAST(o) */ count(*) c FROM (SELECT o_orderkey FROM {orders} LIMIT 1) x JOIN (SELECT o_orderkey, o_custkey FROM {orders}) o ON x.o_orderkey = o.o_orderkey")

# --- q05 full variants ---
t_spec("q05_nation_trade_roles")
t_sql("q05 v_allbcast", f"""
    SELECT /*+ BROADCAST(o), BROADCAST(c), BROADCAST(s), BROADCAST(cn), BROADCAST(sn) */
           cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           count(*) AS n_lines, CAST(sum({BPS}) / {BP}.0D AS DOUBLE) AS volume
    FROM {{lineitem}} l
    JOIN (SELECT o_orderkey, o_custkey FROM {{orders}}) o ON o.o_orderkey = l.l_orderkey
    JOIN (SELECT c_custkey, c_nationkey FROM {{customer}}) c ON c.c_custkey = o.o_custkey
    JOIN (SELECT s_suppkey, s_nationkey FROM {{supplier}}) s ON s.s_suppkey = l.l_suppkey
    JOIN {{nation}} cn ON cn.n_nationkey = c.c_nationkey
    JOIN {{nation}} sn ON sn.n_nationkey = s.s_nationkey
    GROUP BY cn.n_name, sn.n_name""")
# order->cust_nation premapped on the broadcast side (one bcast of 150k x 2 ints)
t_sql("q05 v_premap", f"""
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
    GROUP BY oc.cust_nation, sn.n_name""")

# --- winners re-timed ---
t_spec("q02_revenue_by_nation")
t_sql("q02 v_bcast_orders", f"""
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
    GROUP BY r.r_name, n.n_name""")
t_spec("q03_top_parts_by_revenue")
t_sql("q03 v_agg_first", f"""
    SELECT /*+ BROADCAST(p) */ p.p_partkey, p.p_name,
           CAST(la.rev_bp / {BP}.0D AS DOUBLE) AS revenue,
           CAST(la.qty_bp / {BP}.0D AS DOUBLE) AS total_qty
    FROM (
        SELECT l_partkey, sum({BPS}) AS rev_bp,
               sum(CAST(floor(l_quantity * {BP} + 0.5D) AS BIGINT)) AS qty_bp
        FROM {{lineitem}} GROUP BY l_partkey
    ) la JOIN {{part}} p ON p.p_partkey = la.l_partkey
    ORDER BY revenue DESC, p_partkey LIMIT 10""")
t_spec("q13_conditional_activity")
t_sql("q13 v_cascade", f"""
    WITH per_user AS (
        SELECT to_date(ts) AS day, user_id,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purch,
               count(CASE WHEN event_type = 'click' THEN 1 END)    AS n_click,
               sum(CAST(floor((CASE WHEN event_type = 'purchase' THEN value ELSE 0D END) * {BP} + 0.5D) AS BIGINT)) AS val_bp
        FROM {{events}} GROUP BY to_date(ts), user_id
    )
    SELECT day, CAST(sum(n_purch) AS BIGINT) AS purchases,
           count(CASE WHEN n_purch > 0 THEN 1 END) AS purchasers,
           CAST(sum(n_click) AS BIGINT) AS clicks, count(*) AS active_users,
           CAST(sum(val_bp) / {BP}.0D AS DOUBLE) AS purchase_value
    FROM per_user GROUP BY day""")

# --- q07 max_by (no sort) ---
t_spec("q07_dedup_keep_newest")
t_sql("q07 v_maxby", """
    SELECT picked.user_id, picked.event_id, picked.event_type, picked.value, picked.ts
    FROM (
        SELECT max_by(named_struct('user_id', user_id, 'event_id', event_id,
                      'event_type', event_type, 'value', value, 'ts', ts),
                      struct(ts, event_id)) AS picked
        FROM {events} GROUP BY user_id
    )""")

# --- q22 / q06 / q24 / q01 / q40 base under this config ---
t_spec("q22_count_distinct_quirk")
t_spec("q06_multikey_min_price_join")
t_spec("q24_grouped_column_reuse")
t_spec("q01_pricing_summary")
t_spec("q40_dedup_exact")
spark.stop()
