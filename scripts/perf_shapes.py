"""Shape variants for the heavy headline queries: validate equality vs the
catalog shape, then time min-of-5. Run SOLO: python scripts/perf_shapes.py"""
import sys
import time

sys.path.insert(0, "/root/repo")
from ecom_snowflake_duckdb_migration_spark.queries import all_queries, run_sql
from ecom_snowflake_duckdb_migration_spark.session import get_spark

sf_dir = "/root/testdata/sf0.1"
BP = "10000"
BPS = f"CAST(floor((l_extendedprice * (1 - l_discount)) * {BP} + 0.5D) AS BIGINT)"

VARIANTS = {
    # Cascade below joins, but broadcast orders' 2-col projection so the
    # per-order rollup feeds a broadcast join instead of a shuffle join,
    # then broadcast customer too: ONE wide shuffle total (on o_custkey).
    "q02_revenue_by_nation": {
        "v_bcast_orders": f"""
            WITH per_cust AS (
                SELECT /*+ BROADCAST(o) */ o.o_custkey, sum({BPS}) AS _crev
                FROM {{lineitem}} l
                JOIN (SELECT o_orderkey, o_custkey FROM {{orders}}) o
                  ON l.l_orderkey = o.o_orderkey
                GROUP BY o.o_custkey
            )
            SELECT /*+ BROADCAST(c), BROADCAST(n), BROADCAST(r) */
                   r.r_name, n.n_name,
                   CAST(sum(_crev) / {BP}.0D AS DOUBLE) AS revenue,
                   count(*) AS n_customers
            FROM per_cust pc
            JOIN {{customer}} c ON pc.o_custkey = c.c_custkey
            JOIN {{nation}} n   ON n.n_nationkey = c.c_nationkey
            JOIN {{region}} r   ON r.r_regionkey = n.n_regionkey
            GROUP BY r.r_name, n.n_name
        """,
    },
    "q05_nation_trade_roles": {
        "v_allbcast": f"""
            SELECT /*+ BROADCAST(o), BROADCAST(c), BROADCAST(s), BROADCAST(cn), BROADCAST(sn) */
                   cn.n_name AS cust_nation, sn.n_name AS supp_nation,
                   count(*) AS n_lines,
                   CAST(sum({BPS}) / {BP}.0D AS DOUBLE) AS volume
            FROM {{lineitem}} l
            JOIN (SELECT o_orderkey, o_custkey FROM {{orders}}) o ON o.o_orderkey = l.l_orderkey
            JOIN (SELECT c_custkey, c_nationkey FROM {{customer}}) c ON c.c_custkey = o.o_custkey
            JOIN (SELECT s_suppkey, s_nationkey FROM {{supplier}}) s ON s.s_suppkey = l.l_suppkey
            JOIN {{nation}} cn  ON cn.n_nationkey = c.c_nationkey
            JOIN {{nation}} sn  ON sn.n_nationkey = s.s_nationkey
            GROUP BY cn.n_name, sn.n_name
        """,
    },
    # No Expand: cascade each distinct through a two-level aggregate.
    "q22_count_distinct_quirk": {
        "v_cascade": """
            WITH q AS (SELECT l_returnflag, l_quantity v FROM {lineitem} GROUP BY 1, 2),
                 p AS (SELECT l_returnflag, l_partkey  v FROM {lineitem} GROUP BY 1, 2),
                 s AS (SELECT l_returnflag, l_suppkey  v FROM {lineitem} GROUP BY 1, 2),
                 qq AS (SELECT l_returnflag, count(*) c FROM q GROUP BY 1),
                 pp AS (SELECT l_returnflag, count(*) c FROM p GROUP BY 1),
                 ss AS (SELECT l_returnflag, count(*) c FROM s GROUP BY 1)
            SELECT /*+ BROADCAST(pp), BROADCAST(ss) */
                   qq.l_returnflag,
                   qq.c AS review_count_quirk, pp.c AS n_parts, ss.c AS n_suppliers
            FROM qq JOIN pp ON qq.l_returnflag = pp.l_returnflag
                    JOIN ss ON qq.l_returnflag = ss.l_returnflag
        """,
    },
    # One shuffle: per-order distinct parts from lineitem alone, then
    # broadcast-join orders' 2-col projection.
    "q24_grouped_column_reuse": {
        "v_bcast_orders": """
            SELECT /*+ BROADCAST(o) */
                   o.o_orderkey, o.o_totalprice,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT)
                       div nullif(ld.n_parts, 0) AS price_cents_per_part
            FROM (
                SELECT l_orderkey, count(DISTINCT l_partkey) AS n_parts
                FROM {lineitem} GROUP BY l_orderkey
            ) ld
            JOIN (SELECT o_orderkey, o_totalprice FROM {orders}) o
              ON ld.l_orderkey = o.o_orderkey
        """,
    },
    # Two-level cascade instead of a window sort.
    "q06_multikey_min_price_join": {
        "v_cascade": """
            WITH per_price AS (
                SELECT l_partkey, l_suppkey, l_extendedprice, count(*) AS cnt
                FROM {lineitem} GROUP BY 1, 2, 3
            ),
            per_ps AS (
                SELECT l_suppkey, sum(cnt) AS n_lines,
                       min_by(cnt, l_extendedprice) AS n_at_min
                FROM per_price GROUP BY l_partkey, l_suppkey
            )
            SELECT l_suppkey, CAST(sum(n_lines) AS BIGINT) AS n_lines,
                   CAST(sum(n_at_min) AS BIGINT) AS n_at_min
            FROM per_ps GROUP BY l_suppkey
        """,
    },
    # Distincts are both over user_id: cascade through (day, user_id).
    "q13_conditional_activity": {
        "v_cascade": f"""
            WITH per_user AS (
                SELECT to_date(ts) AS day, user_id,
                       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purch,
                       count(CASE WHEN event_type = 'click' THEN 1 END)    AS n_click,
                       sum(CAST(floor((CASE WHEN event_type = 'purchase' THEN value ELSE 0D END) * {BP} + 0.5D) AS BIGINT)) AS val_bp
                FROM {{events}}
                GROUP BY to_date(ts), user_id
            )
            SELECT day,
                   CAST(sum(n_purch) AS BIGINT)            AS purchases,
                   count(CASE WHEN n_purch > 0 THEN 1 END) AS purchasers,
                   CAST(sum(n_click) AS BIGINT)            AS clicks,
                   count(*)                                AS active_users,
                   CAST(sum(val_bp) / {BP}.0D AS DOUBLE)   AS purchase_value
            FROM per_user GROUP BY day
        """,
    },
    # Aggregate lineitem by partkey BEFORE joining part (carry no p_name
    # through the agg), then broadcast part onto 20k rows.
    "q03_top_parts_by_revenue": {
        "v_agg_first": f"""
            SELECT /*+ BROADCAST(p) */
                   p.p_partkey, p.p_name,
                   CAST(la.rev_bp / {BP}.0D AS DOUBLE) AS revenue,
                   CAST(la.qty_bp / {BP}.0D AS DOUBLE) AS total_qty
            FROM (
                SELECT l_partkey, sum({BPS}) AS rev_bp,
                       sum(CAST(floor(l_quantity * {BP} + 0.5D) AS BIGINT)) AS qty_bp
                FROM {{lineitem}} GROUP BY l_partkey
            ) la
            JOIN {{part}} p ON p.p_partkey = la.l_partkey
            ORDER BY revenue DESC, p_partkey
            LIMIT 10
        """,
    },
}

spark = get_spark(app_name="shapes", shuffle_partitions=8,
    extra_conf={"spark.sql.files.maxPartitionBytes": "4194304"})
spark.conf.set("spark.sql.adaptive.enabled", "false")
specs = all_queries()

def best_of(n, fn):
    best = None
    for _ in range(n):
        t0 = time.perf_counter(); fn(); dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best

def canon(tbl):
    import pyarrow as pa
    names = sorted(tbl.column_names)
    tbl = tbl.select(names)
    return tbl.sort_by([(n, "ascending") for n in names]).to_pydict()

for qname, vs in VARIANTS.items():
    spec = specs[qname]
    base_tbl = spec.fn(spark, sf_dir).toArrow()
    base = canon(base_tbl)
    t_base = best_of(5, lambda: spec.fn(spark, sf_dir).toArrow())
    print(f"{qname}: base={t_base*1000:7.1f}ms", flush=True)
    for vname, sql in vs.items():
        try:
            tbl = run_sql(spark, sf_dir, sql).toArrow()
            ok = canon(tbl) == base
            t = best_of(5, lambda: run_sql(spark, sf_dir, sql).toArrow())
            print(f"  {vname:16s} {t*1000:7.1f}ms  equal={ok}", flush=True)
        except Exception as exc:
            print(f"  {vname:16s} FAILED: {exc}", flush=True)
spark.stop()
