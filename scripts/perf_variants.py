"""Measure rewritten plan shapes vs current catalog shapes, and check result
equality. Run SOLO: python scripts/perf_variants.py [sf_dir]"""
import sys, time

sys.path.insert(0, "/root/repo")
from ecom_snowflake_duckdb_migration_spark.queries import all_queries, run_sql
from ecom_snowflake_duckdb_migration_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

BPS = "CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5D) AS BIGINT)"

VARIANTS = {
    "q02_revenue_by_nation": {
        "v_direct": f"""
            WITH per_cust AS (
                SELECT /*+ BROADCAST(o) */ o.o_custkey, sum({BPS}) AS _crev
                FROM {{lineitem}} l JOIN {{orders}} o ON l.l_orderkey = o.o_orderkey
                GROUP BY o.o_custkey
            )
            SELECT /*+ BROADCAST(n), BROADCAST(r), BROADCAST(c) */
                   r.r_name, n.n_name,
                   CAST(sum(_crev) / 10000.0D AS DOUBLE) AS revenue,
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
                   CAST(sum({BPS}) / 10000.0D AS DOUBLE) AS volume
            FROM {{lineitem}} l
            JOIN {{orders}} o   ON o.o_orderkey = l.l_orderkey
            JOIN {{customer}} c ON c.c_custkey = o.o_custkey
            JOIN {{supplier}} s ON s.s_suppkey = l.l_suppkey
            JOIN {{nation}} cn  ON cn.n_nationkey = c.c_nationkey
            JOIN {{nation}} sn  ON sn.n_nationkey = s.s_nationkey
            GROUP BY cn.n_name, sn.n_name
        """,
    },
    "q06_multikey_min_price_join": {
        "v_bcast": """
            WITH ps AS (
                SELECT l_partkey, l_suppkey, min(l_extendedprice) AS min_price
                FROM {lineitem} GROUP BY l_partkey, l_suppkey
            )
            SELECT /*+ BROADCAST(ps) */ l.l_suppkey,
                   count(*) AS n_lines,
                   count(CASE WHEN l.l_extendedprice = ps.min_price THEN 1 END) AS n_at_min
            FROM {lineitem} l
            JOIN ps ON ps.l_partkey = l.l_partkey AND ps.l_suppkey = l.l_suppkey
            GROUP BY l.l_suppkey
        """,
        "v_shj": """
            WITH ps AS (
                SELECT l_partkey, l_suppkey, min(l_extendedprice) AS min_price
                FROM {lineitem} GROUP BY l_partkey, l_suppkey
            )
            SELECT /*+ SHUFFLE_HASH(ps) */ l.l_suppkey,
                   count(*) AS n_lines,
                   count(CASE WHEN l.l_extendedprice = ps.min_price THEN 1 END) AS n_at_min
            FROM {lineitem} l
            JOIN ps ON ps.l_partkey = l.l_partkey AND ps.l_suppkey = l.l_suppkey
            GROUP BY l.l_suppkey
        """,
    },
    "q07_dedup_keep_newest": {
        "v_maxby": """
            SELECT picked.* FROM (
                SELECT max_by(
                         named_struct('user_id', user_id, 'event_id', event_id,
                                      'event_type', event_type, 'value', value, 'ts', ts),
                         struct(ts, event_id)) AS picked
                FROM {events} GROUP BY user_id
            )
        """,
    },
    "q13_conditional_activity": {
        "v_cascade": """
            WITH pud AS (
                SELECT to_date(ts) AS day, user_id,
                       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS u_purch,
                       count(CASE WHEN event_type = 'click' THEN 1 END)    AS u_clicks,
                       sum(CAST(floor((CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) * 10000 + 0.5D) AS BIGINT)) AS u_val
                FROM {events}
                GROUP BY to_date(ts), user_id
            )
            SELECT day,
                   sum(u_purch)                                  AS purchases,
                   count(CASE WHEN u_purch > 0 THEN user_id END) AS purchasers,
                   sum(u_clicks)                                 AS clicks,
                   count(user_id)                                AS active_users,
                   CAST(sum(u_val) / 10000.0D AS DOUBLE)         AS purchase_value
            FROM pud GROUP BY day
        """,
    },
    "q22_count_distinct_quirk": {
        "v_sets": """
            SELECT l_returnflag,
                   CAST(cardinality(collect_set(l_quantity)) AS BIGINT) AS review_count_quirk,
                   CAST(cardinality(collect_set(l_partkey)) AS BIGINT)  AS n_parts,
                   CAST(cardinality(collect_set(l_suppkey)) AS BIGINT)  AS n_suppliers
            FROM {lineitem} GROUP BY l_returnflag
        """,
        "v_join3": """
            WITH a AS (SELECT l_returnflag, count(*) AS review_count_quirk
                       FROM (SELECT DISTINCT l_returnflag, l_quantity FROM {lineitem}) GROUP BY l_returnflag),
                 b AS (SELECT l_returnflag, count(*) AS n_parts
                       FROM (SELECT DISTINCT l_returnflag, l_partkey FROM {lineitem}) GROUP BY l_returnflag),
                 c AS (SELECT l_returnflag, count(*) AS n_suppliers
                       FROM (SELECT DISTINCT l_returnflag, l_suppkey FROM {lineitem}) GROUP BY l_returnflag)
            SELECT l_returnflag, review_count_quirk, n_parts, n_suppliers
            FROM a JOIN b USING (l_returnflag) JOIN c USING (l_returnflag)
        """,
    },
    "q24_grouped_column_reuse": {
        "v_bcast": """
            WITH pp AS (SELECT l_orderkey, l_partkey FROM {lineitem} GROUP BY l_orderkey, l_partkey),
                 po AS (SELECT l_orderkey, count(*) AS n_parts FROM pp GROUP BY l_orderkey)
            SELECT /*+ BROADCAST(po) */ o.o_orderkey, o.o_totalprice,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) div nullif(po.n_parts, 0) AS price_cents_per_part
            FROM {orders} o JOIN po ON po.l_orderkey = o.o_orderkey
        """,
        "v_shj": """
            WITH pp AS (SELECT l_orderkey, l_partkey FROM {lineitem} GROUP BY l_orderkey, l_partkey),
                 po AS (SELECT l_orderkey, count(*) AS n_parts FROM pp GROUP BY l_orderkey)
            SELECT /*+ SHUFFLE_HASH(o) */ o.o_orderkey, o.o_totalprice,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) div nullif(po.n_parts, 0) AS price_cents_per_part
            FROM {orders} o JOIN po ON po.l_orderkey = o.o_orderkey
        """,
    },
}

spark = get_spark(app_name="variants", shuffle_partitions=8,
    extra_conf={"spark.sql.files.maxPartitionBytes": "4194304",
                "spark.sql.adaptive.enabled": "false"})
specs = all_queries()

def best_of(n, fn):
    best = None
    for _ in range(n):
        t0 = time.perf_counter(); fn(); t1 = time.perf_counter()
        best = t1-t0 if best is None else min(best, t1-t0)
    return round(best, 4)

def rows_of(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())

for qname, variants in VARIANTS.items():
    cur_fn = specs[qname].fn
    cur_fn(spark, sf_dir).toArrow()
    t_cur = best_of(3, lambda: cur_fn(spark, sf_dir).toArrow())
    base_rows = rows_of(cur_fn(spark, sf_dir))
    line = f"{qname:30s} cur={t_cur:7.4f}"
    for vname, sql in variants.items():
        try:
            df = run_sql(spark, sf_dir, sql)
            df.toArrow()
            t_v = best_of(3, lambda: run_sql(spark, sf_dir, sql).toArrow())
            ok = rows_of(run_sql(spark, sf_dir, sql)) == base_rows
            line += f"  {vname}={t_v:7.4f}({'OK' if ok else 'MISMATCH'})"
        except Exception as e:
            line += f"  {vname}=ERR({str(e)[:60]})"
    print(line, flush=True)
spark.stop()
