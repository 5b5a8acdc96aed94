"""Sketch catalog: deterministic HLL / count-min / KMV entries.

Binds ``operators.sketches`` to oracle-checked catalog entries. Named with
the ``x`` prefix so they sort past the driver's 50-entry correctness window
(see BASELINE.md "Round-5 correctness curation") — they are hard-gated by
the all-entries local sweep (scripts/local_correctness.py) and
tests/test_parity.py instead, with full DuckDB oracles: the md5-derived
h60 hash makes every sketch bit-identical across engines, so even the
*approximate* estimates are exact-compare checkable.

Why an engine carries these (the reference's analytics surface at 100 TB):
`COUNT(DISTINCT)` / frequency / join-size questions over full history are
the queries that stop fitting; the sketch answers them from kilobyte
artifacts that merge across shards and days (reference's daily ingest
loop: src/pipeline/ingest_latest_synthetic_data.py runs per-day batches —
per-batch sketches + merge give the same dashboards without re-scanning).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import sketches as sk
from . import load, register

_P = 9  # HLL precision: 512 buckets, ~4.6% relative error
_D, _W = 4, 256  # count-min: eps = e/w ~ 1.1%, delta = e^-d ~ 1.8%
_K = 256  # KMV: ~1/sqrt(k) ~ 6% set-size error


@register(
    "x64_hll_sketch_users",
    oracle=sk.o_hll_sketch("events", "user_id", _P),
    doc="HyperLogLog sketch of events.user_id (p=9): (bucket, max rho), "
    "<=512 rows out regardless of input size; partial max combines "
    "map-side so each map task ships <=512 rows. Deterministic md5-h60 "
    "hashing -> the sketch itself is oracle-checkable (operators/"
    "sketches.py). Merge across shards/days = bucket-wise max.",
    tags=("SKETCH", "A1"),
)
def x64_hll_sketch_users(spark, sf_dir):
    return sk.hll_sketch(load(spark, sf_dir, "events"), "user_id", p=_P)


@register(
    "x65_hll_estimate_users",
    oracle=sk.o_hll_estimate(sk.o_hll_sketch("events", "user_id", _P), _P),
    doc="Closed-form HLL cardinality estimate from x64's sketch: harmonic "
    "sum kept as an exact integer (powers of two — order-free), one "
    "IEEE-identical double expression at the end; linear-counting branch "
    "below 2.5m. Estimate is exact-compare checked against DuckDB running "
    "the identical algorithm.",
    tags=("SKETCH", "A1"),
)
def x65_hll_estimate_users(spark, sf_dir):
    return sk.hll_estimate(
        sk.hll_sketch(load(spark, sf_dir, "events"), "user_id", p=_P), p=_P
    )


@register(
    "x66_countmin_user_spend",
    oracle=sk.o_countmin_sketch(
        "events",
        "user_id",
        _D,
        _W,
        weight_expr="CAST(floor(value * 10000 + 0.5) AS BIGINT)",
    ),
    doc="Count-min sketch of per-user event value (d=4, w=256), weights in "
    "exact integer basis points: <=1024 cells out; the d-way explode "
    "collapses into a <=d*w-entry partial hash table before any shuffle. "
    "Merge = cell-wise sum. Point lookups via x67.",
    tags=("SKETCH", "A2"),
)
def x66_countmin_user_spend(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return sk.countmin_sketch(
        e,
        "user_id",
        d=_D,
        w=_W,
        weight=F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long"),
    )


@register(
    "x67_countmin_estimates",
    oracle=f"""
    WITH est AS ({sk.o_countmin_lookup(
        sk.o_countmin_sketch("events", "user_id", _D, _W),
        "SELECT DISTINCT user_id FROM events",
        "user_id",
        _D,
        _W,
    )}),
    truth AS (SELECT user_id, count(*) AS true_count FROM events GROUP BY user_id)
    SELECT est.user_id, est.estimate, CAST(truth.true_count AS BIGINT) AS true_count,
           est.estimate >= truth.true_count AS never_undercounts
    FROM est JOIN truth ON truth.user_id = est.user_id
    """,
    doc="Count-min point estimates (frequency sketch, weight=1) for every "
    "distinct user, joined to true counts: demonstrates the one-sided "
    "error guarantee (estimate >= true, pinned as a result column). The "
    "probe side is a d-way explode joined against the broadcast <=d*w-row "
    "sketch — candidate keys never shuffle the fact table.",
    tags=("SKETCH", "A2"),
)
def x67_countmin_estimates(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    cm = sk.countmin_sketch(e, "user_id", d=_D, w=_W)
    keys = e.select("user_id").distinct()
    est = sk.countmin_lookup(cm, keys, "user_id", d=_D, w=_W)
    truth = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    return est.join(truth, "user_id").select(
        "user_id",
        "estimate",
        "true_count",
        (F.col("estimate") >= F.col("true_count")).alias("never_undercounts"),
    )


@register(
    "x68_kmv_join_size",
    oracle=sk.o_kmv_join_size(
        sk.o_kmv_sketch("orders", "o_custkey", _K),
        sk.o_kmv_sketch("customer", "c_custkey", _K),
        _K,
    ),
    doc="Join-size estimation from two KMV sketches (k=256 smallest "
    "distinct h60 per side): |orders.custkey ∩ customer.custkey| priced "
    "from two k-row artifacts — how an optimizer sizes a join between "
    "two 100 TB tables without scanning either twice. Physical shape per "
    "sketch: map-side partial dedup -> dedup shuffle of hashes -> "
    "TakeOrderedAndProject partial top-k.",
    tags=("SKETCH", "J3"),
)
def x68_kmv_join_size(spark, sf_dir):
    a = sk.kmv_sketch(load(spark, sf_dir, "orders"), "o_custkey", k=_K)
    b = sk.kmv_sketch(load(spark, sf_dir, "customer"), "c_custkey", k=_K)
    return sk.kmv_join_size(a, b, k=_K)


def _zorder_sql(div_op: str) -> str:
    from ..operators import layout

    qa = layout.quantize_minmax_sql("o_custkey", "lo_a", "hi_a", div_op=div_op)
    qb = layout.quantize_minmax_sql("o_orderkey", "lo_b", "hi_b", div_op=div_op)
    return f"""
    WITH r AS (SELECT min(o_custkey) AS lo_a, max(o_custkey) AS hi_a,
                      min(o_orderkey) AS lo_b, max(o_orderkey) AS hi_b
               FROM {{orders}}),
    keyed AS (SELECT o_orderkey, {layout.zorder_key_sql(qa, qb)} AS zkey
              FROM {{orders}}, r)
    SELECT o_orderkey, CAST(zkey AS BIGINT) AS zkey FROM keyed
    """


@register(
    "x69_zorder_keys",
    oracle=_zorder_sql("//").replace("{orders}", "orders"),
    doc="Z-order (Morton) keys over orders (custkey x orderkey): min-max "
    "quantize each dimension to 16 bits (integer math, runtime range from "
    "a min/max CTE so one query serves every scale factor), interleave via "
    "the 4-step magic-number spread — pure &,|,<< both engines evaluate "
    "identically. cluster_by_zorder (operators/layout.py) range-partitions "
    "on this key so row-group min/max stats prune scans on EITHER column; "
    "tests/test_layout.py quantifies the pruning against linear sorts.",
    tags=("LAYOUT", "S10"),
)
def x69_zorder_keys(spark, sf_dir):
    from . import run_sql

    return run_sql(spark, sf_dir, _zorder_sql("DIV"))


_HW = 256  # histogram buckets


@register(
    "x70_histogram_quantiles",
    oracle=sk.o_histogram_quantiles(
        sk.o_histogram_sketch("orders", "o_totalprice", _HW), _HW
    ),
    doc="Quantile estimates (p25/50/75/90/99) from a 256-bucket equi-width "
    "histogram sketch of orders.o_totalprice: fixed-point bucketing "
    "against the runtime min/max (integer math), cumulative window over "
    "<=256 sketch rows — never the data. Mergeable bucket-wise given a "
    "shared (lo,hi) frame; estimates exact-compare checked vs DuckDB "
    "running the identical algorithm.",
    tags=("SKETCH", "A2"),
)
def x70_histogram_quantiles(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return sk.histogram_quantiles(sk.histogram_sketch(o, "o_totalprice", _HW), _HW)


_BM, _BK = 8192, 4  # bloom: m bits, k hashes


@register(
    "x71_bloom_filter_probe",
    oracle=f"""
    WITH probes AS ({sk.o_bloom_might_contain(
        sk.o_bloom_build("(SELECT c_custkey FROM customer WHERE c_acctbal > 5000)",
                         "c_custkey", _BM, _BK),
        "SELECT DISTINCT o_custkey AS c_custkey FROM orders",
        "c_custkey", _BM, _BK)}),
    truth AS (SELECT c_custkey, TRUE AS in_set FROM customer WHERE c_acctbal > 5000)
    SELECT count(*)                                                    AS n_probed,
           count(CASE WHEN might_contain THEN 1 END)                   AS n_might,
           count(CASE WHEN in_set THEN 1 END)                          AS n_true,
           count(CASE WHEN might_contain AND in_set IS NULL THEN 1 END) AS n_false_positives,
           count(CASE WHEN NOT might_contain AND in_set THEN 1 END)    AS n_false_negatives
    FROM probes LEFT JOIN truth USING (c_custkey)
    """,
    doc="Bloom-filter runtime join filter, end to end: build over the rich-"
    "customer subset (word/bit_or bitmap, <=m/64 rows — mergeable, "
    "storable), probe every distinct ordering customer, score against "
    "truth. n_false_negatives is structurally 0 (the Bloom guarantee, "
    "also pinned in tests); n_false_positives shows the ~(1-e^(-kn/m))^k "
    "rate. At 100 TB: ship the kilobyte filter to fact-scan tasks and "
    "drop rows BEFORE the join shuffle.",
    tags=("SKETCH", "J4"),
)
def x71_bloom_filter_probe(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    bloom = sk.bloom_build(rich, "c_custkey", _BM, _BK)
    keys = (
        load(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    probes = sk.bloom_might_contain(bloom, keys, "c_custkey", _BM, _BK)
    truth = rich.withColumn("in_set", F.lit(True))
    j = probes.join(truth, "c_custkey", "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.count(F.when(F.col("might_contain"), 1)).alias("n_might"),
        F.count(F.when(F.col("in_set"), 1)).alias("n_true"),
        F.count(F.when(F.col("might_contain") & F.col("in_set").isNull(), 1)).alias(
            "n_false_positives"
        ),
        F.count(F.when(~F.col("might_contain") & F.col("in_set"), 1)).alias(
            "n_false_negatives"
        ),
    )


@register(
    "x72_hll_grouped_distinct",
    oracle=f"""
    WITH est AS ({sk.o_hll_group_estimate(
        sk.o_hll_group_sketch("events", ["event_type"], "user_id"),
        ["event_type"])}),
    truth AS (SELECT event_type, count(DISTINCT user_id) AS true_distinct
              FROM events GROUP BY event_type)
    SELECT est.event_type, est.estimate, CAST(truth.true_distinct AS BIGINT) AS true_distinct
    FROM est JOIN truth ON truth.event_type = est.event_type
    """,
    doc="Per-group approximate COUNT(DISTINCT): HLL sketch keyed by (group, "
    "bucket) — the workhorse for distinct-per-group over ARBITRARY key "
    "types at 100 TB (the q22/q13 bitmap rewrite needs dense ints; this "
    "needs nothing). Shuffle bounded by |groups| x 2^p; merge = (group, "
    "bucket)-wise max. Estimates exact-compare oracled, true counts "
    "joined alongside so the error is visible in the result.",
    tags=("SKETCH", "A1"),
)
def x72_hll_grouped_distinct(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    est = sk.hll_group_estimate(
        sk.hll_group_sketch(e, ["event_type"], "user_id"), ["event_type"]
    )
    truth = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("true_distinct")
    )
    return est.join(truth, "event_type").select(
        "event_type", "estimate", "true_distinct"
    )


@register(
    "x73_heavy_hitters",
    oracle=f"""
    WITH est AS ({sk.o_countmin_lookup(
        sk.o_countmin_sketch("events", "user_id", _D, _W),
        "SELECT DISTINCT user_id FROM events",
        "user_id", _D, _W)}),
    cand AS (SELECT user_id FROM est, (SELECT count(*) AS total FROM events) t
             WHERE est.estimate * 200 >= t.total),
    verified AS (
        SELECT e.user_id, count(*) AS n_events
        FROM events e JOIN cand ON cand.user_id = e.user_id
        GROUP BY e.user_id
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events
    FROM verified, (SELECT count(*) AS total FROM events) t
    WHERE n_events * 200 >= t.total
    """,
    doc="Sketch-guided heavy hitters (>=0.5% of events): count-min point "
    "estimates nominate candidates (no false negatives — the one-sided "
    "guarantee means every true heavy hitter is nominated), then ONE "
    "semi-join pass verifies exact counts and drops the false positives. "
    "The 100 TB pattern: the sketch bounds the second pass to |candidates| "
    "keys instead of re-aggregating every key.",
    tags=("SKETCH", "A2"),
)
def x73_heavy_hitters(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    cm = sk.countmin_sketch(e, "user_id", d=_D, w=_W)
    keys = e.select("user_id").distinct()
    est = sk.countmin_lookup(cm, keys, "user_id", d=_D, w=_W)
    total = e.count()  # scalar driver-side: one count job, same as the oracle's t
    cand = est.filter(F.col("estimate") * 200 >= F.lit(total)).select("user_id")
    verified = (
        e.join(F.broadcast(cand), "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return verified.filter(F.col("n_events") * 200 >= F.lit(total)).select(
        "user_id", F.col("n_events").cast("long").alias("n_events")
    )


@register(
    "x74_table_stats",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
           CAST(min(o_orderkey) AS DOUBLE) AS min_value,
           CAST(max(o_orderkey) AS DOUBLE) AS max_value,
           count(*) - count(o_orderkey)    AS n_nulls,
           count(DISTINCT o_orderkey)      AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE),
           count(*) - count(o_custkey), count(DISTINCT o_custkey)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE),
           count(*) - count(o_totalprice), count(DISTINCT o_totalprice)
    FROM orders
    """,
    doc="ANALYZE-style column statistics (min/max/nulls/ndv) in ONE scan: "
    "all three columns' aggregates ride a single Aggregate operator (no "
    "per-column scans), unpivoted to stats rows. The optimizer-feeding "
    "pattern: these numbers size broadcasts, pick bitmap-vs-cascade "
    "distincts, and bound z-order quantization ranges.",
    tags=("SKETCH", "S12"),
)
def x74_table_stats(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    agg = o.agg(
        F.min("o_orderkey").cast("double").alias("k_min"),
        F.max("o_orderkey").cast("double").alias("k_max"),
        (F.count(F.lit(1)) - F.count("o_orderkey")).alias("k_nulls"),
        F.countDistinct("o_orderkey").alias("k_ndv"),
        F.min("o_custkey").cast("double").alias("c_min"),
        F.max("o_custkey").cast("double").alias("c_max"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("c_nulls"),
        F.countDistinct("o_custkey").alias("c_ndv"),
        F.min("o_totalprice").cast("double").alias("p_min"),
        F.max("o_totalprice").cast("double").alias("p_max"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).alias("p_nulls"),
        F.countDistinct("o_totalprice").alias("p_ndv"),
    )
    return agg.selectExpr(
        """stack(3,
            'o_orderkey',  k_min, k_max, k_nulls, k_ndv,
            'o_custkey',   c_min, c_max, c_nulls, c_ndv,
            'o_totalprice', p_min, p_max, p_nulls, p_ndv
        ) AS (column_name, min_value, max_value, n_nulls, n_distinct)"""
    )
