"""Deterministic mergeable sketches: HyperLogLog, count-min, KMV.

The 100 TB use-case: a pretraining/analytics pipeline wants cardinality,
frequency, and join-size estimates over columns far too large to aggregate
exactly per run — and wants the per-partition partial results to be tiny,
mergeable, and storable next to the data (compute once per shard, combine
forever). All three sketches here are classic published designs
(Flajolet et al. 2007 HyperLogLog; Cormode & Muthukrishnan 2005 count-min;
Bar-Yossef et al. 2002 KMV/"distinct sampling"), expressed as pure
DataFrame aggregations so Catalyst keeps them map-side combinable.

Determinism as a feature: every sketch is built on an md5-derived 60-bit
hash (``h60``) that DuckDB reproduces bit-for-bit (``o_h60``), so sketches
and their estimates are ORACLE-CHECKABLE — the same input always produces
the identical sketch on both engines, and a stored sketch can be re-derived
and verified. This is deliberately unlike engine-native approx aggregates
(``approx_count_distinct``), whose hash and layout are engine-private.

Scale posture:
- HLL: one aggregation keyed by (2^p buckets); partial max(rho) combines
  map-side, so the shuffle carries <= 2^p rows PER MAP TASK regardless of
  input size. Merging shards = max per bucket.
- Count-min: one aggregation keyed by (d x w cells) after a d-way explode;
  same bounded-shuffle property. Merging = cell-wise sum.
- KMV: per-partition distinct + global top-k via TakeOrderedAndProject
  (partial top-k per partition, merged on the driver). The dedup pass is
  the honest cost — KMV needs distinct hash values; map-side partial dedup
  bounds the shuffle at |per-partition distinct|. Merging = union +
  re-take k smallest.

Float discipline (same convention as the catalog, queries/catalog_core.py
module docstring): harmonic sums are computed as EXACT integer sums of
powers of two (associative, order-free) and only converted to DOUBLE for
the final closed-form estimate, so both engines run the identical IEEE
expression on identical inputs. Bucket/bit extraction is pure integer
(shifts and base-2 digit counts), never floating log2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 60-bit hash domain: 15 hex chars of md5. 60 bits keeps the BIGINT parse
# exact on both engines (16 chars could overflow signed 64-bit) and leaves
# collision probability ~n^2/2^61 — negligible below ~10^8 distinct keys
# per sketch; the sketch error floor dominates far earlier.
HASH_BITS = 60
HASH_SPACE = 1 << HASH_BITS


def h60(col: Column) -> Column:
    """Deterministic 60-bit hash, identical in Spark and DuckDB.

    Keys are hashed through their canonical string form so both engines see
    the same bytes (BIGINT -> '123'). md5 is uniform enough for sketch
    hashing and is the only keyed-permutation primitive both engines share.
    """
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def o_h60(expr: str) -> str:
    """DuckDB twin of :func:`h60` (verified bit-identical)."""
    return f"CAST(('0x' || substr(md5(CAST(({expr}) AS VARCHAR)),1,15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_sketch(df: DataFrame, key: str | Column, p: int = 9) -> DataFrame:
    """HLL sketch: one row per non-empty bucket -> (bucket, rho).

    bucket = top ``p`` hash bits (integer shift — a double division would
    round the 60-bit hash to 53 bits first); rho = 1-indexed position of
    the leftmost 1-bit in the remaining ``60-p`` bits (zero remainder ->
    rem_bits+1), maxed per bucket. Bit positions come from base-2 digit
    counts, so the sketch is exact integer data on both engines.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    rem_bits = HASH_BITS - p
    h = h60(key_col)
    rem = h % F.lit(1 << rem_bits)
    # bitlen(rem) = floor(log2(rem)) + 1 via base-2 digit count; rem = 0
    # contributes bitlen 0. rho = rem_bits - bitlen + 1, in [1, rem_bits+1].
    bitlen = F.when(rem == 0, F.lit(0)).otherwise(F.length(F.conv(rem, 10, 2)))
    return (
        # NULL keys would produce a (NULL, NULL) bucket row, skewing the
        # nonempty-bucket count in the estimator; COUNT(DISTINCT) ignores
        # NULLs, so the sketch does too (mirrored in o_hll_sketch).
        df.where(key_col.isNotNull())
        .select(
            F.shiftright(h, rem_bits).alias("bucket"),
            (F.lit(rem_bits + 1) - bitlen).cast("int").alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge HLL sketches of the same precision: bucket-wise max(rho)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def _hll_consts(p: int) -> tuple[int, int, float, float]:
    m = 1 << p
    rem_bits = HASH_BITS - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    scale = float(1 << (rem_bits + 1))
    return m, rem_bits, alpha, scale


def hll_estimate(sketch: DataFrame, p: int = 9) -> DataFrame:
    """Closed-form HLL estimate from a sketch; 1 row.

    Columns: m, nonempty_buckets, harmonic_bp (the harmonic sum scaled by
    2^(rem_bits+1): an exact integer — every term is a power of two — so
    its DOUBLE image is engine-identical), estimate (BIGINT,
    floor(x + 0.5)). Small-range linear counting (m*ln(m/zeros)) applies
    below 2.5m with empty buckets, per the published algorithm.
    """
    m, rem_bits, alpha, scale = _hll_consts(p)
    # Non-empty bucket contributes 2^(rem_bits+1-rho) (rho >= 1 -> integer
    # >= 1); each empty bucket contributes 2^(rem_bits+1). Summed exactly in
    # DECIMAL(38,0) (max total m * 2^(rem_bits+1) = 2^61 at p=9 — past
    # int64 when rho is small, inside decimal/hugeint comfortably).
    agg = sketch.agg(
        F.count(F.lit(1)).cast("long").alias("nonempty_buckets"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(rem_bits + 1) - F.col("rho")).cast("decimal(38,0)")
        ).alias("_t"),
    )
    harmonic = (
        F.col("_t")
        + (F.lit(m) - F.col("nonempty_buckets")).cast("decimal(38,0)")
        * F.lit(1 << (rem_bits + 1)).cast("decimal(38,0)")
    ).cast("double")
    raw_est = F.lit(alpha * m * m * scale) / harmonic
    zeros = F.lit(m) - F.col("nonempty_buckets")
    lin_est = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return agg.select(
        F.lit(m).cast("int").alias("m"),
        "nonempty_buckets",
        harmonic.alias("harmonic_bp"),
        F.floor(
            F.when((zeros > 0) & (raw_est <= F.lit(2.5 * m)), lin_est).otherwise(
                raw_est
            )
            + F.lit(0.5)
        )
        .cast("long")
        .alias("estimate"),
    )


def o_hll_sketch(table_expr: str, key_expr: str, p: int = 9) -> str:
    """DuckDB SQL producing the identical HLL sketch."""
    rem_bits = HASH_BITS - p
    h = o_h60(key_expr)
    rem = f"({h} % {1 << rem_bits})"
    return f"""
    SELECT {h} // {1 << rem_bits} AS bucket,
           CAST(max({rem_bits + 1} - (CASE WHEN {rem} = 0 THEN 0
                                           ELSE length(bin({rem})) END)) AS INT) AS rho
    FROM {table_expr}
    WHERE ({key_expr}) IS NOT NULL
    GROUP BY 1
    """


def o_hll_estimate(sketch_sql: str, p: int = 9) -> str:
    """DuckDB SQL producing the identical estimate row from a sketch query."""
    m, rem_bits, alpha, scale = _hll_consts(p)
    harmonic = (
        f"CAST(CAST(_t AS HUGEINT) + CAST({m} - nonempty_buckets AS HUGEINT)"
        f" * CAST({1 << (rem_bits + 1)} AS HUGEINT) AS DOUBLE)"
    )
    # NB: DuckDB types bare decimal literals as DECIMAL (not DOUBLE) and
    # overflows the narrow product — keep every constant explicitly DOUBLE
    # so both engines evaluate the identical IEEE expression.
    raw_est = f"(CAST({alpha * m * m * scale!r} AS DOUBLE) / {harmonic})"
    lin_est = f"(CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / CAST({m} - nonempty_buckets AS DOUBLE)))"
    return f"""
    WITH sk AS ({sketch_sql}),
    agg AS (
        SELECT count(*) AS nonempty_buckets,
               sum(CAST(2 ** ({rem_bits + 1} - rho) AS HUGEINT)) AS _t
        FROM sk
    )
    SELECT CAST({m} AS INT) AS m,
           CAST(nonempty_buckets AS BIGINT) AS nonempty_buckets,
           {harmonic} AS harmonic_bp,
           CAST(floor(CASE WHEN ({m} - nonempty_buckets) > 0 AND {raw_est} <= {2.5 * m!r}
                           THEN {lin_est} ELSE {raw_est} END + 0.5) AS BIGINT) AS estimate
    FROM agg
    """


# ---------------------------------------------------------------------------
# Count-min
# ---------------------------------------------------------------------------


def _cm_cells(key_col: Column, d: int, w: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                (h60(F.concat(F.lit(f"{i}:"), key_col.cast("string"))) % w).alias(
                    "cell"
                ),
            )
            for i in range(d)
        ]
    )


def countmin_sketch(
    df: DataFrame,
    key: str | Column,
    d: int = 4,
    w: int = 256,
    weight: Column | None = None,
) -> DataFrame:
    """Count-min sketch: (r, cell) -> total; at most d*w rows.

    Each input row lands in one cell per hash row (seeded ``i:key``);
    ``weight`` defaults to 1 per row (frequency). Integer sums — exact,
    mergeable by cell-wise addition, map-side combinable (the d-way explode
    collapses into a <= d*w-entry partial hash table before any shuffle).
    """
    key_col = F.col(key) if isinstance(key, str) else key
    wcol = F.lit(1) if weight is None else weight
    return (
        df.select(F.explode(_cm_cells(key_col, d, w)).alias("rc"), wcol.alias("w"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.cell").alias("cell"))
        .agg(F.sum("w").cast("long").alias("total"))
    )


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches of identical (d, w): cell-wise sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "cell").agg(F.sum("total").cast("long").alias("total"))


def countmin_lookup(
    sketch: DataFrame, keys: DataFrame, key: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Point-estimate: min over the d cells a key hashes to.

    ``keys`` is a (small) DataFrame of candidate keys; the d-way explode +
    equi-join against the <= d*w-row broadcast sketch. The estimate NEVER
    under-counts (count-min guarantee); tests pin ``estimate >= true`` and
    the epsilon bound.
    """
    probes = keys.select(key, F.explode(_cm_cells(F.col(key), d, w)).alias("rc")).select(
        key, F.col("rc.r").alias("r"), F.col("rc.cell").alias("cell")
    )
    return (
        probes.join(F.broadcast(sketch), ["r", "cell"], "left")
        .groupBy(key)
        .agg(F.min(F.coalesce(F.col("total"), F.lit(0))).cast("long").alias("estimate"))
    )


def o_countmin_sketch(
    table_expr: str, key_expr: str, d: int = 4, w: int = 256, weight_expr: str = "1"
) -> str:
    """DuckDB SQL producing the identical count-min sketch (d-way UNION ALL)."""
    branches = []
    for i in range(d):
        seeded = f"'{i}:' || CAST(({key_expr}) AS VARCHAR)"
        branches.append(
            f"SELECT {i} AS r, {o_h60(seeded)} % {w} AS cell,"
            f" CAST(({weight_expr}) AS BIGINT) AS w FROM {table_expr}"
        )
    union = " UNION ALL ".join(branches)
    return f"""
    SELECT CAST(r AS INT) AS r, cell, CAST(sum(w) AS BIGINT) AS total
    FROM ({union}) GROUP BY r, cell
    """


def o_countmin_lookup(
    sketch_sql: str, keys_sql: str, key: str, d: int = 4, w: int = 256
) -> str:
    """DuckDB SQL twin of :func:`countmin_lookup` over SQL-defined inputs."""
    branches = []
    for i in range(d):
        seeded = f"'{i}:' || CAST({key} AS VARCHAR)"
        branches.append(
            f"SELECT {key}, {i} AS r, {o_h60(seeded)} % {w} AS cell FROM keys"
        )
    union = " UNION ALL ".join(branches)
    return f"""
    WITH sk AS ({sketch_sql}), keys AS ({keys_sql}), probes AS ({union})
    SELECT probes.{key}, CAST(min(coalesce(sk.total, 0)) AS BIGINT) AS estimate
    FROM probes LEFT JOIN sk ON sk.r = probes.r AND sk.cell = probes.cell
    GROUP BY probes.{key}
    """


# ---------------------------------------------------------------------------
# KMV (k minimum values) — distinct sampling / join-size estimation
# ---------------------------------------------------------------------------


def kmv_sketch(df: DataFrame, key: str | Column, k: int = 256) -> DataFrame:
    """KMV sketch: the k smallest DISTINCT h60 values of the key column.

    Physical shape: map-side partial dedup -> one dedup shuffle ->
    TakeOrderedAndProject (per-partition top-k, merged on the driver). The
    dedup shuffle is KMV's honest cost; its payload is one BIGINT per
    locally-distinct key. The k-row result is the mergeable artifact.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    # NULL keys hash to NULL, and ORDER BY sorts NULLs first in Spark but
    # last in DuckDB — one NULL would break the bit-identical cross-engine
    # sketch and poison kth/h in the estimators. Distinct-count semantics
    # ignore NULLs anyway (COUNT(DISTINCT) convention).
    return (
        df.where(key_col.isNotNull())
        .select(h60(key_col).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Merge two KMV sketches: k smallest of the distinct union."""
    return a.unionByName(b).distinct().orderBy("h").limit(k)


def kmv_estimate_distinct(sketch_rows: list, k: int = 256) -> float:
    """Driver-side estimate from a collected sketch: (k-1) * 2^60 / h_(k).

    If the sketch holds fewer than k values the count is exact (every
    distinct hash is present).
    """
    hs = sorted(r.h if hasattr(r, "h") else r[0] for r in sketch_rows)
    if len(hs) < k:
        return float(len(hs))
    return (k - 1) * float(HASH_SPACE) / float(hs[k - 1])


def kmv_join_size(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Join-size estimation from two KMV sketches; 1 row, all-deterministic.

    Standard KMV set-operation estimator: U = k smallest of A ∪ B,
    kth = max(U); |A ∪ B| ≈ (k-1)*2^60/kth, Jaccard ≈ |U ∩ A ∩ B| / |U|,
    |A ∩ B| ≈ Jaccard * |A ∪ B| (exact when |U| < k: the union sketch then
    holds every distinct hash). Integer inputs + a fixed double expression
    -> bit-stable across engines. This is how an optimizer prices a join
    between two 100 TB tables from two k-row artifacts.
    """
    u = kmv_merge(a, b, k)
    both = a.intersect(b)
    u_stats = u.agg(F.count(F.lit(1)).cast("long").alias("u_n"), F.max("h").alias("kth"))
    match = u.join(both, "h", "inner").agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    union_est = F.lit(float((k - 1) * HASH_SPACE)) / F.col("kth").cast("double")
    return u_stats.crossJoin(match).select(
        "u_n",
        "kth",
        "n_both",
        F.floor(
            F.when(F.col("u_n") < k, F.col("n_both").cast("double")).otherwise(
                (F.col("n_both").cast("double") / F.lit(float(k))) * union_est
            )
            + F.lit(0.5)
        )
        .cast("long")
        .alias("intersection_estimate"),
    )


def o_kmv_sketch(table_expr: str, key_expr: str, k: int = 256) -> str:
    """DuckDB SQL producing the identical KMV sketch (NULL keys excluded,
    matching :func:`kmv_sketch` — NULLs sort opposite ways in the two
    engines and carry no distinct-count information)."""
    return (
        f"SELECT DISTINCT {o_h60(key_expr)} AS h FROM {table_expr} "
        f"WHERE ({key_expr}) IS NOT NULL ORDER BY h LIMIT {k}"
    )


def o_kmv_join_size(a_sql: str, b_sql: str, k: int = 256) -> str:
    """DuckDB SQL producing the identical join-size estimate row."""
    return f"""
    WITH a AS ({a_sql}), b AS ({b_sql}),
    u AS (SELECT DISTINCT h FROM (SELECT h FROM a UNION ALL SELECT h FROM b)
          ORDER BY h LIMIT {k}),
    both_h AS (SELECT h FROM a INTERSECT SELECT h FROM b),
    us AS (SELECT count(*) AS u_n, max(h) AS kth FROM u),
    mt AS (SELECT count(*) AS n_both FROM u JOIN both_h USING (h))
    SELECT CAST(u_n AS BIGINT) AS u_n, kth, CAST(n_both AS BIGINT) AS n_both,
           CAST(floor(CASE WHEN u_n < {k} THEN CAST(n_both AS DOUBLE)
                           ELSE (CAST(n_both AS DOUBLE) / CAST({float(k)!r} AS DOUBLE))
                                * (CAST({float((k - 1) * HASH_SPACE)!r} AS DOUBLE)
                                   / CAST(kth AS DOUBLE))
                      END + CAST(0.5 AS DOUBLE)) AS BIGINT) AS intersection_estimate
    FROM us, mt
    """


# ---------------------------------------------------------------------------
# Equi-width histogram — mergeable quantile estimation
# ---------------------------------------------------------------------------


def histogram_sketch(
    df: DataFrame, value_expr: str, w: int = 256, bp: int = 10_000
) -> DataFrame:
    """Equi-width histogram over a money-domain double column; <= w rows.

    The column is fixed-pointed (``bp`` basis points — exact for <=4-decimal
    sources, same convention as the catalog) and bucketed by pure integer
    math against the runtime min/max, so both engines bucket identically.
    One aggregation, map-side combinable (<= w-entry partials); merging
    shards = bucket-wise sum IF built against the same (lo, hi) frame —
    store the frame with the sketch (lo_bp/hi_bp ride every row).
    """
    v = f"CAST(floor(({value_expr}) * {bp} + 0.5D) AS BIGINT)"
    return _hist(df, v, w)


def _temp_view(df: DataFrame, prefix: str) -> str:
    """Register ``df`` under a per-call unique view name. A fixed name lets
    two interleaved builds on the same SparkSession stomp each other's view
    between createOrReplaceTempView and sql() analysis, silently sketching
    the wrong DataFrame. The caller drops the view after sql() returns —
    Spark resolves views eagerly at analysis, so the plan keeps working."""
    import uuid

    name = f"_{prefix}_{uuid.uuid4().hex}"
    df.createOrReplaceTempView(name)
    return name


def _hist(df: DataFrame, v_bp: str, w: int) -> DataFrame:
    src = _temp_view(df, "hist_src")
    try:
        return df.sparkSession.sql(
            f"""
            WITH r AS (SELECT min({v_bp}) AS lo_bp, max({v_bp}) AS hi_bp FROM {src}),
            b AS (
                SELECT CASE WHEN hi_bp <= lo_bp THEN 0
                            ELSE ({v_bp} - lo_bp) * {w} DIV (hi_bp - lo_bp + 1) END AS bucket,
                       lo_bp, hi_bp
                FROM {src}, r
            )
            SELECT bucket, CAST(count(*) AS BIGINT) AS n, lo_bp, hi_bp
            FROM b GROUP BY bucket, lo_bp, hi_bp
            """
        )
    finally:
        df.sparkSession.catalog.dropTempView(src)


def o_histogram_sketch(table_expr: str, value_expr: str, w: int = 256, bp: int = 10_000) -> str:
    """DuckDB twin of :func:`histogram_sketch`."""
    v = f"CAST(floor(({value_expr}) * {bp} + 0.5) AS BIGINT)"
    return f"""
    WITH r AS (SELECT min({v}) AS lo_bp, max({v}) AS hi_bp FROM {table_expr}),
    b AS (
        SELECT CASE WHEN hi_bp <= lo_bp THEN 0
                    ELSE ({v} - lo_bp) * {w} // (hi_bp - lo_bp + 1) END AS bucket,
               lo_bp, hi_bp
        FROM {table_expr}, r
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n, lo_bp, hi_bp
    FROM b GROUP BY bucket, lo_bp, hi_bp
    """


_QUANTILE_PROBS_BP = (2500, 5000, 7500, 9000, 9900)  # p in basis points


def histogram_quantiles(hist: DataFrame, w: int = 256) -> DataFrame:
    """Quantile estimates from a histogram sketch; one row per probe prob.

    For each p: the first bucket whose cumulative count reaches
    ceil(p * total) (the discrete lower-quantile convention), reported as
    the bucket's midpoint in exact integer bp -> DOUBLE. Integer cumsum +
    one shared IEEE division — bit-stable across engines. O(w log w) on
    <= w rows: the cumulative window is over the sketch, never the data.
    """
    src = _temp_view(hist, "hq_hist")
    probs = ", ".join(f"({p})" for p in _QUANTILE_PROBS_BP)
    try:
        return hist.sparkSession.sql(
            f"""
        WITH cum AS (
            SELECT bucket, lo_bp, hi_bp,
                   sum(n) OVER (ORDER BY bucket
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
                   sum(n) OVER () AS total_n
            FROM {src}
        ),
        probe AS (SELECT col1 AS p_bp FROM (VALUES {probs})),
        hit AS (
            SELECT p_bp, min(bucket) AS qbucket, min(lo_bp) AS lo_bp,
                   min(hi_bp) AS hi_bp, min(total_n) AS total_n
            FROM probe JOIN cum
              ON cum.cum_n * 10000 >= p_bp * cum.total_n
            GROUP BY p_bp
        )
        SELECT CAST(p_bp AS BIGINT) AS p_bp,
               CAST(qbucket AS BIGINT) AS bucket,
               CAST((lo_bp + (2 * qbucket + 1) * (hi_bp - lo_bp + 1) DIV (2 * {w}))
                    / 10000.0D AS DOUBLE) AS value_estimate
        FROM hit
        """
        )
    finally:
        hist.sparkSession.catalog.dropTempView(src)


def o_histogram_quantiles(hist_sql: str, w: int = 256) -> str:
    """DuckDB twin of :func:`histogram_quantiles`."""
    probs = ", ".join(f"({p})" for p in _QUANTILE_PROBS_BP)
    return f"""
    WITH h AS ({hist_sql}),
    cum AS (
        SELECT bucket, lo_bp, hi_bp,
               sum(n) OVER (ORDER BY bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
               sum(n) OVER () AS total_n
        FROM h
    ),
    probe AS (SELECT col0 AS p_bp FROM (VALUES {probs}) t(col0)),
    hit AS (
        SELECT p_bp, min(bucket) AS qbucket, min(lo_bp) AS lo_bp,
               min(hi_bp) AS hi_bp, min(total_n) AS total_n
        FROM probe JOIN cum
          ON cum.cum_n * 10000 >= p_bp * cum.total_n
        GROUP BY p_bp
    )
    SELECT CAST(p_bp AS BIGINT) AS p_bp,
           CAST(qbucket AS BIGINT) AS bucket,
           CAST(CAST(lo_bp + (2 * qbucket + 1) * (hi_bp - lo_bp + 1) // (2 * {w})
                AS BIGINT) / 10000.0 AS DOUBLE) AS value_estimate
    FROM hit
    """


# ---------------------------------------------------------------------------
# Bloom filter — storable runtime join filter
# ---------------------------------------------------------------------------


def _bloom_positions(key_col: Column, k: int, m_bits: int) -> Column:
    return F.array(
        *[
            (h60(F.concat(F.lit(f"b{i}:"), key_col.cast("string"))) % m_bits)
            for i in range(k)
        ]
    )


def bloom_build(df: DataFrame, key: str | Column, m_bits: int = 8192, k: int = 4) -> DataFrame:
    """Bloom filter over a key column as (word, bits); <= m_bits/63 + 1 rows.

    Each key sets k seeded bit positions; positions pack into 63-bit words
    (63, not 64: DuckDB raises on `1 << 63` where Java wraps, and 63 keeps
    every word a positive BIGINT on both engines)
    via bit_or — the same fully-aggregative machinery as the q22 bitmap
    distinct, so partials combine map-side and merging two filters is a
    word-wise OR. The artifact is a storable runtime join filter: build it
    once from the small side of a 100 TB join, ship kilobytes to every
    scan task, and drop fact rows BEFORE they reach the shuffle. (Spark's
    own injected bloom filters are per-query and engine-private; this one
    is deterministic — DuckDB rebuilds it bit-for-bit — and persistable.)
    """
    key_col = F.col(key) if isinstance(key, str) else key
    return (
        df.select(F.explode(_bloom_positions(key_col, k, m_bits)).alias("pos"))
        .select(
            F.expr("pos div 63").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 63 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Merge Bloom filters of identical (m_bits, k): word-wise OR."""
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_might_contain(
    bloom: DataFrame, keys: DataFrame, key: str, m_bits: int = 8192, k: int = 4
) -> DataFrame:
    """Probe: key passes iff ALL k bits are set; (key, might_contain).

    Never a false negative (pinned in tests); false-positive rate
    ~ (1 - e^(-kn/m))^k. The probe explodes k positions per key and joins
    the <= m_bits/64-row broadcast filter — the fact side never shuffles.
    """
    probes = keys.select(
        key, F.explode(_bloom_positions(F.col(key), k, m_bits)).alias("pos")
    ).select(
        key,
        F.expr("pos div 63").alias("word"),
        F.col("pos").cast("long").alias("pos"),
    )
    return (
        probes.join(F.broadcast(bloom), "word", "left")
        .select(
            key,
            F.coalesce(
                F.expr("(shiftright(bits, CAST(pos % 63 AS INT)) & 1L) = 1L"),
                F.lit(False),
            ).alias("bit_set"),
        )
        .groupBy(key)
        .agg(F.bool_and("bit_set").alias("might_contain"))
    )


def o_bloom_build(table_expr: str, key_expr: str, m_bits: int = 8192, k: int = 4) -> str:
    """DuckDB twin of :func:`bloom_build`."""
    branches = []
    for i in range(k):
        seeded = f"'b{i}:' || CAST(({key_expr}) AS VARCHAR)"
        branches.append(f"SELECT {o_h60(seeded)} % {m_bits} AS pos FROM {table_expr}")
    union = " UNION ALL ".join(branches)
    return f"""
    SELECT pos // 63 AS word, CAST(bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS BIGINT) AS bits
    FROM ({union}) GROUP BY pos // 63
    """


def o_bloom_might_contain(
    bloom_sql: str, keys_sql: str, key: str, m_bits: int = 8192, k: int = 4
) -> str:
    """DuckDB twin of :func:`bloom_might_contain`."""
    branches = []
    for i in range(k):
        seeded = f"'b{i}:' || CAST({key} AS VARCHAR)"
        branches.append(f"SELECT {key}, {o_h60(seeded)} % {m_bits} AS pos FROM keys")
    union = " UNION ALL ".join(branches)
    return f"""
    WITH bl AS ({bloom_sql}), keys AS ({keys_sql}), probes AS ({union})
    SELECT probes.{key},
           bool_and(coalesce((bl.bits >> CAST(probes.pos % 63 AS INT)) & 1 = 1, FALSE))
               AS might_contain
    FROM probes LEFT JOIN bl ON bl.word = probes.pos // 63
    GROUP BY probes.{key}
    """


# ---------------------------------------------------------------------------
# Grouped HLL — per-group approximate distinct counts
# ---------------------------------------------------------------------------


def hll_group_sketch(
    df: DataFrame, group_cols: list[str], key: str | Column, p: int = 9
) -> DataFrame:
    """Per-group HLL sketch: (group_cols..., bucket, rho); <= |groups| * 2^p rows.

    The per-group twin of :func:`hll_sketch` — approximate COUNT(DISTINCT key)
    GROUP BY group_cols for ARBITRARY key types (strings included), where the
    bitmap-word rewrite (q22/q13) needs dense non-negative integers. Shuffle
    is bounded by |groups| x 2^p regardless of data size; merging shards is
    (group, bucket)-wise max.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    rem_bits = HASH_BITS - p
    h = h60(key_col)
    rem = h % F.lit(1 << rem_bits)
    bitlen = F.when(rem == 0, F.lit(0)).otherwise(F.length(F.conv(rem, 10, 2)))
    return (
        # same NULL-key hygiene as hll_sketch/kmv_sketch: COUNT(DISTINCT)
        # ignores NULLs; a NULL key would otherwise emit a (group, NULL,
        # NULL) row and skew the per-group nonempty-bucket counts.
        df.where(key_col.isNotNull())
        .select(
            *group_cols,
            F.shiftright(h, rem_bits).alias("bucket"),
            (F.lit(rem_bits + 1) - bitlen).cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_group_estimate(sketch: DataFrame, group_cols: list[str], p: int = 9) -> DataFrame:
    """Per-group estimates from a grouped sketch; one row per group.

    Same integer-exact harmonic sum + single IEEE expression as
    :func:`hll_estimate`, evaluated per group.
    """
    m, rem_bits, alpha, scale = _hll_consts(p)
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("nonempty_buckets"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(rem_bits + 1) - F.col("rho")).cast("decimal(38,0)")
        ).alias("_t"),
    )
    harmonic = (
        F.col("_t")
        + (F.lit(m) - F.col("nonempty_buckets")).cast("decimal(38,0)")
        * F.lit(1 << (rem_bits + 1)).cast("decimal(38,0)")
    ).cast("double")
    raw_est = F.lit(alpha * m * m * scale) / harmonic
    zeros = F.lit(m) - F.col("nonempty_buckets")
    lin_est = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return agg.select(
        *group_cols,
        "nonempty_buckets",
        F.floor(
            F.when((zeros > 0) & (raw_est <= F.lit(2.5 * m)), lin_est).otherwise(raw_est)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("estimate"),
    )


def o_hll_group_sketch(table_expr: str, group_cols: list[str], key_expr: str, p: int = 9) -> str:
    """DuckDB twin of :func:`hll_group_sketch`."""
    rem_bits = HASH_BITS - p
    h = o_h60(key_expr)
    rem = f"({h} % {1 << rem_bits})"
    gcols = ", ".join(group_cols)
    return f"""
    SELECT {gcols}, {h} // {1 << rem_bits} AS bucket,
           CAST(max({rem_bits + 1} - (CASE WHEN {rem} = 0 THEN 0
                                           ELSE length(bin({rem})) END)) AS INT) AS rho
    FROM {table_expr}
    WHERE ({key_expr}) IS NOT NULL
    GROUP BY {gcols}, bucket
    """


def o_hll_group_estimate(sketch_sql: str, group_cols: list[str], p: int = 9) -> str:
    """DuckDB twin of :func:`hll_group_estimate`."""
    m, rem_bits, alpha, scale = _hll_consts(p)
    gcols = ", ".join(group_cols)
    harmonic = (
        f"CAST(CAST(_t AS HUGEINT) + CAST({m} - nonempty_buckets AS HUGEINT)"
        f" * CAST({1 << (rem_bits + 1)} AS HUGEINT) AS DOUBLE)"
    )
    raw_est = f"(CAST({alpha * m * m * scale!r} AS DOUBLE) / {harmonic})"
    lin_est = f"(CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / CAST({m} - nonempty_buckets AS DOUBLE)))"
    return f"""
    WITH sk AS ({sketch_sql}),
    agg AS (
        SELECT {gcols}, count(*) AS nonempty_buckets,
               sum(CAST(2 ** ({rem_bits + 1} - rho) AS HUGEINT)) AS _t
        FROM sk GROUP BY {gcols}
    )
    SELECT {gcols},
           CAST(nonempty_buckets AS BIGINT) AS nonempty_buckets,
           CAST(floor(CASE WHEN ({m} - nonempty_buckets) > 0 AND {raw_est} <= {2.5 * m!r}
                           THEN {lin_est} ELSE {raw_est} END + 0.5) AS BIGINT) AS estimate
    FROM agg
    """
