"""Distributed seeded synthetic e-commerce data generator.

Replaces the reference's driver-side pandas/faker generators
(/root/reference/src/pipeline/0_generate_historic_synthetic_data.py and
generate_latest_synthetic_data.py) with a Spark-first design: every table is
``spark.range(n)`` plus deterministic hash-derived columns, so generation is
fully distributed, reproducible per (seed, n), and scales linearly to any
volume — a 100 TB dataset is the same code with a bigger ``n``.

Value domains follow FIXTURES.md / the reference generators:
- historic vs latest split with latest ids offset by 1,000,000
  (generate_latest_synthetic_data.py:19-24);
- money as exact-hundredth doubles; date/time columns as strings (staging
  TRY_CASTs them) including a few malformed values and ISO-with-millis forms;
- dirty rows the downstream models must filter: NULL/''/whitespace city and
  brand, comma-less street addresses (SPLIT_PART yields '' — SURVEY F2),
  duplicate (order_id, product_id) reviews across load batches (FIRST_VALUE
  dedup target), order_items pointing at missing products (semi-join filter),
  NULL review_id on historic rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ID_OFFSET = 1_000_000  # latest-feed id offset (generate_latest_synthetic_data.py:19)

_EPOCH_START = "2023-01-01 00:00:00"
_WINDOW_SECONDS = 2 * 365 * 24 * 3600  # 2023-01-01 .. ~2025-01-01

CITIES = ["Springfield", "Riverton", "Lakeside", "Fairview", "Brookhaven",
          "Maplewood", "Cedar Falls", "Ashland", "Georgetown", "Milton"]
STATES = ["CA", "NY", "TX", "WA", "IL", "FL", "OH", "CO", "GA", "NC"]
GENDERS = ["M", "F", "Other"]
MARITAL = ["Single", "Married", "Divorced", "Widowed"]
EDUCATION = ["High School", "Some College", "Bachelor", "Master", "PhD"]
LOCATION_TYPES = ["Urban", "Suburban", "Rural"]
CHANNELS = ["Web", "Mobile App", "Email"]
ORDER_STATUS = ["Pending", "Processing", "Shipped", "Delivered"]
PAYMENT = ["Credit Card", "PayPal", "Debit Card"]
EVENT_TYPES = ["view", "cart_add", "cart_remove", "wishlist_add", "search", "purchase"]
DEVICES = ["desktop", "mobile", "tablet"]
CATEGORY_NAMES = ["Electronics", "Fashion", "Home & Living", "Beauty", "Sports"]
SUBCATEGORY_NAMES = ["Accessories", "Essentials", "Premium", "Outdoor", "Classic"]
BRANDS = ["Acme Corp", "Globex", "Initech", "Umbrella", "Stark Industries",
          "Wayne Enterprises", "Tyrell", "Cyberdyne"]
STREETS = ["Oak Street", "Maple Avenue", "Pine Road", "Elm Boulevard", "Main Street"]
COMPANIES = ["Nova", "Zenith", "Apex", "Orbit", "Pulse"]
WORDS = ["Widget", "Gadget", "Device", "Tool", "Kit"]


def _h(seed: int, tag: str, id_col: Column, mod: int) -> Column:
    """Deterministic pseudo-random int in [0, mod) from (seed, tag, id)."""
    return F.pmod(F.xxhash64(F.lit(seed), F.lit(tag), id_col), F.lit(mod))


def _choice(seed: int, tag: str, id_col: Column, options: list[str]) -> Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (_h(seed, tag, id_col, len(options)) + 1).cast("int"))


def _money(seed: int, tag: str, id_col: Column, lo: float, hi: float) -> Column:
    cents = _h(seed, tag, id_col, int((hi - lo) * 100)) + int(lo * 100)
    return (cents / F.lit(100.0)).cast("double")


def _ts_string(seed: int, tag: str, id_col: Column, malformed_pct: int = 0) -> Column:
    """Timestamp-as-string in the 2023-2025 window; optionally a slice of
    malformed values and ISO-with-millis formatting (TRY_CAST targets)."""
    base = F.to_timestamp(F.lit(_EPOCH_START))
    offset = _h(seed, tag, id_col, _WINDOW_SECONDS)
    ts = F.timestamp_seconds(F.unix_timestamp(base) + offset)
    plain = F.date_format(ts, "yyyy-MM-dd HH:mm:ss")
    iso_millis = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS")
    style = _h(seed, tag + "_style", id_col, 100)
    out = F.when(style < 15, iso_millis).otherwise(plain)
    if malformed_pct:
        out = F.when(style >= 100 - malformed_pct, F.lit("not-a-date")).otherwise(out)
    return out


def _lineage(seed: int, df: DataFrame, id_col: str, latest_frac_pct: int = 20) -> DataFrame:
    """historic/latest split + batch lineage columns (P5)."""
    is_latest = _h(seed, "src", F.col(id_col), 100) < latest_frac_pct
    return (
        df.withColumn("data_source", F.when(is_latest, "latest").otherwise("historic"))
        .withColumn(
            "batch_id",
            F.when(is_latest, F.lit(f"batch-{seed}-latest")).otherwise(
                F.lit(f"batch-{seed}-historic")
            ),
        )
        .withColumn(
            "loaded_at",
            F.when(is_latest, F.lit("2026-01-02 00:00:00")).otherwise(
                F.lit("2026-01-01 00:00:00")
            ),
        )
    )


def _street(seed: int, tag: str, id_col: Column, role_offset: int = 0) -> Column:
    """Street address: mostly comma-less (faker parity — SPLIT_PART parses to
    ''), ~20% fully comma-separated 'street, postal, city, state, country'.

    The street number embeds (id, role) so street_address strings are unique
    across orders — the reference joins addresses back to orders on the BARE
    street string (transactions/orders.sql:21-24), so colliding street
    numbers would fan orders out and (correctly but confusingly) break the
    orders PK; faker's 5-digit numbering makes collisions rare in the
    reference, and uniqueness here keeps the quality gate meaningful."""
    num = id_col * 2 + F.lit(role_offset) + 10
    street = F.concat(num.cast("string"), F.lit(" "), _choice(seed, tag + "_st", id_col, STREETS))
    postal = (_h(seed, tag + "_zip", id_col, 89999) + 10000).cast("string")
    full = F.concat_ws(
        ", ",
        street,
        postal,
        _choice(seed, tag + "_city", id_col, CITIES),
        _choice(seed, tag + "_state", id_col, STATES),
        F.lit("USA"),
    )
    return F.when(_h(seed, tag + "_comma", id_col, 100) < 20, full).otherwise(street)


def generate_customers(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    i = F.col("id") + 1
    df = spark.range(n).select(
        i.cast("string").alias("customer_id"),
        F.concat(F.lit("user"), i.cast("string"), F.lit("@example.com")).alias("email"),
        F.concat(F.lit("First"), _h(seed, "fn", i, 200).cast("string")).alias("first_name"),
        F.concat(F.lit("Last"), _h(seed, "ln", i, 500).cast("string")).alias("last_name"),
        (_h(seed, "age", i, 73) + 18).alias("age"),
        _choice(seed, "gender", i, GENDERS).alias("gender"),
        _money(seed, "income", i, 15000, 200000).alias("annual_income"),
        _choice(seed, "marital", i, MARITAL).alias("marital_status"),
        _choice(seed, "edu", i, EDUCATION).alias("education"),
        _choice(seed, "loctype", i, LOCATION_TYPES).alias("location_type"),
        # ~6% dirty city values: NULL / '' / whitespace (customers_enriched filter)
        F.when(_h(seed, "cityq", i, 100) < 2, F.lit(None).cast("string"))
        .when(_h(seed, "cityq", i, 100) < 4, F.lit(""))
        .when(_h(seed, "cityq", i, 100) < 6, F.lit("   "))
        .otherwise(_choice(seed, "city", i, CITIES))
        .alias("city"),
        _choice(seed, "state", i, STATES).alias("state"),
        F.lit("USA").alias("country"),
        _ts_string(seed, "signup", i, malformed_pct=2).alias("signup_date"),
        _ts_string(seed, "login", i).alias("last_login"),
        _choice(seed, "channel", i, CHANNELS).alias("preferred_channel"),
        (_h(seed, "active", i, 10) < 9).alias("is_active"),
    )
    return _lineage(seed, df, "customer_id")


def generate_categories(spark: SparkSession, seed: int = 42) -> DataFrame:
    i = F.col("id") + 1
    df = spark.range(len(CATEGORY_NAMES)).select(
        i.cast("string").alias("category_id"),
        F.element_at(F.array(*[F.lit(c) for c in CATEGORY_NAMES]), i.cast("int")).alias(
            "category_name"
        ),
        _ts_string(seed, "cat_created", i).alias("created_at"),
    )
    return _lineage(seed, df, "category_id", latest_frac_pct=0)


def generate_subcategories(spark: SparkSession, seed: int = 42) -> DataFrame:
    # subcategory_id = category*100 + 1..5; names repeat across categories
    # (exercises STRING_AGG DISTINCT in dim_categories).
    df = spark.range(len(CATEGORY_NAMES) * 5).select(
        ((F.col("id") / 5 + 1).cast("long") * 100 + F.col("id") % 5 + 1)
        .cast("string")
        .alias("subcategory_id"),
        (F.col("id") / 5 + 1).cast("long").cast("string").alias("category_id"),
        F.element_at(
            F.array(*[F.lit(s) for s in SUBCATEGORY_NAMES]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("subcategory_name"),
        _ts_string(42, "subcat_created", F.col("id") + 1).alias("created_at"),
    )
    return _lineage(seed, df, "subcategory_id", latest_frac_pct=0)


def generate_products(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    i = F.col("id") + 1
    base = _money(seed, "base", i, 10, 1000)
    df = spark.range(n).select(
        i.cast("string").alias("product_id"),
        (_h(seed, "cat", i, 5) + 1).cast("string").alias("category_id"),
        ((_h(seed, "cat", i, 5) + 1) * 100 + _h(seed, "subcat", i, 5) + 1)
        .cast("string")
        .alias("subcategory_id"),
        F.concat(
            _choice(seed, "pc", i, COMPANIES), F.lit(" "), _choice(seed, "pw", i, WORDS)
        ).alias("product_name"),
        F.concat(F.lit("Description of product "), i.cast("string")).alias("description"),
        base.alias("base_price"),
        F.round(base * (F.lit(0.8) + _h(seed, "disc", i, 21) / F.lit(100.0)), 2).alias(
            "sale_price"
        ),
        _h(seed, "stock", i, 1001).alias("stock_quantity"),
        ((_h(seed, "weight", i, 1990) + 10) / F.lit(100.0)).alias("weight_kg"),
        (_h(seed, "pactive", i, 10) < 9).alias("is_active"),
        _ts_string(seed, "pcreated", i).alias("created_at"),
        # ~8% dirty brands: NULL / '' / padded whitespace (brands.sql filter/TRIM)
        F.when(_h(seed, "brandq", i, 100) < 3, F.lit(None).cast("string"))
        .when(_h(seed, "brandq", i, 100) < 5, F.lit(""))
        .when(
            _h(seed, "brandq", i, 100) < 8,
            F.concat(F.lit("  "), _choice(seed, "brand", i, BRANDS), F.lit(" ")),
        )
        .otherwise(_choice(seed, "brand", i, BRANDS))
        .alias("brand"),
        F.concat(F.lit("SKU-"), F.lpad(i.cast("string"), 5, "0")).alias("sku"),
        ((_h(seed, "rating", i, 21) + 30) / F.lit(10.0)).alias("rating"),
        _h(seed, "rc", i, 1001).alias("review_count"),
    )
    return _lineage(seed, df, "product_id")


def generate_orders(spark: SparkSession, n_customers: int, seed: int = 42) -> DataFrame:
    n = n_customers * 5
    i = F.col("id") + 1
    df = spark.range(n).select(
        i.cast("string").alias("order_id"),
        (_h(seed, "ocust", i, n_customers) + 1).cast("string").alias("customer_id"),
        _ts_string(seed, "odate", i, malformed_pct=1).alias("order_date"),
        _choice(seed, "ostatus", i, ORDER_STATUS).alias("status"),
        _money(seed, "ototal", i, 20, 3000).alias("total_amount"),
        _money(seed, "oship", i, 5, 20).alias("shipping_cost"),
        _choice(seed, "opay", i, PAYMENT).alias("payment_method"),
        _street(seed, "oshipaddr", i, role_offset=0).alias("shipping_address"),
        # billing == shipping for ~70% of orders (self-join J5 hits both roles)
        F.when(
            _h(seed, "osame", i, 100) < 70, _street(seed, "oshipaddr", i, role_offset=0)
        ).otherwise(_street(seed, "obilladdr", i, role_offset=1)).alias("billing_address"),
        _ts_string(seed, "ocreated", i).alias("created_at"),
        _ts_string(seed, "oupdated", i).alias("updated_at"),
    )
    return _lineage(seed, df, "order_id")


def generate_order_items(
    spark: SparkSession, n_customers: int, n_products: int, seed: int = 42
) -> DataFrame:
    n_orders = n_customers * 5
    # Up to 3 item slots per order; slot survives if its index < the order's
    # item count (1..3) — poisson-ish fan-out without driver loops.
    raw = spark.range(n_orders * 3).select(
        (F.col("id") / 3 + 1).cast("long").alias("onum"),
        (F.col("id") % 3).alias("slot"),
        (F.col("id") + 1).alias("inum"),
    )
    kept = raw.filter(
        F.col("slot") < _h(seed, "oi_n", F.col("onum"), 3) + 1
    )
    i = F.col("inum")
    unit = _money(seed, "oi_price", i, 10, 1000)
    qty = _h(seed, "oi_qty", i, 3) + 1
    # ~1.5% of items reference a product id beyond the catalog (missing-FK
    # rows the order_items semi-join must drop; severity-warn relationship).
    pid = F.when(
        _h(seed, "oi_badfk", i, 1000) < 15,
        (F.lit(n_products) + _h(seed, "oi_badpid", i, 50) + 1),
    ).otherwise(_h(seed, "oi_pid", i, n_products) + 1)
    df = kept.select(
        i.cast("string").alias("order_item_id"),
        F.col("onum").cast("string").alias("order_id"),
        pid.cast("string").alias("product_id"),
        qty.alias("quantity"),
        unit.alias("unit_price"),
        F.round(unit * qty, 2).alias("total_price"),
        _ts_string(seed, "oi_created", i).alias("created_at"),
    )
    return _lineage(seed, df, "order_item_id")


def generate_reviews(
    spark: SparkSession, n_customers: int, n_products: int, seed: int = 42
) -> DataFrame:
    n_orders = n_customers * 5
    n = int(n_orders * 1.2)
    i = F.col("id") + 1
    base = spark.range(n).select(
        i.alias("rnum"),
        (_h(seed, "r_ord", i, n_orders) + 1).alias("onum"),
        (_h(seed, "r_pid", i, n_products) + 1).alias("pnum"),
        (_h(seed, "r_cust", i, n_customers) + 1).alias("cnum"),
        (_h(seed, "r_score", i, 5) + 1).alias("score"),
    )
    # A second batch re-reviews ~10% of (order, product) pairs with a newer
    # loaded_at — the FIRST_VALUE-dedup target in order_items.sql:28-37.
    dups = base.filter(_h(seed, "r_dup", F.col("rnum"), 10) == 0).select(
        (F.col("rnum") + n).alias("rnum"),
        "onum",
        "pnum",
        "cnum",
        (_h(seed, "r_score2", F.col("rnum"), 5) + 1).alias("score"),
    )
    def finish(df: DataFrame, batch: str, loaded: str) -> DataFrame:
        r = F.col("rnum")
        # historic rows carry NULL review_id (ingested_data/reviews_combined.csv:2)
        rid = F.when(F.lit(batch) == "historic", F.lit(None).cast("string")).otherwise(
            (r + ID_OFFSET).cast("string")
        )
        # Per-row loaded_at offsets give FIRST_VALUE(... ORDER BY loaded_at
        # DESC) a total order — the reference's dedup is otherwise
        # tie-nondeterministic (order_items.sql:28-37).
        loaded_ts = F.date_format(
            F.timestamp_seconds(
                F.unix_timestamp(F.to_timestamp(F.lit(loaded))) + F.pmod(r, 86400)
            ),
            "yyyy-MM-dd HH:mm:ss",
        )
        return df.select(
            rid.alias("review_id"),
            F.col("pnum").cast("string").alias("product_id"),
            F.col("onum").cast("string").alias("order_id"),
            F.col("cnum").cast("string").alias("customer_id"),
            F.col("score").alias("review_score"),
            F.concat(F.lit("Review for product "), F.col("pnum").cast("string")).alias(
                "review_text"
            ),
            F.lit(batch).alias("data_source"),
            F.lit(f"batch-{seed}-{batch}").alias("batch_id"),
            loaded_ts.alias("loaded_at"),
        )

    return finish(base, "historic", "2026-01-01 00:00:00").unionByName(
        finish(dups, "latest", "2026-01-02 00:00:00")
    )


def generate_interactions(
    spark: SparkSession, n_customers: int, n_products: int, seed: int = 42
) -> DataFrame:
    n = n_customers * 15
    i = F.col("id") + 1
    df = spark.range(n).select(
        i.cast("string").alias("event_id"),
        (_h(seed, "i_cust", i, n_customers) + 1).cast("string").alias("customer_id"),
        (_h(seed, "i_pid", i, n_products) + 1).cast("string").alias("product_id"),
        _choice(seed, "i_type", i, EVENT_TYPES).alias("event_type"),
        _ts_string(seed, "i_date", i, malformed_pct=1).alias("event_date"),
        _choice(seed, "i_dev", i, DEVICES).alias("device_type"),
        F.concat(
            F.lit("session_"), _h(seed, "i_sess", i, n_customers * 3).cast("string")
        ).alias("session_id"),
        _ts_string(seed, "i_date", i).alias("created_at"),
    )
    return _lineage(seed, df, "event_id")


def generate_all(
    spark: SparkSession, n_customers: int = 1000, seed: int = 42
) -> dict[str, DataFrame]:
    """All 8 raw tables at a scale factor expressed as customer count
    (reference default n_customers=1000, 0_generate_historic...py:361)."""
    n_products = max(n_customers, 5)
    return {
        "customers": generate_customers(spark, n_customers, seed),
        "products": generate_products(spark, n_products, seed),
        "orders": generate_orders(spark, n_customers, seed),
        "order_items": generate_order_items(spark, n_customers, n_products, seed),
        "reviews": generate_reviews(spark, n_customers, n_products, seed),
        "categories": generate_categories(spark, seed),
        "subcategories": generate_subcategories(spark, seed),
        "interactions": generate_interactions(spark, n_customers, n_products, seed),
    }
