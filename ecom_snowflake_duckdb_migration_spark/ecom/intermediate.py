"""ecom_intermediate layer: lookups, entities, transactions.

Each function mirrors one model under
/root/reference/dbt/dbt_duckdb/models/ecom_intermediate/ 1:1 (cited per
function). Signature convention: ``fn(ref, ctx) -> DataFrame`` where ``ref``
resolves an upstream model/source name to a DataFrame and ``ctx`` supplies the
injectable run timestamp (SURVEY F10 — CURRENT_TIMESTAMP must be
deterministic for testing).

Scale notes: lookup models (4-25 rows) and brands/locations/addresses (low
cardinality) are broadcast on the probe side of every join — Spark's AQE plus
the session's raised broadcast threshold makes each of these a
BroadcastHashJoin with no shuffle of the fact side. The big aggregations
(customer_orders, product_orders) are partial-agg-friendly group-bys on the
join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import surrogate_key


def _lookup(src: DataFrame, col: str, id_name: str, out_name: str, ctx) -> DataFrame:
    """Shared shape of the 4 lookup models (e.g. lookups/education_types.sql):
    DISTINCT non-null values keyed by surrogate_key."""
    return (
        src.filter(F.col(col).isNotNull())
        .select(
            surrogate_key(col).alias(id_name),
            F.col(col).alias(out_name),
            ctx.ts_lit().alias("created_at"),
        )
        .distinct()
    )


def education_types(ref, ctx) -> DataFrame:
    # lookups/education_types.sql:1-6
    return _lookup(ref("stg_customers"), "education", "education_id", "education_type", ctx)


def marital_statuses(ref, ctx) -> DataFrame:
    # lookups/marital_statuses.sql:1-6
    return _lookup(ref("stg_customers"), "marital_status", "marital_status_id", "status_type", ctx)


def order_statuses(ref, ctx) -> DataFrame:
    # lookups/order_statuses.sql:1-6
    return _lookup(ref("stg_orders"), "status", "status_id", "status_name", ctx)


def payment_methods(ref, ctx) -> DataFrame:
    # lookups/payment_methods.sql:1-6
    return _lookup(ref("stg_orders"), "payment_method", "payment_method_id", "method_name", ctx)


def _parsed_parts(addr: str) -> list:
    """TRIM(SPLIT_PART(addr, ',', n)) for the reference's parse positions."""
    c = F.col(addr)
    return [
        F.trim(F.split_part(c, F.lit(","), F.lit(1))).alias("street_address"),
        F.trim(F.split_part(c, F.lit(","), F.lit(-4))).alias("postal_code"),
        F.trim(F.split_part(c, F.lit(","), F.lit(-3))).alias("city"),
        F.trim(F.split_part(c, F.lit(","), F.lit(-2))).alias("state"),
        F.trim(F.split_part(c, F.lit(","), F.lit(-1))).alias("country"),
    ]


def locations(ref, ctx) -> DataFrame:
    # entities/locations.sql:1-60 — 3-way UNION DISTINCT of shipping/billing
    # parses and customer city/state/country, filtered non-empty, surrogate key.
    orders = ref("stg_orders")

    def from_addr(col: str) -> DataFrame:
        c = F.col(col)
        return (
            orders.filter(c.isNotNull())
            .select(
                F.trim(F.split_part(c, F.lit(","), F.lit(-3))).alias("city"),
                F.trim(F.split_part(c, F.lit(","), F.lit(-2))).alias("state"),
                F.trim(F.split_part(c, F.lit(","), F.lit(-1))).alias("country"),
            )
            .distinct()
        )

    customers = (
        ref("stg_customers")
        .filter(
            F.col("city").isNotNull()
            & F.col("state").isNotNull()
            & F.col("country").isNotNull()
        )
        .select(
            F.trim("city").alias("city"),
            F.trim("state").alias("state"),
            F.trim("country").alias("country"),
        )
        .distinct()
    )

    all_locations = (
        from_addr("shipping_address").union(from_addr("billing_address")).union(customers)
    ).distinct()

    cleaned = all_locations.filter(
        (F.col("city") != "") & (F.col("state") != "") & (F.col("country") != "")
    )
    return cleaned.select(
        surrogate_key("city", "state", "country").alias("location_id"),
        "city",
        "state",
        "country",
        ctx.ts_lit().alias("created_at"),
    ).distinct()


def addresses(ref, ctx) -> DataFrame:
    # entities/addresses.sql:1-50 — parse both address roles, UNION DISTINCT,
    # validate non-empty city/state/country, attach location_id.
    orders = ref("stg_orders")

    def parsed(col: str) -> DataFrame:
        return (
            orders.filter(F.col(col).isNotNull())
            .select(F.col(col).alias("address"), *_parsed_parts(col))
            .distinct()
        )

    parsed_addresses = parsed("shipping_address").union(parsed("billing_address")).distinct()
    validated = parsed_addresses.filter(
        (F.col("city") != "") & (F.col("state") != "") & (F.col("country") != "")
    )
    locs = ref("locations").select("location_id", "city", "state", "country")
    return (
        validated.join(F.broadcast(locs), ["city", "state", "country"], "left")
        .filter(F.col("address").isNotNull())
        .select(
            surrogate_key("address").alias("address_id"),
            "street_address",
            "postal_code",
            F.coalesce(
                F.col("location_id"), surrogate_key("city", "state", "country")
            ).alias("location_id"),
            ctx.ts_lit().alias("created_at"),
        )
        .distinct()
    )


def brands(ref, ctx) -> DataFrame:
    # entities/brands.sql:1-13
    cleaned = (
        ref("stg_products")
        .filter(F.col("brand").isNotNull() & (F.trim("brand") != ""))
        .select(F.trim("brand").alias("brand_name"))
        .distinct()
    )
    return cleaned.select(
        surrogate_key("brand_name").alias("brand_id"),
        "brand_name",
        ctx.ts_lit().alias("created_at"),
    ).distinct()


def categories_enriched(ref, ctx) -> DataFrame:
    # entities/categories_enriched.sql:1-12 — fan-out joins then COUNT DISTINCT.
    c = ref("stg_categories").alias("c")
    s = ref("stg_subcategories").alias("s")
    p = ref("stg_products").alias("p")
    return (
        c.join(s, "category_id", "left")
        .join(p, "category_id", "left")
        .groupBy("category_id", "c.category_name", "c.created_at")
        .agg(
            F.countDistinct("s.subcategory_id").alias("subcategory_count"),
            F.countDistinct("p.product_id").alias("product_count"),
        )
        .select(
            "category_id", "category_name", "subcategory_count", "product_count", "created_at"
        )
    )


def subcategories_enriched(ref, ctx) -> DataFrame:
    # entities/subcategories_enriched.sql:1-9
    s = ref("stg_subcategories").alias("s")
    p = ref("stg_products").alias("p")
    return (
        s.join(p, "subcategory_id", "left")
        .groupBy("subcategory_id", "s.subcategory_name", "s.category_id", "s.created_at")
        .agg(F.countDistinct("p.product_id").alias("product_count"))
        .select(
            "subcategory_id", "subcategory_name", "category_id", "product_count", "created_at"
        )
    )


def customers_enriched(ref, ctx) -> DataFrame:
    # entities/customers_enriched.sql:1-58
    orders = ref("stg_orders")
    customer_orders = orders.groupBy("customer_id").agg(
        F.countDistinct("order_id").alias("total_orders"),
        F.sum("total_amount").alias("total_spent"),
        F.min("order_date").alias("first_order_date"),
        F.max("order_date").alias("last_order_date"),
    )
    validated = (
        ref("stg_customers")
        .filter(
            F.col("city").isNotNull()
            & F.col("state").isNotNull()
            & F.col("country").isNotNull()
            & (F.trim("city") != "")
            & (F.trim("state") != "")
            & (F.trim("country") != "")
        )
        .withColumn("cleaned_city", F.trim("city"))
        .withColumn("cleaned_state", F.trim("state"))
        .withColumn("cleaned_country", F.trim("country"))
    )
    edu = ref("education_types")
    mar = ref("marital_statuses")
    locs = ref("locations")
    return (
        validated.alias("c")
        .join(F.broadcast(edu.alias("e")), F.col("c.education") == F.col("e.education_type"), "left")
        .join(F.broadcast(mar.alias("m")), F.col("c.marital_status") == F.col("m.status_type"), "left")
        .join(
            F.broadcast(locs.alias("l")),
            (F.col("c.cleaned_city") == F.col("l.city"))
            & (F.col("c.cleaned_state") == F.col("l.state"))
            & (F.col("c.cleaned_country") == F.col("l.country")),
            "left",
        )
        .join(customer_orders.alias("co"), "customer_id", "left")
        .select(
            "customer_id",
            "c.email",
            "c.first_name",
            "c.last_name",
            "c.age",
            "c.gender",
            "c.annual_income",
            "e.education_id",
            "m.marital_status_id",
            F.coalesce(
                F.col("l.location_id"),
                surrogate_key("cleaned_city", "cleaned_state", "cleaned_country"),
            ).alias("location_id"),
            "c.signup_date",
            "c.last_login",
            "c.preferred_channel",
            "c.is_active",
            F.coalesce("co.total_orders", F.lit(0)).alias("total_orders"),
            F.coalesce("co.total_spent", F.lit(0)).alias("total_spent"),
            "co.first_order_date",
            "co.last_order_date",
            F.col("c.loaded_at").alias("created_at"),
        )
    )


def products_enriched(ref, ctx) -> DataFrame:
    # entities/products_enriched.sql:1-62
    items = ref("stg_order_items")
    product_orders = items.groupBy("product_id").agg(
        F.countDistinct("order_id").alias("total_orders"),
        F.sum("quantity").alias("total_quantity_sold"),
        F.sum("total_price").alias("total_revenue"),
    )
    reviews = ref("stg_reviews")
    product_reviews = reviews.groupBy("product_id").agg(
        F.count(F.lit(1)).alias("review_count"),
        F.avg("review_score").alias("avg_review_score"),
    )
    products = ref("stg_products")
    all_brands = (
        products.filter(F.col("brand").isNotNull() & (F.trim("brand") != ""))
        .select(
            F.trim("brand").alias("brand_name"),
            surrogate_key(F.trim("brand")).alias("brand_id"),
        )
        .distinct()
    )
    b = ref("brands")
    return (
        products.alias("p")
        .join(F.broadcast(b.alias("b")), F.trim("p.brand") == F.col("b.brand_name"), "left")
        .join(F.broadcast(all_brands.alias("ab")), F.trim("p.brand") == F.col("ab.brand_name"), "left")
        .join(F.broadcast(ref("stg_categories").alias("c")), F.col("p.category_id") == F.col("c.category_id"), "left")
        .join(
            F.broadcast(ref("stg_subcategories").alias("s")),
            (F.col("p.category_id") == F.col("s.category_id"))
            & (F.col("p.subcategory_id") == F.col("s.subcategory_id")),
            "left",
        )
        .join(product_orders.alias("po"), F.col("p.product_id") == F.col("po.product_id"), "left")
        .join(product_reviews.alias("pr"), F.col("p.product_id") == F.col("pr.product_id"), "left")
        .filter(F.col("p.product_id").isNotNull())
        .select(
            "p.product_id",
            "p.product_name",
            "p.description",
            "p.base_price",
            "p.sale_price",
            "p.stock_quantity",
            "p.weight_kg",
            "p.is_active",
            F.coalesce("b.brand_id", "ab.brand_id").alias("brand_id"),
            "p.category_id",
            "p.subcategory_id",
            F.coalesce("po.total_orders", F.lit(0)).alias("total_orders"),
            F.coalesce("po.total_quantity_sold", F.lit(0)).alias("total_quantity_sold"),
            F.coalesce("po.total_revenue", F.lit(0)).alias("total_revenue"),
            F.coalesce("pr.review_count", F.lit(0)).alias("review_count"),
            "pr.avg_review_score",
            "p.created_at",
        )
    )


def reviews_enriched(ref, ctx) -> DataFrame:
    # entities/reviews_enriched.sql:1-17
    return (
        ref("stg_reviews").alias("r")
        .join(ref("products_enriched").alias("p"), F.col("r.product_id") == F.col("p.product_id"), "left")
        .join(F.broadcast(ref("categories_enriched").alias("c")), F.col("p.category_id") == F.col("c.category_id"), "left")
        .join(F.broadcast(ref("subcategories_enriched").alias("s")), F.col("p.subcategory_id") == F.col("s.subcategory_id"), "left")
        .join(F.broadcast(ref("brands").alias("b")), F.col("p.brand_id") == F.col("b.brand_id"), "left")
        .select(
            "r.review_id",
            "r.product_id",
            "r.order_id",
            "r.customer_id",
            "r.review_score",
            "r.review_text",
            "p.product_name",
            "c.category_name",
            "s.subcategory_name",
            "b.brand_name",
            F.col("r.loaded_at").alias("created_at"),
        )
    )


def orders(ref, ctx) -> DataFrame:
    # transactions/orders.sql:1-29 — double role-join of addresses (J5) on
    # street_address, fan-out joins to items/reviews then aggregate (J6).
    o = ref("stg_orders").alias("o")
    addr = ref("addresses")
    agg = (
        o.join(
            F.broadcast(ref("order_statuses").alias("os")),
            F.col("o.status") == F.col("os.status_name"),
            "left",
        )
        .join(
            F.broadcast(ref("payment_methods").alias("pm")),
            F.col("o.payment_method") == F.col("pm.method_name"),
            "left",
        )
        .join(
            F.broadcast(addr.alias("sa")),
            F.col("o.shipping_address") == F.col("sa.street_address"),
            "left",
        )
        .join(
            F.broadcast(addr.alias("ba")),
            F.col("o.billing_address") == F.col("ba.street_address"),
            "left",
        )
        .join(ref("stg_order_items").alias("oi"), "order_id", "left")
        .join(ref("stg_reviews").alias("r"), "order_id", "left")
        .groupBy(
            "order_id",
            F.col("o.customer_id").alias("customer_id"),
            F.col("o.order_date").alias("order_date"),
            F.col("os.status_id").alias("status_id"),
            F.col("pm.payment_method_id").alias("payment_method_id"),
            F.col("sa.address_id").alias("shipping_address_id"),
            F.col("ba.address_id").alias("billing_address_id"),
            F.col("o.total_amount").alias("total_amount"),
            F.col("o.shipping_cost").alias("shipping_cost"),
            F.col("o.loaded_at").alias("created_at"),
        )
        .agg(
            F.countDistinct("oi.product_id").alias("unique_products"),
            F.sum("oi.quantity").alias("total_items"),
            F.bool_or(F.col("r.review_score").isNotNull()).alias("has_review"),
            F.avg("r.review_score").alias("avg_review_score"),
        )
    )
    return agg.select(
        "order_id", "customer_id", "order_date", "status_id", "payment_method_id",
        "shipping_address_id", "billing_address_id", "total_amount", "shipping_cost",
        "unique_products", "total_items", "has_review", "avg_review_score", "created_at",
    )


def order_items(ref, ctx) -> DataFrame:
    # transactions/order_items.sql:1-58 — validate-early semi join (J4),
    # FIRST_VALUE latest review per (order, product) (W1), dedup (DISTINCT).
    from pyspark.sql import Window

    base = ref("stg_order_items").filter(F.col("product_id").isNotNull())
    valid_products = ref("products_enriched").select("product_id").distinct()
    validated = base.join(valid_products, "product_id", "left_semi").distinct()

    w = Window.partitionBy("order_id", "product_id").orderBy(F.col("loaded_at").desc())
    reviews_deduped = (
        ref("stg_reviews")
        .select("order_id", "product_id", F.first("review_score").over(w).alias("review_score"))
        .distinct()
    )
    return (
        validated.alias("oi")
        .join(ref("stg_orders").alias("o"), "order_id", "left")
        .join(ref("products_enriched").alias("p"), "product_id", "left")
        .join(reviews_deduped.alias("r"), ["order_id", "product_id"], "left")
        .select(
            "oi.order_item_id",
            "order_id",
            "product_id",
            F.col("o.customer_id").alias("customer_id"),
            "oi.quantity",
            "oi.unit_price",
            "oi.total_price",
            "p.category_id",
            "p.subcategory_id",
            "p.brand_id",
            "r.review_score",
            "oi.created_at",
        )
        .distinct()
    )


def customer_interactions(ref, ctx) -> DataFrame:
    # transactions/customer_interactions.sql:1-14
    return (
        ref("stg_interactions").alias("i")
        .join(ref("stg_products").alias("p"), "product_id", "left")
        .select(
            "i.event_id",
            "i.customer_id",
            "product_id",
            "p.category_id",
            "p.subcategory_id",
            "i.event_type",
            "i.event_date",
            "i.device_type",
            "i.session_id",
            "i.created_at",
        )
    )
