"""ecom_marts layer: dimensions + fact models.

Each function mirrors one model under
/root/reference/dbt/dbt_duckdb/models/ecom_marts/ 1:1 (cited per function).
CURRENT_DATE / CURRENT_TIMESTAMP are injected via ``ctx`` (SURVEY F10) so
results are deterministic and oracle-comparable.

Type parity notes (SURVEY §7 hard parts):
- DuckDB ``date_trunc('day'|'month', x)`` returns DATE for both DATE and
  TIMESTAMP inputs (verified against DuckDB 1.x) while Spark's ``date_trunc``
  returns TIMESTAMP — every reference day/month truncation therefore maps to
  ``F.trunc``/``F.to_date`` (DATE-typed) here.
- DuckDB EXTRACT(DOW) is Sunday=0; Spark ``dayofweek`` is Sunday=1 → dow_sunday0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import dow_sunday0, string_agg_distinct_ordered


def dim_categories(ref, ctx) -> DataFrame:
    # core/dim_categories.sql:1-28 — ordered-distinct STRING_AGG of
    # subcategory names per category (A6).
    c = ref("categories_enriched")
    s = ref("subcategories_enriched")
    hierarchy = (
        c.alias("c")
        .join(F.broadcast(s.alias("s")), "category_id", "left")
        .groupBy("category_id", "c.category_name")
        .agg(string_agg_distinct_ordered("s.subcategory_name").alias("subcategories"))
    )
    return (
        c.alias("c2")
        .join(F.broadcast(hierarchy.alias("ch")), "category_id", "left")
        .select("category_id", "c2.category_name", "ch.subcategories", "c2.created_at")
    )


def dim_customers(ref, ctx) -> DataFrame:
    # core/dim_customers.sql:1-55 — denormalized customer dim with status
    # ladder (F5), interval arithmetic (F11), DATE_DIFF lifetime (F12).
    c = ref("customers_enriched")
    orders = ref("orders")
    o = orders.groupBy("customer_id").agg(
        F.countDistinct("order_id").alias("total_orders"),
        F.sum("total_amount").alias("total_spent"),
        F.min("order_date").alias("first_order_date"),
        F.max("order_date").alias("last_order_date"),
    )
    run_date = ctx.date_lit()
    return (
        c.alias("c")
        .join(F.broadcast(ref("locations").alias("l")), F.col("c.location_id") == F.col("l.location_id"), "left")
        .join(F.broadcast(ref("education_types").alias("et")), F.col("c.education_id") == F.col("et.education_id"), "left")
        .join(F.broadcast(ref("marital_statuses").alias("ms")), F.col("c.marital_status_id") == F.col("ms.marital_status_id"), "left")
        .join(o.alias("o"), "customer_id", "left")
        .select(
            "customer_id",
            "c.email",
            "c.first_name",
            "c.last_name",
            "c.age",
            "c.gender",
            "c.annual_income",
            "l.city",
            "l.state",
            "l.country",
            "et.education_type",
            F.col("ms.status_type").alias("marital_status"),
            F.coalesce("o.total_orders", F.lit(0)).alias("total_orders"),
            F.coalesce("o.total_spent", F.lit(0)).alias("total_spent"),
            F.coalesce(
                F.col("o.total_spent") / F.nullif("o.total_orders", F.lit(0)), F.lit(0)
            ).alias("avg_order_value"),
            "o.first_order_date",
            "o.last_order_date",
            F.when(
                F.col("o.last_order_date") >= F.add_months(run_date, -3), "Active"
            )
            .when(F.col("o.last_order_date") >= F.add_months(run_date, -6), "At Risk")
            .otherwise("Churned")
            .alias("customer_status"),
            F.datediff(
                run_date,
                F.to_date(F.coalesce("o.first_order_date", "c.signup_date")),
            ).alias("customer_lifetime_days"),
            "c.signup_date",
            "c.last_login",
            "c.is_active",
            "c.created_at",
            ctx.ts_lit().alias("updated_at"),
        )
    )


def dim_dates(ref, ctx) -> DataFrame:
    # core/dim_dates.sql:1-20 — UNION (distinct) of order/event timestamps;
    # date_day stays TIMESTAMP-typed to match DuckDB (SURVEY hard-part 9).
    days = (
        ref("orders").select(F.col("order_date").alias("date_day"))
        .union(ref("customer_interactions").select(F.col("event_date").alias("date_day")))
        .distinct()
    )
    return days.select(
        "date_day",
        F.year("date_day").cast("long").alias("year"),
        F.month("date_day").cast("long").alias("month"),
        dow_sunday0("date_day").cast("long").alias("day_of_week"),
        F.trunc("date_day", "month").alias("first_day_of_month"),
        F.last_day("date_day").alias("last_day_of_month"),
    ).distinct()


def dim_locations(ref, ctx) -> DataFrame:
    # core/dim_locations.sql:1-16 — fan-out joins then GROUP BY all columns
    # (pure dedup of location rows that survive the join).
    return (
        ref("locations").alias("l")
        .join(ref("customers_enriched").alias("c"), "location_id", "left")
        .join(ref("orders").alias("o"), "customer_id", "left")
        .groupBy("location_id", "l.city", "l.state", "l.country")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("location_id", "city", "state", "country")
    )


def dim_products(ref, ctx) -> DataFrame:
    # core/dim_products.sql:1-31
    return (
        ref("products_enriched").alias("p")
        .join(F.broadcast(ref("categories_enriched").alias("c")), F.col("p.category_id") == F.col("c.category_id"), "left")
        .join(F.broadcast(ref("subcategories_enriched").alias("s")), F.col("p.subcategory_id") == F.col("s.subcategory_id"), "left")
        .join(F.broadcast(ref("brands").alias("b")), F.col("p.brand_id") == F.col("b.brand_id"), "left")
        .select(
            "p.product_id",
            F.col("c.category_id").alias("category_id"),
            "p.product_name",
            "p.description",
            "p.base_price",
            "p.sale_price",
            "p.stock_quantity",
            "c.category_name",
            "s.subcategory_name",
            "b.brand_name",
            "p.is_active",
            "p.created_at",
            ctx.ts_lit().alias("updated_at"),
        )
    )


def fct_customer_activity(ref, ctx) -> DataFrame:
    # customer/fct_customer_activity.sql:1-38 — conditional counts (A3) and
    # conditional distinct counts (A4) by month. DuckDB DATE_TRUNC('month',
    # DATE) → DATE, so activity_month is DATE-typed via F.trunc.
    c = ref("customers_enriched")
    i = ref("customer_interactions")
    joined = (
        c.alias("c")
        .join(i.alias("i"), "customer_id", "left")
        .filter(F.to_date("i.event_date").isNotNull())
    )
    et = F.col("i.event_type")
    return (
        joined.groupBy(
            "customer_id",
            F.col("c.email").alias("email"),
            F.trunc(F.to_date("i.event_date"), "month").alias("activity_month"),
        )
        .agg(
            F.count(F.when(et == "view", 1)).alias("total_views"),
            F.countDistinct(F.when(et == "view", F.col("i.product_id"))).alias(
                "unique_products_viewed"
            ),
            F.count(F.when(et == "cart_add", 1)).alias("cart_adds"),
            F.countDistinct(F.when(et == "cart_add", F.col("i.product_id"))).alias(
                "unique_products_added"
            ),
            F.count(F.when(et == "purchase", 1)).alias("purchases"),
            F.countDistinct(F.when(et == "purchase", F.col("i.product_id"))).alias(
                "unique_products_purchased"
            ),
            F.countDistinct("i.session_id").alias("total_sessions"),
            F.countDistinct("i.device_type").alias("devices_used"),
        )
        .withColumn("updated_at", ctx.ts_lit())
    )


def fct_customer_orders(ref, ctx) -> DataFrame:
    # customer/fct_customer_orders.sql:1-21 — grouped column reused inside an
    # aggregate expression (A8). Incremental config is declared but the model
    # is materialized 'table' → full refresh (SURVEY S11 quirk).
    return (
        ref("orders").alias("o")
        .join(ref("order_items").alias("oi"), "order_id", "left")
        .join(ref("reviews_enriched").alias("r"), "order_id", "left")
        .groupBy(
            F.col("o.customer_id").alias("customer_id"),
            "order_id",
            F.col("o.order_date").alias("order_date"),
            F.col("o.total_amount").alias("total_amount"),
        )
        .agg(
            F.countDistinct("oi.product_id").alias("unique_products"),
            F.sum("oi.quantity").alias("total_items"),
            (
                F.col("o.total_amount")
                / F.nullif(F.countDistinct("oi.product_id"), F.lit(0))
            ).alias("avg_order_value"),
            F.avg("r.review_score").alias("avg_review_score"),
        )
        .select(
            "customer_id", "order_id", "order_date", "total_amount",
            "unique_products", "total_items", "avg_order_value", "avg_review_score",
        )
    )


def fct_customer_reviews(ref, ctx) -> DataFrame:
    # customer/fct_customer_reviews.sql:1-17
    return (
        ref("reviews_enriched").alias("r")
        .join(ref("products_enriched").alias("p"), "product_id", "inner")
        .select(
            "r.customer_id",
            "product_id",
            "r.order_id",
            "r.review_score",
            "r.review_text",
            "p.category_id",
            "p.subcategory_id",
        )
    )


def fct_order_details(ref, ctx) -> DataFrame:
    # sales/fct_order_details.sql:1-62 — the 11-way star join (J3/J5).
    return (
        ref("orders").alias("o")
        .join(ref("order_items").alias("oi"), F.col("o.order_id") == F.col("oi.order_id"), "inner")
        .join(ref("customers_enriched").alias("c"), F.col("o.customer_id") == F.col("c.customer_id"), "inner")
        .join(ref("locations").alias("lc"), F.col("c.location_id") == F.col("lc.location_id"), "inner")
        .join(ref("products_enriched").alias("p"), F.col("oi.product_id") == F.col("p.product_id"), "inner")
        .join(F.broadcast(ref("categories_enriched").alias("ca")), F.col("p.category_id") == F.col("ca.category_id"), "inner")
        .join(F.broadcast(ref("brands").alias("b")), F.col("p.brand_id") == F.col("b.brand_id"), "inner")
        .join(F.broadcast(ref("order_statuses").alias("os")), F.col("o.status_id") == F.col("os.status_id"), "left")
        .join(F.broadcast(ref("payment_methods").alias("pm")), F.col("o.payment_method_id") == F.col("pm.payment_method_id"), "left")
        .join(ref("addresses").alias("sa"), F.col("o.shipping_address_id") == F.col("sa.address_id"), "left")
        .join(ref("locations").alias("ls"), F.col("sa.location_id") == F.col("ls.location_id"), "left")
        .join(
            ref("reviews_enriched").alias("r"),
            (F.col("o.order_id") == F.col("r.order_id"))
            & (F.col("oi.product_id") == F.col("r.product_id")),
            "left",
        )
        .select(
            F.col("o.order_id").alias("order_id"),
            F.col("o.order_date").alias("order_date"),
            F.col("c.customer_id").alias("customer_id"),
            F.col("c.email").alias("email"),
            F.col("lc.city").alias("customer_city"),
            F.col("lc.state").alias("customer_state"),
            F.col("p.product_id").alias("product_id"),
            F.col("p.product_name").alias("product_name"),
            F.col("ca.category_name").alias("category_name"),
            F.col("b.brand_name").alias("brand_name"),
            F.col("os.status_name").alias("status_name"),
            F.col("pm.method_name").alias("payment_method"),
            F.col("sa.street_address").alias("shipping_address"),
            F.col("ls.city").alias("shipping_city"),
            F.col("ls.state").alias("shipping_state"),
            F.col("oi.quantity").alias("quantity"),
            F.col("oi.unit_price").alias("unit_price"),
            F.col("oi.total_price").alias("item_total"),
            F.col("o.shipping_cost").alias("shipping_cost"),
            F.col("o.total_amount").alias("order_total"),
            F.col("r.review_score").alias("review_score"),
            F.col("o.created_at").alias("created_at"),
            ctx.ts_lit().alias("updated_at"),
        )
    )


def fct_product_interactions(ref, ctx) -> DataFrame:
    # sales/fct_product_interactions.sql:1-16 — conditional DISTINCT counts
    # (A4); event_day is DATE (DuckDB date_trunc('day', ts) -> DATE).
    i = ref("customer_interactions")
    et = F.col("event_type")
    return i.groupBy(
        "product_id", F.to_date("event_date").alias("event_day")
    ).agg(
        F.countDistinct(F.when(et == "view", F.col("event_id"))).alias("views"),
        F.countDistinct(F.when(et == "cart_add", F.col("event_id"))).alias("cart_adds"),
        F.countDistinct(F.when(et == "wishlist_add", F.col("event_id"))).alias(
            "wishlist_adds"
        ),
        F.countDistinct("customer_id").alias("unique_customers"),
    )


def fct_product_performance(ref, ctx) -> DataFrame:
    # sales/fct_product_performance.sql:1-19 — includes the COUNT(DISTINCT
    # review_score) "review_count" quirk (A10), replicated verbatim.
    return (
        ref("products_enriched").alias("p")
        .join(ref("order_items").alias("oi"), "product_id", "left")
        .join(ref("orders").alias("o"), "order_id", "left")
        .join(ref("reviews_enriched").alias("r"), "product_id", "left")
        .groupBy(
            "product_id", F.trunc(F.col("o.order_date"), "month").alias("month")
        )
        .agg(
            F.countDistinct("o.order_id").alias("total_orders"),
            F.sum("oi.quantity").alias("units_sold"),
            F.sum("oi.total_price").alias("revenue"),
            F.avg("r.review_score").alias("avg_rating"),
            F.countDistinct("r.review_score").alias("review_count"),
        )
    )


def fct_sales_by_date(ref, ctx) -> DataFrame:
    # sales/fct_sales_by_date.sql:1-18 — daily rollup with derived ratios
    # (A7). sale_date is DATE-typed (DuckDB date_trunc('day', DATE) → DATE).
    o = ref("orders")
    return (
        o.groupBy(F.to_date("order_date").alias("sale_date"))
        .agg(
            F.countDistinct("order_id").alias("total_orders"),
            F.countDistinct("customer_id").alias("unique_customers"),
            F.sum("total_amount").alias("total_revenue"),
            F.sum("shipping_cost").alias("total_shipping"),
            (F.sum("total_amount") - F.sum("shipping_cost")).alias("net_revenue"),
            F.avg("total_amount").alias("avg_order_value"),
            (F.sum("total_amount") / F.countDistinct("customer_id")).alias(
                "revenue_per_customer"
            ),
        )
        .withColumn("updated_at", ctx.ts_lit())
    )


def fct_sales_by_product(ref, ctx) -> DataFrame:
    # sales/fct_sales_by_product.sql:1-18
    return (
        ref("products_enriched").alias("p")
        .join(ref("order_items").alias("oi"), "product_id", "inner")
        .join(ref("orders").alias("o"), "order_id", "inner")
        .groupBy(
            "product_id",
            F.col("p.category_id").alias("category_id"),
            F.trunc(F.col("o.order_date"), "month").alias("sales_month"),
        )
        .agg(
            F.countDistinct("o.order_id").alias("total_orders"),
            F.sum("oi.quantity").alias("units_sold"),
            F.sum("oi.total_price").alias("revenue"),
            F.avg("oi.unit_price").alias("avg_selling_price"),
        )
    )


def fct_sales_by_region(ref, ctx) -> DataFrame:
    # sales/fct_sales_by_region.sql:1-18
    return (
        ref("orders").alias("o")
        .join(ref("customers_enriched").alias("c"), "customer_id", "inner")
        .join(F.broadcast(ref("locations").alias("l")), F.col("c.location_id") == F.col("l.location_id"), "inner")
        .groupBy(
            F.col("l.state").alias("state"),
            F.col("l.country").alias("country"),
            F.trunc(F.col("o.order_date"), "month").alias("sales_month"),
        )
        .agg(
            F.countDistinct("o.order_id").alias("total_orders"),
            F.countDistinct("o.customer_id").alias("unique_customers"),
            F.sum("o.total_amount").alias("total_revenue"),
            F.avg("o.total_amount").alias("avg_order_value"),
        )
    )
