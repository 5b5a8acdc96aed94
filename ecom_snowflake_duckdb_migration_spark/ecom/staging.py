"""ecom_staging layer: typed projections (SURVEY P1/P2).

Each spec mirrors one model in
/root/reference/dbt/dbt_duckdb/models/ecom_staging/stg_*.sql 1:1 — the
reference's de-facto schema contract: plain CAST for safe conversions,
TRY_CAST (malformed -> NULL) for string-borne timestamps via
``functions.core.try_to_timestamp`` (non-ANSI cast bounded to years 1..9999,
so the semantics hold even under an ANSI-enabled session and out-of-range
years never cross the Python datetime boundary).

Materialization: views (dbt/dbt_duckdb/dbt_project.yml:19-20) — staging stays
lazy, so Catalyst fuses these casts into downstream plans and column pruning
reaches the raw scan (a staging model never forces a materialization barrier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import try_to_timestamp

_LINEAGE = [("data_source", "string"), ("batch_id", "string"), ("loaded_at", "try_timestamp")]

# (column, cast target); "try_timestamp" marks TRY_CAST AS TIMESTAMP columns.
STAGING_SPECS: dict[str, list[tuple[str, str]]] = {
    # stg_customers.sql:5-26
    "stg_customers": [
        ("customer_id", "string"), ("email", "string"), ("first_name", "string"),
        ("last_name", "string"), ("age", "int"), ("gender", "string"),
        ("annual_income", "decimal(12,2)"), ("marital_status", "string"),
        ("education", "string"), ("location_type", "string"), ("city", "string"),
        ("state", "string"), ("country", "string"), ("signup_date", "try_timestamp"),
        ("last_login", "try_timestamp"), ("preferred_channel", "string"),
        ("is_active", "boolean"),
    ],
    # stg_products.sql:5-24
    "stg_products": [
        ("product_id", "string"), ("category_id", "string"), ("subcategory_id", "string"),
        ("product_name", "string"), ("description", "string"),
        ("base_price", "decimal(12,2)"), ("sale_price", "decimal(12,2)"),
        ("stock_quantity", "int"), ("weight_kg", "decimal(8,2)"),
        ("is_active", "boolean"), ("created_at", "try_timestamp"), ("brand", "string"),
        ("sku", "string"), ("rating", "decimal(3,1)"), ("review_count", "int"),
    ],
    # stg_orders.sql:5-21
    "stg_orders": [
        ("order_id", "string"), ("customer_id", "string"),
        ("order_date", "try_timestamp"), ("status", "string"),
        ("total_amount", "decimal(12,2)"), ("shipping_cost", "decimal(12,2)"),
        ("payment_method", "string"), ("shipping_address", "string"),
        ("billing_address", "string"), ("created_at", "try_timestamp"),
        ("updated_at", "try_timestamp"),
    ],
    # stg_order_items.sql:5-15
    "stg_order_items": [
        ("order_item_id", "string"), ("order_id", "string"), ("product_id", "string"),
        ("quantity", "int"), ("unit_price", "decimal(12,2)"),
        ("total_price", "decimal(12,2)"), ("created_at", "try_timestamp"),
    ],
    # stg_reviews.sql:5-14
    "stg_reviews": [
        ("review_id", "string"), ("product_id", "string"), ("order_id", "string"),
        ("customer_id", "string"), ("review_score", "int"), ("review_text", "string"),
    ],
    # stg_categories.sql:5-12
    "stg_categories": [
        ("category_id", "string"), ("category_name", "string"),
        ("created_at", "try_timestamp"),
    ],
    # stg_subcategories.sql:5-12
    "stg_subcategories": [
        ("subcategory_id", "string"), ("category_id", "string"),
        ("subcategory_name", "string"), ("created_at", "try_timestamp"),
    ],
    # stg_interactions.sql:5-17
    "stg_interactions": [
        ("event_id", "string"), ("customer_id", "string"), ("product_id", "string"),
        ("event_type", "string"), ("event_date", "try_timestamp"),
        ("device_type", "string"), ("session_id", "string"),
        ("created_at", "try_timestamp"),
    ],
}

RAW_FOR_STAGING = {name: name.removeprefix("stg_") for name in STAGING_SPECS}


def _cast(col: str, target: str) -> F.Column:
    if target == "try_timestamp":
        # bounded to years 1..9999 — see functions.core.try_to_timestamp
        return try_to_timestamp(col).alias(col)
    return F.col(col).cast(target).alias(col)


def stage(raw_df: DataFrame, model: str) -> DataFrame:
    spec = STAGING_SPECS[model] + _LINEAGE
    return raw_df.select(*[_cast(c, t) for c, t in spec])
