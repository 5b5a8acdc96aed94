"""Raw-layer schemas — the ingest type contract.

Source of truth: the per-table dtype maps in
/root/reference/src/pipeline/ingest_latest_synthetic_data.py:305-390 and the
dtype->DuckDB mapping at :425-441. Conventions:
- every ``*_id`` column is VARCHAR (forced at ingest, :428-429, 510-513);
- money/weight/rating arrive as DOUBLE (pandas float64) and are tightened to
  DECIMAL in staging;
- date/time columns arrive as STRINGS (CSV/JSON provenance; normalized to
  '%Y-%m-%d %H:%M:%S' at :213-220 but occasionally ISO-with-millis or
  malformed) — staging TRY_CASTs them, malformed -> NULL;
- every table carries the lineage columns data_source/batch_id/loaded_at
  (0_ingest_historic_synthetic_data.py:121-123).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_LINEAGE = [
    StructField("data_source", StringType()),
    StructField("batch_id", StringType()),
    StructField("loaded_at", StringType()),
]


def _schema(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t) for n, t in fields] + _LINEAGE)


RAW_SCHEMAS: dict[str, StructType] = {
    "customers": _schema(
        ("customer_id", StringType()),
        ("email", StringType()),
        ("first_name", StringType()),
        ("last_name", StringType()),
        ("age", LongType()),
        ("gender", StringType()),
        ("annual_income", DoubleType()),
        ("marital_status", StringType()),
        ("education", StringType()),
        ("location_type", StringType()),
        ("city", StringType()),
        ("state", StringType()),
        ("country", StringType()),
        ("signup_date", StringType()),
        ("last_login", StringType()),
        ("preferred_channel", StringType()),
        ("is_active", BooleanType()),
    ),
    "products": _schema(
        ("product_id", StringType()),
        ("category_id", StringType()),
        ("subcategory_id", StringType()),
        ("product_name", StringType()),
        ("description", StringType()),
        ("base_price", DoubleType()),
        ("sale_price", DoubleType()),
        ("stock_quantity", LongType()),
        ("weight_kg", DoubleType()),
        ("is_active", BooleanType()),
        ("created_at", StringType()),
        ("brand", StringType()),
        ("sku", StringType()),
        ("rating", DoubleType()),
        ("review_count", LongType()),
    ),
    "orders": _schema(
        ("order_id", StringType()),
        ("customer_id", StringType()),
        ("order_date", StringType()),
        ("status", StringType()),
        ("total_amount", DoubleType()),
        ("shipping_cost", DoubleType()),
        ("payment_method", StringType()),
        ("shipping_address", StringType()),
        ("billing_address", StringType()),
        ("created_at", StringType()),
        ("updated_at", StringType()),
    ),
    "order_items": _schema(
        ("order_item_id", StringType()),
        ("order_id", StringType()),
        ("product_id", StringType()),
        ("quantity", LongType()),
        ("unit_price", DoubleType()),
        ("total_price", DoubleType()),
        ("created_at", StringType()),
    ),
    "reviews": _schema(
        ("review_id", StringType()),
        ("product_id", StringType()),
        ("order_id", StringType()),
        ("customer_id", StringType()),
        ("review_score", LongType()),
        ("review_text", StringType()),
    ),
    "categories": _schema(
        ("category_id", StringType()),
        ("category_name", StringType()),
        ("created_at", StringType()),
    ),
    "subcategories": _schema(
        ("subcategory_id", StringType()),
        ("category_id", StringType()),
        ("subcategory_name", StringType()),
        ("created_at", StringType()),
    ),
    "interactions": _schema(
        ("event_id", StringType()),
        ("customer_id", StringType()),
        ("product_id", StringType()),
        ("event_type", StringType()),
        ("event_date", StringType()),
        ("device_type", StringType()),
        ("session_id", StringType()),
        ("created_at", StringType()),
    ),
}

RAW_TABLES = tuple(RAW_SCHEMAS)
