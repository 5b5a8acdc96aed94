"""DuckDB oracle SQL for the ecom model pipeline.

Each entry is the reference dbt model compiled by hand: ``{{ source(...) }}``
→ ``ecom_raw.<table>`` or the upstream view name, ``{{ ref(...) }}`` → view
name, ``dbt_utils.generate_surrogate_key([...])`` → its md5/concat_ws
expansion, CURRENT_TIMESTAMP/CURRENT_DATE → the injected run clock
(placeholders ``{RUN_TS}``/``{RUN_DATE}``). Source models:
/root/reference/dbt/dbt_duckdb/models/ (cited per key). Views are created in
dependency order; the dict is ordered accordingly.

ORACLE MATERIAL ONLY — nothing in the engine executes this SQL. Consumers:
tests/test_ecom_pipeline.py (row-for-row model parity) and the q34 driver
oracle (queries/catalog_ext.py builds a single WITH-chain over the committed
seeded raw extract from this dict).
"""

from __future__ import annotations


def K(*exprs: str) -> str:
    """dbt_utils.generate_surrogate_key expansion."""
    parts = ", ".join(f"coalesce(cast({e} as varchar), '')" for e in exprs)
    return f"md5(concat_ws('-', {parts}))"


def _stg(table: str, casts: str) -> str:
    return f"SELECT {casts} FROM ecom_raw.{table}"


_LINEAGE = """CAST(data_source AS VARCHAR) as data_source,
CAST(batch_id AS VARCHAR) as batch_id, TRY_CAST(loaded_at AS TIMESTAMP) as loaded_at"""

MODEL_ORACLE_SQL: dict[str, str] = {
    # ---- ecom_staging (stg_*.sql) ----
    "stg_customers": _stg("customers", f"""
        CAST(customer_id AS VARCHAR) as customer_id, CAST(email AS VARCHAR) as email,
        CAST(first_name AS VARCHAR) as first_name, CAST(last_name AS VARCHAR) as last_name,
        CAST(age AS INTEGER) as age, CAST(gender AS VARCHAR) as gender,
        CAST(annual_income AS DECIMAL(12,2)) as annual_income,
        CAST(marital_status AS VARCHAR) as marital_status,
        CAST(education AS VARCHAR) as education,
        CAST(location_type AS VARCHAR) as location_type, CAST(city AS VARCHAR) as city,
        CAST(state AS VARCHAR) as state, CAST(country AS VARCHAR) as country,
        TRY_CAST(signup_date AS TIMESTAMP) as signup_date,
        TRY_CAST(last_login AS TIMESTAMP) as last_login,
        CAST(preferred_channel AS VARCHAR) as preferred_channel,
        CAST(is_active AS BOOLEAN) as is_active, {_LINEAGE}"""),
    "stg_products": _stg("products", f"""
        CAST(product_id AS VARCHAR) as product_id,
        CAST(category_id AS VARCHAR) as category_id,
        CAST(subcategory_id AS VARCHAR) as subcategory_id,
        CAST(product_name AS VARCHAR) as product_name,
        CAST(description AS TEXT) as description,
        CAST(base_price AS DECIMAL(12,2)) as base_price,
        CAST(sale_price AS DECIMAL(12,2)) as sale_price,
        CAST(stock_quantity AS INTEGER) as stock_quantity,
        CAST(weight_kg AS DECIMAL(8,2)) as weight_kg,
        CAST(is_active AS BOOLEAN) as is_active,
        TRY_CAST(created_at AS TIMESTAMP) as created_at, CAST(brand AS VARCHAR) as brand,
        CAST(sku AS VARCHAR) as sku, CAST(rating AS DECIMAL(3,1)) as rating,
        CAST(review_count AS INTEGER) as review_count, {_LINEAGE}"""),
    "stg_orders": _stg("orders", f"""
        CAST(order_id AS VARCHAR) as order_id, CAST(customer_id AS VARCHAR) as customer_id,
        TRY_CAST(order_date AS TIMESTAMP) as order_date, CAST(status AS VARCHAR) as status,
        CAST(total_amount AS DECIMAL(12,2)) as total_amount,
        CAST(shipping_cost AS DECIMAL(12,2)) as shipping_cost,
        CAST(payment_method AS VARCHAR) as payment_method,
        CAST(shipping_address AS VARCHAR) as shipping_address,
        CAST(billing_address AS VARCHAR) as billing_address,
        TRY_CAST(created_at AS TIMESTAMP) as created_at,
        TRY_CAST(updated_at AS TIMESTAMP) as updated_at, {_LINEAGE}"""),
    "stg_order_items": _stg("order_items", f"""
        CAST(order_item_id AS VARCHAR) as order_item_id,
        CAST(order_id AS VARCHAR) as order_id, CAST(product_id AS VARCHAR) as product_id,
        CAST(quantity AS INTEGER) as quantity,
        CAST(unit_price AS DECIMAL(12,2)) as unit_price,
        CAST(total_price AS DECIMAL(12,2)) as total_price,
        TRY_CAST(created_at AS TIMESTAMP) as created_at, {_LINEAGE}"""),
    "stg_reviews": _stg("reviews", f"""
        CAST(review_id AS VARCHAR) as review_id, CAST(product_id AS VARCHAR) as product_id,
        CAST(order_id AS VARCHAR) as order_id, CAST(customer_id AS VARCHAR) as customer_id,
        CAST(review_score AS INTEGER) as review_score,
        CAST(review_text AS TEXT) as review_text, {_LINEAGE}"""),
    "stg_categories": _stg("categories", f"""
        CAST(category_id AS VARCHAR) as category_id,
        CAST(category_name AS VARCHAR) as category_name,
        TRY_CAST(created_at AS TIMESTAMP) as created_at, {_LINEAGE}"""),
    "stg_subcategories": _stg("subcategories", f"""
        CAST(subcategory_id AS VARCHAR) as subcategory_id,
        CAST(category_id AS VARCHAR) as category_id,
        CAST(subcategory_name AS VARCHAR) as subcategory_name,
        TRY_CAST(created_at AS TIMESTAMP) as created_at, {_LINEAGE}"""),
    "stg_interactions": _stg("interactions", f"""
        CAST(event_id AS VARCHAR) as event_id, CAST(customer_id AS VARCHAR) as customer_id,
        CAST(product_id AS VARCHAR) as product_id, CAST(event_type AS VARCHAR) as event_type,
        TRY_CAST(event_date AS TIMESTAMP) as event_date,
        CAST(device_type AS VARCHAR) as device_type,
        CAST(session_id AS VARCHAR) as session_id,
        TRY_CAST(created_at AS TIMESTAMP) as created_at, {_LINEAGE}"""),
    # ---- ecom_intermediate: lookups ----
    "education_types": f"""
        SELECT DISTINCT {K('education')} AS education_id, education AS education_type,
            {{RUN_TS}} AS created_at
        FROM stg_customers WHERE education IS NOT NULL""",
    "marital_statuses": f"""
        SELECT DISTINCT {K('marital_status')} AS marital_status_id,
            marital_status AS status_type, {{RUN_TS}} AS created_at
        FROM stg_customers WHERE marital_status IS NOT NULL""",
    "order_statuses": f"""
        SELECT DISTINCT {K('status')} AS status_id, status AS status_name,
            {{RUN_TS}} AS created_at
        FROM stg_orders WHERE status IS NOT NULL""",
    "payment_methods": f"""
        SELECT DISTINCT {K('payment_method')} AS payment_method_id,
            payment_method AS method_name, {{RUN_TS}} AS created_at
        FROM stg_orders WHERE payment_method IS NOT NULL""",
    # ---- entities/locations.sql ----
    "locations": f"""
        WITH shipping_addresses AS (
            SELECT DISTINCT TRIM(SPLIT_PART(shipping_address, ',', -3)) AS city,
                TRIM(SPLIT_PART(shipping_address, ',', -2)) AS state,
                TRIM(SPLIT_PART(shipping_address, ',', -1)) AS country
            FROM stg_orders WHERE shipping_address IS NOT NULL),
        billing_addresses AS (
            SELECT DISTINCT TRIM(SPLIT_PART(billing_address, ',', -3)) AS city,
                TRIM(SPLIT_PART(billing_address, ',', -2)) AS state,
                TRIM(SPLIT_PART(billing_address, ',', -1)) AS country
            FROM stg_orders WHERE billing_address IS NOT NULL),
        customer_addresses AS (
            SELECT DISTINCT TRIM(city) as city, TRIM(state) as state, TRIM(country) as country
            FROM stg_customers
            WHERE city IS NOT NULL AND state IS NOT NULL AND country IS NOT NULL),
        all_locations AS (
            SELECT * FROM shipping_addresses
            UNION SELECT * FROM billing_addresses
            UNION SELECT * FROM customer_addresses),
        cleaned_locations AS (
            SELECT DISTINCT city, state, country FROM all_locations
            WHERE city != '' AND state != '' AND country != '')
        SELECT DISTINCT {K('city', 'state', 'country')} AS location_id,
            city, state, country, {{RUN_TS}} AS created_at
        FROM cleaned_locations""",
    # ---- entities/addresses.sql ----
    "addresses": f"""
        WITH parsed_addresses AS (
            SELECT DISTINCT shipping_address AS address,
                TRIM(SPLIT_PART(shipping_address, ',', 1)) AS street_address,
                TRIM(SPLIT_PART(shipping_address, ',', -4)) AS postal_code,
                TRIM(SPLIT_PART(shipping_address, ',', -3)) AS city,
                TRIM(SPLIT_PART(shipping_address, ',', -2)) AS state,
                TRIM(SPLIT_PART(shipping_address, ',', -1)) AS country
            FROM stg_orders WHERE shipping_address IS NOT NULL
            UNION
            SELECT DISTINCT billing_address AS address,
                TRIM(SPLIT_PART(billing_address, ',', 1)),
                TRIM(SPLIT_PART(billing_address, ',', -4)),
                TRIM(SPLIT_PART(billing_address, ',', -3)),
                TRIM(SPLIT_PART(billing_address, ',', -2)),
                TRIM(SPLIT_PART(billing_address, ',', -1))
            FROM stg_orders WHERE billing_address IS NOT NULL),
        validated_addresses AS (
            SELECT * FROM parsed_addresses
            WHERE city != '' AND state != '' AND country != ''
            AND city IS NOT NULL AND state IS NOT NULL AND country IS NOT NULL)
        SELECT DISTINCT {K('address')} AS address_id, street_address, postal_code,
            COALESCE(l.location_id, {K('city', 'state', 'country')}) AS location_id,
            {{RUN_TS}} AS created_at
        FROM validated_addresses
        LEFT JOIN locations l USING (city, state, country)
        WHERE address IS NOT NULL""",
    # ---- entities/brands.sql ----
    "brands": f"""
        WITH cleaned_brands AS (
            SELECT DISTINCT TRIM(brand) as brand_name FROM stg_products
            WHERE brand IS NOT NULL AND TRIM(brand) != '')
        SELECT DISTINCT {K('brand_name')} AS brand_id, brand_name,
            {{RUN_TS}} AS created_at
        FROM cleaned_brands""",
    # ---- entities/categories_enriched.sql ----
    "categories_enriched": """
        SELECT c.category_id, c.category_name,
            COUNT(DISTINCT s.subcategory_id) AS subcategory_count,
            COUNT(DISTINCT p.product_id) AS product_count, c.created_at
        FROM stg_categories c
        LEFT JOIN stg_subcategories s USING (category_id)
        LEFT JOIN stg_products p USING (category_id)
        GROUP BY 1, 2, 5""",
    # ---- entities/subcategories_enriched.sql ----
    "subcategories_enriched": """
        SELECT s.subcategory_id, s.subcategory_name, s.category_id,
            COUNT(DISTINCT p.product_id) AS product_count, s.created_at
        FROM stg_subcategories s
        LEFT JOIN stg_products p USING (subcategory_id)
        GROUP BY 1, 2, 3, 5""",
    # ---- entities/customers_enriched.sql ----
    "customers_enriched": f"""
        WITH customer_orders AS (
            SELECT customer_id, COUNT(DISTINCT order_id) AS total_orders,
                SUM(total_amount) AS total_spent, MIN(order_date) AS first_order_date,
                MAX(order_date) AS last_order_date
            FROM stg_orders GROUP BY 1),
        validated_customers AS (
            SELECT *, TRIM(city) as cleaned_city, TRIM(state) as cleaned_state,
                TRIM(country) as cleaned_country
            FROM stg_customers
            WHERE city IS NOT NULL AND state IS NOT NULL AND country IS NOT NULL
            AND TRIM(city) != '' AND TRIM(state) != '' AND TRIM(country) != '')
        SELECT c.customer_id, c.email, c.first_name, c.last_name, c.age, c.gender,
            c.annual_income, e.education_id, m.marital_status_id,
            COALESCE(l.location_id,
                {K('cleaned_city', 'cleaned_state', 'cleaned_country')}) AS location_id,
            c.signup_date, c.last_login, c.preferred_channel, c.is_active,
            COALESCE(co.total_orders, 0) AS total_orders,
            COALESCE(co.total_spent, 0) AS total_spent,
            co.first_order_date, co.last_order_date, c.loaded_at AS created_at
        FROM validated_customers c
        LEFT JOIN education_types e ON c.education = e.education_type
        LEFT JOIN marital_statuses m ON c.marital_status = m.status_type
        LEFT JOIN locations l ON c.cleaned_city = l.city AND c.cleaned_state = l.state
            AND c.cleaned_country = l.country
        LEFT JOIN customer_orders co USING (customer_id)""",
    # ---- entities/products_enriched.sql ----
    "products_enriched": f"""
        WITH product_orders AS (
            SELECT product_id, COUNT(DISTINCT order_id) AS total_orders,
                SUM(quantity) AS total_quantity_sold, SUM(total_price) AS total_revenue
            FROM stg_order_items GROUP BY product_id),
        product_reviews AS (
            SELECT product_id, COUNT(*) AS review_count,
                AVG(review_score) AS avg_review_score
            FROM stg_reviews GROUP BY product_id),
        all_brands AS (
            SELECT DISTINCT TRIM(brand) as brand_name, {K('TRIM(brand)')} as brand_id
            FROM stg_products WHERE brand IS NOT NULL AND TRIM(brand) != '')
        SELECT p.product_id, p.product_name, p.description, p.base_price, p.sale_price,
            p.stock_quantity, p.weight_kg, p.is_active,
            COALESCE(b.brand_id, ab.brand_id) as brand_id, p.category_id,
            p.subcategory_id,
            COALESCE(po.total_orders, 0) AS total_orders,
            COALESCE(po.total_quantity_sold, 0) AS total_quantity_sold,
            COALESCE(po.total_revenue, 0) AS total_revenue,
            COALESCE(pr.review_count, 0) AS review_count,
            pr.avg_review_score, p.created_at
        FROM stg_products p
        LEFT JOIN brands b ON TRIM(p.brand) = b.brand_name
        LEFT JOIN all_brands ab ON TRIM(p.brand) = ab.brand_name
        LEFT JOIN stg_categories c ON p.category_id = c.category_id
        LEFT JOIN stg_subcategories s ON p.category_id = s.category_id
            AND p.subcategory_id = s.subcategory_id
        LEFT JOIN product_orders po ON p.product_id = po.product_id
        LEFT JOIN product_reviews pr ON p.product_id = pr.product_id
        WHERE p.product_id IS NOT NULL""",
    # ---- entities/reviews_enriched.sql ----
    "reviews_enriched": """
        SELECT r.review_id, r.product_id, r.order_id, r.customer_id, r.review_score,
            r.review_text, p.product_name, c.category_name, s.subcategory_name,
            b.brand_name, r.loaded_at AS created_at
        FROM stg_reviews r
        LEFT JOIN products_enriched p ON r.product_id = p.product_id
        LEFT JOIN categories_enriched c ON p.category_id = c.category_id
        LEFT JOIN subcategories_enriched s ON p.subcategory_id = s.subcategory_id
        LEFT JOIN brands b ON p.brand_id = b.brand_id""",
    # ---- transactions/orders.sql ----
    "orders": """
        SELECT o.order_id, o.customer_id, o.order_date, os.status_id,
            pm.payment_method_id, sa.address_id AS shipping_address_id,
            ba.address_id AS billing_address_id, o.total_amount, o.shipping_cost,
            COUNT(DISTINCT oi.product_id) AS unique_products,
            SUM(oi.quantity) AS total_items,
            BOOL_OR(r.review_score IS NOT NULL) AS has_review,
            AVG(r.review_score) AS avg_review_score,
            o.loaded_at AS created_at
        FROM stg_orders o
        LEFT JOIN order_statuses os ON o.status = os.status_name
        LEFT JOIN payment_methods pm ON o.payment_method = pm.method_name
        LEFT JOIN addresses sa ON o.shipping_address = sa.street_address
        LEFT JOIN addresses ba ON o.billing_address = ba.street_address
        LEFT JOIN stg_order_items oi USING (order_id)
        LEFT JOIN stg_reviews r USING (order_id)
        GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 14""",
    # ---- transactions/order_items.sql ----
    "order_items": """
        WITH order_items_base AS (
            SELECT * FROM stg_order_items WHERE product_id IS NOT NULL),
        valid_products AS (SELECT DISTINCT product_id FROM products_enriched),
        validated_items AS (
            SELECT DISTINCT oi.* FROM order_items_base oi
            INNER JOIN valid_products vp ON oi.product_id = vp.product_id),
        reviews_deduped AS (
            SELECT DISTINCT order_id, product_id,
                FIRST_VALUE(review_score) OVER (
                    PARTITION BY order_id, product_id ORDER BY loaded_at DESC
                ) as review_score
            FROM stg_reviews)
        SELECT DISTINCT oi.order_item_id, oi.order_id, oi.product_id, o.customer_id,
            oi.quantity, oi.unit_price, oi.total_price, p.category_id,
            p.subcategory_id, p.brand_id, r.review_score, oi.created_at
        FROM validated_items oi
        LEFT JOIN stg_orders o USING (order_id)
        LEFT JOIN products_enriched p USING (product_id)
        LEFT JOIN reviews_deduped r USING (order_id, product_id)""",
    # ---- transactions/customer_interactions.sql ----
    "customer_interactions": """
        SELECT i.event_id, i.customer_id, i.product_id, p.category_id,
            p.subcategory_id, i.event_type, i.event_date, i.device_type,
            i.session_id, i.created_at
        FROM stg_interactions i
        LEFT JOIN stg_products p USING (product_id)""",
    # ---- marts/core/dim_categories.sql ----
    "dim_categories": """
        WITH category_hierarchy AS (
            SELECT DISTINCT c.category_id, c.category_name,
                STRING_AGG(DISTINCT s.subcategory_name, ', ' ORDER BY s.subcategory_name)
                    as subcategories
            FROM categories_enriched c
            LEFT JOIN subcategories_enriched s USING (category_id)
            GROUP BY c.category_id, c.category_name)
        SELECT c.category_id, c.category_name, ch.subcategories, c.created_at
        FROM categories_enriched c
        LEFT JOIN category_hierarchy ch USING (category_id)""",
    # ---- marts/core/dim_customers.sql ----
    "dim_customers": """
        SELECT c.customer_id, c.email, c.first_name, c.last_name, c.age, c.gender,
            c.annual_income, l.city, l.state, l.country, et.education_type,
            ms.status_type AS marital_status,
            COALESCE(o.total_orders, 0) AS total_orders,
            COALESCE(o.total_spent, 0) AS total_spent,
            COALESCE(o.total_spent / NULLIF(o.total_orders, 0), 0) AS avg_order_value,
            o.first_order_date, o.last_order_date,
            CASE WHEN o.last_order_date >= {RUN_DATE} - INTERVAL '3 months' THEN 'Active'
                 WHEN o.last_order_date >= {RUN_DATE} - INTERVAL '6 months' THEN 'At Risk'
                 ELSE 'Churned' END AS customer_status,
            DATE_DIFF('day', COALESCE(o.first_order_date, c.signup_date),
                {RUN_DATE}) AS customer_lifetime_days,
            c.signup_date, c.last_login, c.is_active, c.created_at,
            {RUN_TS} AS updated_at
        FROM customers_enriched c
        LEFT JOIN locations l ON c.location_id = l.location_id
        LEFT JOIN education_types et ON c.education_id = et.education_id
        LEFT JOIN marital_statuses ms ON c.marital_status_id = ms.marital_status_id
        LEFT JOIN (
            SELECT customer_id, COUNT(DISTINCT order_id) AS total_orders,
                SUM(total_amount) AS total_spent, MIN(order_date) AS first_order_date,
                MAX(order_date) AS last_order_date
            FROM orders GROUP BY customer_id) o
        ON c.customer_id = o.customer_id""",
    # ---- marts/core/dim_dates.sql ----
    "dim_dates": """
        SELECT DISTINCT date_day,
            EXTRACT(YEAR FROM date_day) as year, EXTRACT(MONTH FROM date_day) as month,
            EXTRACT(DOW FROM date_day) as day_of_week,
            date_trunc('month', date_day) as first_day_of_month,
            last_day(date_day) as last_day_of_month
        FROM (
            SELECT DISTINCT order_date as date_day FROM orders
            UNION
            SELECT DISTINCT event_date FROM customer_interactions)""",
    # ---- marts/core/dim_locations.sql ----
    "dim_locations": """
        SELECT location_id, city, state, country
        FROM locations l
        LEFT JOIN customers_enriched c USING (location_id)
        LEFT JOIN orders o USING (customer_id)
        GROUP BY 1, 2, 3, 4""",
    # ---- marts/core/dim_products.sql ----
    "dim_products": """
        SELECT p.product_id, c.category_id, p.product_name, p.description,
            p.base_price, p.sale_price, p.stock_quantity, c.category_name,
            s.subcategory_name, b.brand_name, p.is_active, p.created_at,
            {RUN_TS} AS updated_at
        FROM products_enriched p
        LEFT JOIN categories_enriched c ON p.category_id = c.category_id
        LEFT JOIN subcategories_enriched s ON p.subcategory_id = s.subcategory_id
        LEFT JOIN brands b ON p.brand_id = b.brand_id""",
    # ---- marts/customer/fct_customer_activity.sql ----
    "fct_customer_activity": """
        SELECT c.customer_id, c.email,
            DATE_TRUNC('month', CAST(i.event_date AS DATE)) AS activity_month,
            COUNT(CASE WHEN i.event_type = 'view' THEN 1 END) AS total_views,
            COUNT(DISTINCT CASE WHEN i.event_type = 'view' THEN i.product_id END)
                AS unique_products_viewed,
            COUNT(CASE WHEN i.event_type = 'cart_add' THEN 1 END) AS cart_adds,
            COUNT(DISTINCT CASE WHEN i.event_type = 'cart_add' THEN i.product_id END)
                AS unique_products_added,
            COUNT(CASE WHEN i.event_type = 'purchase' THEN 1 END) AS purchases,
            COUNT(DISTINCT CASE WHEN i.event_type = 'purchase' THEN i.product_id END)
                AS unique_products_purchased,
            COUNT(DISTINCT i.session_id) AS total_sessions,
            COUNT(DISTINCT i.device_type) AS devices_used,
            {RUN_TS} AS updated_at
        FROM customers_enriched c
        LEFT JOIN customer_interactions i ON c.customer_id = i.customer_id
        WHERE CAST(i.event_date AS DATE) IS NOT NULL
        GROUP BY c.customer_id, c.email, DATE_TRUNC('month', CAST(i.event_date AS DATE))""",
    # ---- marts/customer/fct_customer_orders.sql ----
    "fct_customer_orders": """
        SELECT o.customer_id, o.order_id, o.order_date, o.total_amount,
            COUNT(DISTINCT oi.product_id) as unique_products,
            SUM(oi.quantity) as total_items,
            total_amount / NULLIF(COUNT(DISTINCT oi.product_id), 0) as avg_order_value,
            AVG(r.review_score) as avg_review_score
        FROM orders o
        LEFT JOIN order_items oi USING (order_id)
        LEFT JOIN reviews_enriched r USING (order_id)
        GROUP BY 1, 2, 3, 4""",
    # ---- marts/customer/fct_customer_reviews.sql ----
    "fct_customer_reviews": """
        SELECT r.customer_id, r.product_id, r.order_id, r.review_score, r.review_text,
            p.category_id, p.subcategory_id
        FROM reviews_enriched r
        JOIN products_enriched p USING (product_id)""",
    # ---- marts/sales/fct_order_details.sql ----
    "fct_order_details": """
        SELECT o.order_id, o.order_date, c.customer_id, c.email,
            l_customer.city AS customer_city, l_customer.state AS customer_state,
            p.product_id, p.product_name, ca.category_name, b.brand_name,
            os.status_name, pm.method_name AS payment_method,
            sa.street_address AS shipping_address, l_shipping.city AS shipping_city,
            l_shipping.state AS shipping_state, oi.quantity, oi.unit_price,
            oi.total_price AS item_total, o.shipping_cost, o.total_amount AS order_total,
            r.review_score, o.created_at, {RUN_TS} AS updated_at
        FROM orders o
        JOIN order_items oi ON o.order_id = oi.order_id
        JOIN customers_enriched c ON o.customer_id = c.customer_id
        JOIN locations l_customer ON c.location_id = l_customer.location_id
        JOIN products_enriched p ON oi.product_id = p.product_id
        JOIN categories_enriched ca ON p.category_id = ca.category_id
        JOIN brands b ON p.brand_id = b.brand_id
        LEFT JOIN order_statuses os ON o.status_id = os.status_id
        LEFT JOIN payment_methods pm ON o.payment_method_id = pm.payment_method_id
        LEFT JOIN addresses sa ON o.shipping_address_id = sa.address_id
        LEFT JOIN locations l_shipping ON sa.location_id = l_shipping.location_id
        LEFT JOIN reviews_enriched r ON o.order_id = r.order_id
            AND oi.product_id = r.product_id""",
    # ---- marts/sales/fct_product_interactions.sql ----
    "fct_product_interactions": """
        SELECT product_id, date_trunc('day', event_date) as event_day,
            COUNT(DISTINCT CASE WHEN event_type = 'view' THEN event_id END) as views,
            COUNT(DISTINCT CASE WHEN event_type = 'cart_add' THEN event_id END) as cart_adds,
            COUNT(DISTINCT CASE WHEN event_type = 'wishlist_add' THEN event_id END)
                as wishlist_adds,
            COUNT(DISTINCT customer_id) as unique_customers
        FROM customer_interactions
        GROUP BY 1, 2""",
    # ---- marts/sales/fct_product_performance.sql ----
    "fct_product_performance": """
        SELECT p.product_id, date_trunc('month', o.order_date) as month,
            COUNT(DISTINCT o.order_id) as total_orders, SUM(oi.quantity) as units_sold,
            SUM(oi.total_price) as revenue, AVG(r.review_score) as avg_rating,
            COUNT(DISTINCT r.review_score) as review_count
        FROM products_enriched p
        LEFT JOIN order_items oi USING (product_id)
        LEFT JOIN orders o USING (order_id)
        LEFT JOIN reviews_enriched r USING (product_id)
        GROUP BY 1, 2""",
    # ---- marts/sales/fct_sales_by_date.sql ----
    "fct_sales_by_date": """
        SELECT DATE_TRUNC('day', TRY_CAST(order_date AS DATE)) AS sale_date,
            COUNT(DISTINCT order_id) AS total_orders,
            COUNT(DISTINCT customer_id) AS unique_customers,
            SUM(total_amount) AS total_revenue, SUM(shipping_cost) AS total_shipping,
            SUM(total_amount) - SUM(shipping_cost) AS net_revenue,
            AVG(total_amount) AS avg_order_value,
            SUM(total_amount) / COUNT(DISTINCT customer_id) AS revenue_per_customer,
            {RUN_TS} AS updated_at
        FROM orders
        GROUP BY sale_date""",
    # ---- marts/sales/fct_sales_by_product.sql ----
    "fct_sales_by_product": """
        SELECT p.product_id, p.category_id, date_trunc('month', o.order_date) as sales_month,
            COUNT(DISTINCT o.order_id) as total_orders, SUM(oi.quantity) as units_sold,
            SUM(oi.total_price) as revenue, AVG(oi.unit_price) as avg_selling_price
        FROM products_enriched p
        JOIN order_items oi USING (product_id)
        JOIN orders o USING (order_id)
        GROUP BY 1, 2, 3""",
    # ---- marts/sales/fct_sales_by_region.sql ----
    "fct_sales_by_region": """
        SELECT l.state, l.country, date_trunc('month', o.order_date) as sales_month,
            COUNT(DISTINCT o.order_id) as total_orders,
            COUNT(DISTINCT o.customer_id) as unique_customers,
            SUM(o.total_amount) as total_revenue, AVG(o.total_amount) as avg_order_value
        FROM orders o
        JOIN customers_enriched c USING (customer_id)
        JOIN locations l ON c.location_id = l.location_id
        GROUP BY 1, 2, 3""",
}
