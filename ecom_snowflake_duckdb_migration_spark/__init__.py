"""PySpark-native analytics engine with the query/data-processing surface of
sclauguico/ecom-snowflake-duckdb-migration (reference read-only at /root/reference).

The reference delegates all query execution to DuckDB behind dbt models and a
pandas ETL; this package re-expresses that capability surface Spark-first:

- ``session``    SparkSession factory (AQE, UTC, non-ANSI casts ~ TRY_CAST).
- ``sources``    readers/writers: parquet, CSV, envelope JSON, JDBC (S1-S7).
- ``functions``  scalar/agg helpers: surrogate keys, DOW convention, ordered
                 distinct string_agg (F1-F17, A5-A6).
- ``operators``  ingestion + LLM-data operators: PK dedup, upsert, schema-align
                 union, incremental append, data-quality checks, text dedup
                 (exact/minhash/simhash), similarity search, text analysis.
- ``plans``      model registry + layered materialization (dbt-equivalent, E1).
- ``streaming``  Structured Streaming ingest of the event stream (§2.9 analog).
- ``queries``    the oracle-checked query catalog over the driver's testdata.
"""

__version__ = "0.1.0"
