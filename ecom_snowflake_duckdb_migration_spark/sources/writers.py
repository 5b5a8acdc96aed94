"""Sinks and materialization (SURVEY §2.1 S4-S7, S9-S10, S12).

Reference behaviors replicated (paths relative to /root/reference):
- S4 CSV sink + JSON metadata sidecar
  (src/pipeline/0_ingest_historic_synthetic_data.py:173-202,
  ingest_latest_synthetic_data.py:278-303).
- S5 envelope JSON sink: DataFrame → ``{metadata, data}`` object
  (src/pipeline/0_generate_historic_synthetic_data.py:429-461).
- S6 Postgres sink via COPY (0_generate_historic_synthetic_data.py:463-492)
  → ``df.write.jdbc``.
- S7 typed table create from a dtype map
  (ingest_latest_synthetic_data.py:521-535) → catalog DDL with explicit schema.
- S9/S10 view vs table materialization (dbt/dbt_duckdb/dbt_project.yml:19-29).
- S12 catalog introspection (src/sample_ecom_raw_query_duckdb.py:8-27).

Scale notes: parquet is the default table format (columnar, splittable,
predicate-pushdown-friendly); CSV/JSON sinks exist only for reference-format
interchange. ``write_table`` takes optional ``partition_by`` + ``bucket_by``
so hot join keys can be co-located and date columns pruned at 100 TB.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def write_csv_with_metadata(
    df: DataFrame,
    path: str,
    table: str,
    single_file: bool = False,
    run_ts: datetime | None = None,
) -> dict:
    """S4: CSV sink plus a JSON metadata sidecar describing the extract.

    ``single_file=True`` coalesces to one part (reference emits one CSV per
    table) — only sane for small interchange extracts; leave False at scale.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)
    meta = {
        "table": table,
        "recordCount": df.count(),
        "generatedAt": (run_ts or datetime.now(timezone.utc)).isoformat(),
        "columns": df.columns,
        "version": "1.0",
    }
    with open(os.path.join(path, "_metadata.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def write_envelope_json(
    df: DataFrame,
    path: str,
    table: str,
    run_ts: datetime | None = None,
    version: str = "1.0",
) -> None:
    """S5: write the reference's ``{metadata, data}`` envelope.

    Implemented distributed: every output partition becomes one complete,
    self-describing envelope file (matching the reference's per-object layout,
    which ``read_envelope_json`` reads back as a glob). recordCount is the
    per-envelope row count, computed inside the partition — no driver collect.
    """
    generated_at = (run_ts or datetime.now(timezone.utc)).isoformat()

    envelopes = (
        df.select(F.to_json(F.struct(*df.columns)).alias("j"))
        .groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.collect_list("j").alias("rows"))
        .select(
            F.concat(
                F.lit('{"metadata": {"table": "' + table + '", "recordCount": '),
                F.size("rows").cast("string"),
                F.lit(', "generatedAt": "' + generated_at + '", "version": "' + version + '"}, '),
                F.lit('"data": ['),
                F.concat_ws(", ", "rows"),
                F.lit("]}"),
            ).alias("value")
        )
    )
    envelopes.write.mode("overwrite").text(path)


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "overwrite", **options: str
) -> None:
    """S6: relational sink (reference: pandas to_sql DDL + COPY FROM STDIN)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for key, value in options.items():
        writer = writer.option(key, value)
    writer.save()


def create_typed_table(
    spark: SparkSession, name: str, schema: StructType, path: str | None = None
) -> None:
    """S7: CREATE TABLE IF NOT EXISTS with a declared schema (no inference in
    the engine path). External parquet when ``path`` is given."""
    ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    location = f" LOCATION '{path}'" if path else ""
    spark.sql(f"CREATE TABLE IF NOT EXISTS {name} ({ddl}) USING parquet{location}")


def write_table(
    df: DataFrame,
    name: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
) -> None:
    """S10: table materialization (CREATE TABLE AS).

    ``partition_by`` → directory partition pruning on date/enum columns;
    ``bucket_by=(n, cols)`` → pre-shuffled layout so joins/aggs on those
    columns skip the exchange entirely (the 100 TB co-location lever).
    """
    writer = df.write.mode(mode).format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        writer = writer.bucketBy(n, *cols).sortBy(*cols)
    writer.saveAsTable(name)


def create_view(df: DataFrame, name: str) -> None:
    """S9: view materialization — lazy, re-planned per query like a DuckDB
    CREATE VIEW (staging models and mart dims)."""
    df.createOrReplaceTempView(name)


@dataclass(frozen=True)
class TableInfo:
    database: str
    table: str
    columns: tuple[str, ...]
    row_count: int


def describe_catalog(spark: SparkSession, database: str | None = None) -> list[TableInfo]:
    """S12: information_schema-style introspection with row counts
    (reference: sample_ecom_*_query_duckdb.py catalog walk)."""
    out = []
    databases = [database] if database else [d.name for d in spark.catalog.listDatabases()]
    for db in databases:
        for t in spark.catalog.listTables(db):
            if t.tableType == "TEMPORARY" and db != databases[0]:
                continue  # temp views are global; report them once
            qualified = f"{t.database}.{t.name}" if t.database else t.name
            cols = tuple(c.name for c in spark.catalog.listColumns(qualified))
            count = spark.table(qualified).count()
            out.append(TableInfo(db, t.name, cols, count))
    return out
