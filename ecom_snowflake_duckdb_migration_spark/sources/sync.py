"""Multi-target sync with cross-target verification (the reference's
dual-target load).

The reference ingests every table twice — local DuckDB and MotherDuck —
and then cross-checks per-table row counts between the two targets
(src/pipeline/ingest_latest_synthetic_data.py:610-703; the count
comparison at :688-696). This module is the Spark-native generalization:
one logical write fans out to N physical targets, then every target is
READ BACK and counted, so the verification covers what actually landed
(not what the writer claimed).

Scale notes: each target write is a distributed sink (no driver
collection); the verification is a count() over each target's native
reader, which for parquet is a metadata-only job. The report itself is a
handful of rows per table — driver-side by construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class SyncTarget:
    """One physical destination. ``kind``: parquet | csv | jdbc."""

    kind: str
    location: str  # path (parquet/csv) or JDBC url
    table: str | None = None  # JDBC table name
    options: dict = field(default_factory=dict)


def _write(df: DataFrame, t: SyncTarget) -> None:
    if t.kind == "parquet":
        df.write.mode("overwrite").options(**t.options).parquet(t.location)
    elif t.kind == "csv":
        (
            df.write.mode("overwrite")
            .option("header", "true")
            .options(**t.options)
            .csv(t.location)
        )
    elif t.kind == "jdbc":
        writer = (
            df.write.format("jdbc")
            .option("url", t.location)
            .option("dbtable", t.table or "sync_target")
            .mode("overwrite")
        )
        for k, v in t.options.items():
            writer = writer.option(k, v)
        writer.save()
    else:
        raise ValueError(f"unknown sync target kind: {t.kind}")


def _read_back(spark: SparkSession, source: DataFrame, t: SyncTarget) -> DataFrame:
    if t.kind == "parquet":
        return spark.read.parquet(t.location)
    if t.kind == "csv":
        # Schema-locked read: count verification must not depend on
        # inference quirks.
        return (
            spark.read.option("header", "true")
            .schema(source.schema)
            .options(**{k: v for k, v in t.options.items() if k != "mode"})
            .csv(t.location)
        )
    if t.kind == "jdbc":
        reader = (
            spark.read.format("jdbc")
            .option("url", t.location)
            .option("dbtable", t.table or "sync_target")
        )
        for k, v in t.options.items():
            reader = reader.option(k, v)
        return reader.load()
    raise ValueError(f"unknown sync target kind: {t.kind}")


def sync_to_targets(
    df: DataFrame, targets: list[SyncTarget], table: str = "table"
) -> DataFrame:
    """Write ``df`` to every target, read each back, and return the
    verification report as a DataFrame:

    ``(table, target, rows_expected, rows_loaded, ok)`` — one row per
    target, ``ok`` iff the read-back count equals the source count
    (mirrors ingest_latest_synthetic_data.py:688-696, which compares the
    local-DuckDB and MotherDuck counts after the dual load)."""
    spark = df.sparkSession
    expected = df.count()
    rows = []
    for t in targets:
        _write(df, t)
        loaded = _read_back(spark, df, t).count()
        rows.append((table, t.kind, expected, loaded, loaded == expected))
    return spark.createDataFrame(
        rows, "table string, target string, rows_expected long, rows_loaded long, ok boolean"
    )


def verify_targets(
    spark: SparkSession,
    source: DataFrame,
    targets: list[SyncTarget],
    table: str = "table",
) -> DataFrame:
    """Re-run only the verification half against already-loaded targets —
    the reference's standalone count cross-check, usable long after the
    load (e.g. a nightly consistency audit)."""
    expected = source.count()
    rows = []
    for t in targets:
        try:
            loaded = _read_back(spark, source, t).count()
        except Exception:
            loaded = -1
        rows.append((table, t.kind, expected, loaded, loaded == expected))
    return spark.createDataFrame(
        rows, "table string, target string, rows_expected long, rows_loaded long, ok boolean"
    )
