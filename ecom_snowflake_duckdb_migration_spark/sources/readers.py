"""Source readers (SURVEY §2.1 S1-S3, §2.8 F15).

Reference behaviors replicated (paths relative to /root/reference):
- S2 envelope JSON: S3 objects shaped ``{"metadata": {"table", "recordCount",
  "generatedAt", "version"}, "data": [...]}``; the reference GETs the object
  and iterates ``content["data"]`` (src/pipeline/ingest_latest_synthetic_data.py:131-146,
  src/pipeline/0_ingest_historic_synthetic_data.py:58-71). Spark-first: read
  with an explicit envelope StructType and ``explode(data)`` so the scan stays
  distributed and the row schema is declared, not sniffed.
- S3 CSV: header CSV pulled to a DataFrame, columns uppercased
  (ingest_latest_synthetic_data.py:101-118). Spark: ``spark.read.csv`` with an
  explicit schema (inference only when none is supplied).
- S1 JDBC/Postgres scan: ``SELECT * FROM [latest_]{table}`` via SQLAlchemy
  (ingest_latest_synthetic_data.py:120-129). Spark: ``spark.read.format("jdbc")``
  with partitioning options for parallel extraction at scale.
- F15 JSON flatten: one-level dict columns become ``parent_child`` columns,
  list columns are serialized to JSON strings
  (ingest_latest_synthetic_data.py:246-276, 0_ingest_historic_synthetic_data.py:141-171).

Scale notes: our envelope sink emits one envelope per LINE (JSON-Lines —
splittable, any number of envelopes per file), which is the default read
mode; reference-style S3 objects (one pretty-printed envelope per file,
unsplittable) are read with ``multi_line=True`` across a glob of files, which
parallelizes per file — the envelope-per-object format itself is the 100 TB
bottleneck, which is why the sink side normalizes to JSON-Lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ENVELOPE_METADATA_SCHEMA = StructType(
    [
        StructField("table", StringType()),
        StructField("recordCount", LongType()),
        StructField("generatedAt", StringType()),
        StructField("version", StringType()),
    ]
)


def envelope_schema(data_schema: StructType) -> StructType:
    """Full envelope schema for a known per-row schema."""
    return StructType(
        [
            StructField("metadata", ENVELOPE_METADATA_SCHEMA),
            StructField("data", ArrayType(data_schema)),
        ]
    )


def read_envelope_json(
    spark: SparkSession,
    path: str,
    data_schema: StructType | None = None,
    validate_count: bool = False,
    multi_line: bool = False,
) -> DataFrame:
    """S2: read ``{metadata, data: [...]}`` envelope JSON into one row per
    data element. Default is JSON-Lines (one envelope per line — what
    ``write_envelope_json`` emits; a file may hold many envelopes).
    ``multi_line=True`` reads reference-style S3 objects where one file IS
    one pretty-printed envelope document."""
    reader = spark.read.option("multiLine", "true" if multi_line else "false")
    if data_schema is not None:
        reader = reader.schema(envelope_schema(data_schema))
    raw = reader.json(path)
    if validate_count:
        # Distributed check mirroring the reference's len(content['data']) use:
        # any envelope whose declared recordCount mismatches its array fails.
        bad = raw.filter(
            F.col("metadata.recordCount").isNotNull()
            & (F.size("data") != F.col("metadata.recordCount"))
        ).count()
        if bad:
            raise ValueError(f"{bad} envelope file(s) failed recordCount validation")
    return raw.select(F.explode("data").alias("_row")).select("_row.*")


def read_envelope_metadata(
    spark: SparkSession,
    path: str,
    data_schema: StructType | None = None,
    multi_line: bool = False,
) -> DataFrame:
    """Envelope metadata records (one per envelope) without materializing rows."""
    reader = spark.read.option("multiLine", "true" if multi_line else "false")
    if data_schema is not None:
        reader = reader.schema(envelope_schema(data_schema))
    return reader.json(path).select("metadata.*")


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    uppercase: bool = False,
    **options: str,
) -> DataFrame:
    """S3: header CSV scan with an explicit schema (inference only as fallback)."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for key, value in options.items():
        reader = reader.option(key, value)
    df = reader.csv(path)
    if uppercase:
        df = df.toDF(*[c.upper() for c in df.columns])
    return df


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """S1: JDBC table scan. With ``partition_column`` bounds the read fans out
    across ``num_partitions`` parallel connections — required for any real
    extraction volume; the reference's single-connection pandas read is the
    anti-pattern this replaces."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1_000_000))
        )
    for key, value in options.items():
        reader = reader.option(key, value)
    return reader.load()


def flatten_json_columns(df: DataFrame, sep: str = "_") -> DataFrame:
    """F15: flatten one level of struct columns to ``parent{sep}child`` and
    serialize array columns to JSON strings (the reference stringifies list
    columns at ingest so no user-facing nested types survive)."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, StructType):
            cols.extend(
                F.col(f"{f.name}.{sub.name}").alias(f"{f.name}{sep}{sub.name}")
                for sub in f.dataType.fields
            )
        elif isinstance(f.dataType, ArrayType):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)
