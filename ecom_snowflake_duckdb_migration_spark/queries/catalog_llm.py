"""LLM-training-data-pipeline catalog: dedup, text analysis, similarity
search over the ``documents`` and ``embeddings`` tables.

These are the scale-path operators a 100 TB pretraining pipeline needs
(BASELINE.json north-star). Implementations live in
``ecom_snowflake_duckdb_migration_spark.operators``; this module binds them to
oracle-checked catalog entries. Filled in incrementally.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, register


@register(
    "q40_dedup_exact",
    oracle="""
    SELECT md5(text)    AS text_hash,
           min(doc_id)  AS canonical_doc_id,
           count(*)     AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup: hash-groupBy on content, keep lowest id as canonical. "
    "Scale path: single shuffle on a 128-bit hash, no skew at 100 TB.",
    tags=("LLM", "dedup"),
)
def q40_dedup_exact(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
