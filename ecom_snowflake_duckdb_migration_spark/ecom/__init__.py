"""The e-commerce warehouse pipeline: the reference's end-to-end product
(8 raw tables -> 8 staging views -> 15 intermediate tables -> 12 mart models)
re-expressed as a PySpark model registry.

Layout mirrors /root/reference/dbt/dbt_duckdb/models/:
- schemas:      raw-layer StructTypes (ingest type contract)
- generate:     distributed seeded synthetic generator (replaces the pandas/
                faker generators in src/pipeline/*_generate_*.py)
- staging:      ecom_staging casts (stg_*)
- intermediate: ecom_intermediate lookups/entities/transactions
- marts:        ecom_marts dims + facts
- registry:     model specs + topological runner + materializer
- quality:      dbt-style data tests (unique / not_null / relationships)
"""

from .registry import MODELS, PipelineRunner, RunContext

__all__ = ["MODELS", "PipelineRunner", "RunContext"]
