"""Every catalog query must match its DuckDB oracle — the local mirror of the
driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from ecom_snowflake_duckdb_migration_spark.oracle import compare_to_oracle
from ecom_snowflake_duckdb_migration_spark.queries import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver's weak path
        return
    result = compare_to_oracle(name, df, spec.oracle, sf_dir)
    assert result.ok, result.detail
