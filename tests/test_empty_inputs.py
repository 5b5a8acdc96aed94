"""Every catalog query must run (not necessarily return rows) on an
all-empty dataset: schema-only inputs are the day-one state of every
incremental pipeline, and the classic failure modes (first() on empty,
div-by-zero in derived ratios, clustering on zero vectors) all surface
here."""

from __future__ import annotations

import pytest

from ecom_snowflake_duckdb_migration_spark.queries import TABLES, all_queries


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


def test_all_queries_run_on_empty_inputs(spark, empty_dir):
    failures = []
    for name, spec in sorted(all_queries().items()):
        try:
            assert spec.fn(spark, empty_dir).count() >= 0
        except Exception as exc:  # collect all, report once
            failures.append(f"{name}: {str(exc).splitlines()[0][:160]}")
    assert not failures, "\n".join(failures)
