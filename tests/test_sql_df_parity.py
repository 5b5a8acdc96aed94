"""The headline catalog entries are SQL text (one JVM call to build — py4j
plan construction otherwise dominates sub-second queries). Every SQL entry
keeps a DataFrame twin; these tests pin BIT-EXACT result equality between the
two forms, so the SQL rewrite can never drift from the DataFrame semantics
the operators are specified in.
"""

from __future__ import annotations

import math

import pytest

from ecom_snowflake_duckdb_migration_spark.queries import all_queries, catalog_core, catalog_llm

PAIRS = [
    ("q01_pricing_summary", catalog_core.q01_pricing_summary_df),
    ("q02_revenue_by_nation", catalog_core.q02_revenue_by_nation_df),
    ("q03_top_parts_by_revenue", catalog_core.q03_top_parts_by_revenue_df),
    ("q05_nation_trade_roles", catalog_core.q05_nation_trade_roles_df),
    ("q06_multikey_min_price_join", catalog_core.q06_multikey_min_price_join_df),
    ("q07_dedup_keep_newest", catalog_core.q07_dedup_keep_newest_df),
    ("q13_conditional_activity", catalog_core.q13_conditional_activity_df),
    ("q22_count_distinct_quirk", catalog_core.q22_count_distinct_quirk_df),
    ("q24_grouped_column_reuse", catalog_core.q24_grouped_column_reuse_df),
    ("q40_dedup_exact", catalog_llm.q40_dedup_exact_df),
]


def _canon(df):
    cols = sorted(df.columns)
    rows = [tuple(row[c] for c in cols) for row in df.select(*cols).collect()]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


@pytest.mark.parametrize("name,df_fn", PAIRS, ids=[p[0] for p in PAIRS])
def test_sql_equals_dataframe(spark, sf_dir, name, df_fn):
    spec = all_queries()[name]
    sql_df = spec.fn(spark, sf_dir)
    twin_df = df_fn(spark, sf_dir)
    assert dict(sql_df.dtypes) == dict(twin_df.dtypes)
    got, want = _canon(sql_df), _canon(twin_df)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            if isinstance(gv, float):
                # bit-exact, including NaN; no tolerance
                assert (math.isnan(gv) and math.isnan(wv)) or gv == wv, (name, g, w)
            else:
                assert gv == wv, (name, g, w)
