"""Z-order layout: the clustered write must prune row groups on BOTH
dimensions, where a linear sort prunes on only one. Pruning power is read
from parquet footer min/max stats (operators/layout.rowgroups_admitting) —
the same decision scan-time row-group skipping makes, without timing noise."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecom_snowflake_duckdb_migration_spark.operators import layout
from ecom_snowflake_duckdb_migration_spark.queries import load


def _write(df, path):
    df.write.mode("overwrite").parquet(path)
    return path


def _frac(path, column, lo, hi):
    admit, total = layout.rowgroups_admitting(path, column, lo, hi)
    assert total > 0
    return admit / total


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    stats = o.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("o_orderkey"), F.max("o_orderkey")
    ).collect()[0]
    c_lo, c_hi, k_lo, k_hi = stats
    parts = 16

    z_path = _write(
        layout.cluster_by_zorder(
            o, "o_custkey", "o_orderkey", (c_lo, c_hi), (k_lo, k_hi), parts
        ),
        str(tmp_path / "zorder"),
    )
    by_cust = _write(
        o.repartitionByRange(parts, "o_custkey").sortWithinPartitions("o_custkey"),
        str(tmp_path / "by_cust"),
    )
    by_key = _write(
        o.repartitionByRange(parts, "o_orderkey").sortWithinPartitions("o_orderkey"),
        str(tmp_path / "by_key"),
    )

    # Probe: a ~1/8-of-domain range on each dimension.
    c_width = max((c_hi - c_lo) // 8, 1)
    k_width = max((k_hi - k_lo) // 8, 1)
    c_rng = (c_lo + 3 * c_width, c_lo + 4 * c_width)
    k_rng = (k_lo + 3 * k_width, k_lo + 4 * k_width)

    # Linear layouts: perfect on their own dimension, blind on the other.
    assert _frac(by_cust, "o_custkey", *c_rng) <= 0.25
    assert _frac(by_key, "o_orderkey", *k_rng) <= 0.25
    assert _frac(by_cust, "o_orderkey", *k_rng) >= 0.9
    assert _frac(by_key, "o_custkey", *c_rng) >= 0.9

    # Z-order: substantially prunes BOTH (the d=2 theory bound for a 1/8
    # slab is ~sqrt(1/8) ~ 0.35 of row groups; allow generous slack for
    # the range partitioner's sampled boundaries at small scale).
    zc = _frac(z_path, "o_custkey", *c_rng)
    zk = _frac(z_path, "o_orderkey", *k_rng)
    assert zc <= 0.7, f"zorder custkey pruning too weak: {zc}"
    assert zk <= 0.7, f"zorder orderkey pruning too weak: {zk}"
    assert zc + zk < (
        _frac(by_cust, "o_orderkey", *k_rng) + _frac(by_key, "o_custkey", *c_rng)
    ), "zorder is not better than the linear layouts' blind sides"


def test_zorder_key_bit_interleave_exact(spark):
    # 16-bit spread is the exact Morton interleave: check against a Python
    # reference on the corners and a few mid-domain values.
    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    vals = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (40000, 3)]
    df = spark.createDataFrame(vals, "a INT, b INT").withColumn(
        "z", layout.zorder_key("a", "b")
    )
    for row in df.collect():
        assert row.z == morton(row.a, row.b), (row.a, row.b, row.z)
