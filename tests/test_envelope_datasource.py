"""Spark 4 Python DataSource for the envelope format: parity with the
JVM-path reader, per-file validation, inference, and file-parallel scan."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ecom_snowflake_duckdb_migration_spark import sources
from ecom_snowflake_duckdb_migration_spark.queries import load
from ecom_snowflake_duckdb_migration_spark.sources import envelope_datasource as eds


@pytest.fixture(scope="module")
def envelope_dir(spark, sf_dir, tmp_path_factory):
    """Three reference-style envelope files (one pretty-printed object per
    file, like the S3 drops) holding disjoint slices of events."""
    path = str(tmp_path_factory.mktemp("eds") / "env")
    os.makedirs(path)
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    rows = [r.asDict() for r in ev.collect()]
    for i in range(3):
        chunk = rows[i::3]
        env = {
            "metadata": {
                "table": "events",
                "recordCount": len(chunk),
                "generatedAt": f"2026-08-14T0{i}:00:00+00:00",
                "version": "1.0",
            },
            "data": chunk,
        }
        with open(os.path.join(path, f"drop_{i}.json"), "w") as f:
            json.dump(env, f)
    eds.register(spark)
    return path, ev


def test_reads_match_jvm_reader(spark, envelope_dir):
    path, ev = envelope_dir
    df = (
        spark.read.format("ecom_envelope")
        .option("path", path)
        .option("validate_count", "true")
        .load()
    )
    got = sorted(map(tuple, df.drop("_envelope_file", "_generated_at").collect()))
    want = sorted(map(tuple, ev.collect()))
    assert got == want
    # lineage columns populated
    row = df.limit(1).collect()[0]
    assert row._envelope_file.startswith(path)
    assert row._generated_at


def test_partition_per_file(spark, envelope_dir):
    path, _ = envelope_dir
    df = spark.read.format("ecom_envelope").option("path", path).load()
    n_files = len([f for f in os.listdir(path) if not f.startswith(("_", "."))])
    assert n_files >= 3
    assert df.rdd.getNumPartitions() == n_files


def test_validation_fails_on_corrupt_envelope(spark, envelope_dir, tmp_path):
    path, _ = envelope_dir
    bad_dir = str(tmp_path / "bad")
    os.makedirs(bad_dir)
    bad = {
        "metadata": {"table": "events", "recordCount": 99, "generatedAt": "x", "version": "1.0"},
        "data": [{"event_id": 1, "user_id": 2, "event_type": "click", "value": 1.0}],
    }
    with open(os.path.join(bad_dir, "drop.json"), "w") as f:
        json.dump(bad, f)
    df = (
        spark.read.format("ecom_envelope")
        .option("path", bad_dir)
        .option("validate_count", "true")
        .load()
    )
    with pytest.raises(Exception, match="recordCount"):
        df.collect()
    # without validation the same file reads fine
    ok = spark.read.format("ecom_envelope").option("path", bad_dir).load()
    assert ok.count() == 1


def test_schema_inference_types(spark, envelope_dir):
    path, _ = envelope_dir
    df = spark.read.format("ecom_envelope").option("path", path).load()
    kinds = dict(df.dtypes)
    assert kinds["event_id"] == "bigint"
    assert kinds["value"] == "double"
    assert kinds["event_type"] == "string"


def test_envelope_datasource_write_round_trip_and_overwrite(spark, tmp_path):
    from pyspark.sql import functions as F

    eds.register(spark)
    out = str(tmp_path / "drops")
    df = spark.range(10).select(
        F.col("id").alias("order_id"), (F.col("id") * 2).alias("qty")
    )
    (
        df.repartition(3)
        .write.format("ecom_envelope")
        .option("path", out)
        .option("table", "orders")
        .option("generated_at", "2026-01-15T00:00:00+00:00")
        .mode("append")  # Python DataSource API supports append/overwrite only
        .save()
    )
    back = (
        spark.read.format("ecom_envelope")
        .option("path", out)
        .option("validate_count", "true")
        .load()
    )
    assert {(r.order_id, r.qty) for r in back.collect()} == {(i, 2 * i) for i in range(10)}
    assert back.select("_generated_at").distinct().collect()[0][0] == "2026-01-15T00:00:00+00:00"
    # parallel write: one valid envelope per non-empty task
    import glob as g
    files = g.glob(out + "/*.json")
    assert 1 <= len(files) <= 3 and not g.glob(out + "/*.tmp")

    # overwrite replaces the previous drop entirely
    df2 = spark.range(4).select(F.col("id").alias("order_id"), F.lit(0).alias("qty"))
    (
        df2.write.format("ecom_envelope")
        .option("path", out)
        .option("table", "orders")
        .mode("overwrite")
        .save()
    )
    again = spark.read.format("ecom_envelope").option("path", out).load()
    assert {r.order_id for r in again.collect()} == {0, 1, 2, 3}


def test_envelope_writer_overwrite_renames_before_deletes(tmp_path, monkeypatch):
    """Overwrite commit must rename the staged generation into place BEFORE
    deleting the old one — a crash mid-commit then leaves old+new mixed
    (readers tolerate), never a directory with zero visible envelopes."""
    import json
    import os

    from pyspark.sql.types import LongType, StructField, StructType

    path = str(tmp_path / "env")
    os.makedirs(path)
    old_file = os.path.join(path, "part-old.json")
    with open(old_file, "w") as f:
        json.dump(
            {
                "metadata": {"table": "t", "recordCount": 1,
                             "generatedAt": "x", "version": "1.0"},
                "data": [{"a": 1}],
            },
            f,
        )
    schema = StructType([StructField("a", LongType())])
    w = eds.EnvelopeWriter(schema, {"path": path}, overwrite=True)
    staged = os.path.join(path, "part-new.json.tmp")
    with open(staged, "w") as f:
        json.dump(
            {
                "metadata": {"table": "t", "recordCount": 1,
                             "generatedAt": "y", "version": "1.0"},
                "data": [{"a": 2}],
            },
            f,
        )
    order = []
    real_rename, real_remove = os.rename, os.remove
    monkeypatch.setattr(
        os, "rename", lambda a, b: (order.append("rename"), real_rename(a, b))[1]
    )
    monkeypatch.setattr(
        os, "remove", lambda a: (order.append("remove"), real_remove(a))[1]
    )
    w.commit([eds._EnvelopeCommit(staged, 1)])
    monkeypatch.undo()
    assert order == ["rename", "remove"], order
    assert not os.path.exists(old_file) and not os.path.exists(staged)
    assert os.path.exists(os.path.join(path, "part-new.json"))


def test_envelope_datasource_streaming_incremental_drops(spark, tmp_path):
    """Stream the drop directory: first run ingests the existing drops,
    a restart from the same checkpoint picks up ONLY files whose names
    sort after the high-water mark (exactly-once over the offset log)."""
    import time

    eds.register(spark)
    drop_dir = str(tmp_path / "drops")
    os.makedirs(drop_dir)
    ckpt = str(tmp_path / "ckpt")

    def write_drop(name, rows, gen):
        env = {
            "metadata": {"table": "events", "recordCount": len(rows),
                         "generatedAt": gen, "version": "1.0"},
            "data": rows,
        }
        with open(os.path.join(drop_dir, name), "w") as f:
            json.dump(env, f)

    write_drop("drop_2026-08-13.json", [{"k": 1}, {"k": 2}], "2026-08-13T00:00:00+00:00")
    write_drop("drop_2026-08-14.json", [{"k": 3}], "2026-08-14T00:00:00+00:00")

    def run_available():
        stream = (
            spark.readStream.format("ecom_envelope")
            .schema("k bigint, _envelope_file string, _generated_at string")
            .option("path", drop_dir)
            .option("validate_count", "true")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_available()
    got = spark.read.parquet(str(tmp_path / "out"))
    assert {r.k for r in got.collect()} == {1, 2, 3}

    # new drop lands with a later-sorting name; restart ingests ONLY it
    write_drop("drop_2026-08-15.json", [{"k": 4}], "2026-08-15T00:00:00+00:00")
    run_available()
    rows = [r.k for r in spark.read.parquet(str(tmp_path / "out")).collect()]
    assert sorted(rows) == [1, 2, 3, 4]  # no re-ingest of the first drops


def test_envelope_streaming_sink_exactly_once_across_restart(spark, tmp_path):
    """The S3-drop round-trip closed as a stream: drops in -> envelope
    files out via foreachBatch, one batch_id=N subdirectory per batch.
    A restart from the same checkpoint over the same source adds NOTHING
    (no duplicate envelopes, byte-stable files); a new drop after the
    restart lands as exactly one new batch directory; the batch reader
    reads the whole tree recursively and sees every row exactly once."""
    import glob
    import os
    import time

    from pyspark.sql import functions as F

    from ecom_snowflake_duckdb_migration_spark.streaming import (
        read_event_stream,
        write_envelope_stream,
    )

    eds.register(spark)
    src = str(tmp_path / "in")
    os.makedirs(src)
    schema = "order_id bigint, qty bigint"

    def drop(i, lo, hi):
        tmp = f"{src}/.t{i}"
        spark.range(lo, hi).select(
            F.col("id").alias("order_id"), (F.col("id") * 2).alias("qty")
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        f = [x for x in os.listdir(tmp) if x.endswith(".parquet")][0]
        os.rename(f"{tmp}/{f}", f"{src}/drop_{i}.parquet")

    drop(0, 0, 10)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    from pyspark.sql.types import _parse_datatype_string

    args = dict(
        out_dir=out, checkpoint_dir=ckpt, table="orders",
        generated_at="2026-01-15T00:00:00+00:00",
    )
    q = write_envelope_stream(
        read_event_stream(spark, src, _parse_datatype_string(schema), max_files_per_trigger=1),
        **args,
    )
    q.awaitTermination(60)
    files1 = {f: os.path.getmtime(f) for f in glob.glob(f"{out}/**/*.json", recursive=True)}
    assert files1 and all("/batch_id=" in f for f in files1)

    # restart, same source + checkpoint: nothing new, nothing rewritten
    q = write_envelope_stream(
        read_event_stream(spark, src, _parse_datatype_string(schema), max_files_per_trigger=1),
        **args,
    )
    q.awaitTermination(60)
    files2 = {f: os.path.getmtime(f) for f in glob.glob(f"{out}/**/*.json", recursive=True)}
    assert files2 == files1, "restart must not rewrite or duplicate envelopes"

    # a new drop lands as exactly one new batch directory
    time.sleep(1.1)
    drop(1, 10, 15)
    q = write_envelope_stream(
        read_event_stream(spark, src, _parse_datatype_string(schema), max_files_per_trigger=1),
        **args,
    )
    q.awaitTermination(60)
    batch_dirs = sorted(glob.glob(f"{out}/batch_id=*"))
    assert len(batch_dirs) == 2

    back = (
        spark.read.format("ecom_envelope")
        .option("path", out)
        .option("validate_count", "true")
        .load()
    )
    got = sorted((r.order_id, r.qty) for r in back.collect())
    assert got == [(i, 2 * i) for i in range(15)]  # every row exactly once
    assert back.select("_generated_at").distinct().count() == 1


def test_envelope_drop_to_drop_streaming_round_trip(spark, tmp_path):
    """The reference's full drop cadence as one stream: envelope drops in
    (EnvelopeStreamReader) -> transform -> envelope drops out
    (write_envelope_stream); the output directory reads back as valid
    envelopes carrying exactly the transformed rows."""
    import os

    from ecom_snowflake_duckdb_migration_spark.streaming import write_envelope_stream

    eds.register(spark)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i in range(2):
        rows = [{"order_id": 10 * i + j, "qty": j} for j in range(5)]
        env = {
            "metadata": {"table": "orders", "recordCount": len(rows),
                         "generatedAt": f"2026-08-1{i}T00:00:00+00:00",
                         "version": "1.0"},
            "data": rows,
        }
        with open(os.path.join(in_dir, f"drop_{i}.json"), "w") as f:
            json.dump(env, f)

    stream = (
        spark.readStream.format("ecom_envelope")
        .schema("order_id bigint, qty bigint, _envelope_file string, _generated_at string")
        .option("path", in_dir)
        .load()
        .select("order_id", (F.col("qty") * 10).alias("qty10"))
    )
    q = write_envelope_stream(
        stream, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        table="orders_x10", generated_at="2026-08-15T00:00:00+00:00",
    )
    q.awaitTermination(60)
    back = (
        spark.read.format("ecom_envelope")
        .option("path", str(tmp_path / "out"))
        .option("validate_count", "true")
        .load()
    )
    got = sorted((r.order_id, r.qty10) for r in back.collect())
    want = sorted((10 * i + j, j * 10) for i in range(2) for j in range(5))
    assert got == want
