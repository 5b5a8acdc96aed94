"""Streaming operator tests: availableNow micro-batch runs over real driver
events parquet, checked against the equivalent batch computation."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from ecom_snowflake_duckdb_migration_spark import streaming
from ecom_snowflake_duckdb_migration_spark.queries import load


@pytest.fixture(scope="module")
def event_source(spark, sf_dir, tmp_path_factory):
    """Events re-encoded as micro-batch files (ts normalized to micros)."""
    root = tmp_path_factory.mktemp("stream")
    src = str(root / "source")
    events = load(spark, sf_dir, "events")
    # Two files = two micro-batches under maxFilesPerTrigger=1.
    events.repartition(2).write.mode("overwrite").parquet(src)
    return src, events.schema, root


def test_windowed_counts_match_batch(spark, event_source):
    src, schema, root = event_source
    stream = streaming.read_event_stream(spark, src, schema, max_files_per_trigger=1)
    agg = streaming.windowed_event_counts(
        stream, ts_col="ts", key_col="event_type", window_size="1 day",
        lateness="1 hour", distinct_col="user_id",
    )
    out = str(root / "agg_out")
    ckpt = str(root / "agg_ckpt")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "events", "total_value")
    )
    # Append mode emits only watermark-closed windows; every emitted window
    # must match the batch result exactly (counts + sums).
    joined = got.alias("g").join(batch.alias("b"), ["window_start", "event_type"], "inner")
    n_got = got.count()
    assert n_got > 0, "no windows emitted"
    assert joined.count() == n_got
    bad = joined.filter(
        (F.col("g.events") != F.col("b.events"))
        | (F.abs(F.col("g.total_value") - F.col("b.total_value")) > 1e-6)
    )
    assert bad.count() == 0


def test_stream_dedup_bounded(spark, event_source):
    src, schema, root = event_source
    stream = streaming.read_event_stream(spark, src, schema)
    deduped = streaming.dedup_stream(stream, ["event_id"], "ts", "1 hour")
    out = str(root / "dedup_out")
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(root / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == got.select("event_id").distinct().count()


def test_upsert_stream_sink(spark, event_source):
    src, schema, root = event_source
    target = str(root / "upsert_target")
    stream = streaming.read_event_stream(spark, src, schema, max_files_per_trigger=1)
    q = streaming.upsert_stream_sink(
        stream, target, ["event_id"], str(root / "upsert_ckpt")
    )
    q.awaitTermination(300)
    got = spark.read.parquet(target)
    want = spark.read.parquet(src)
    assert got.count() == want.count()
    assert got.select("event_id").distinct().count() == want.count()

    # Replaying the same stream from a fresh checkpoint re-upserts the same
    # keys — the sink must stay idempotent (delete+insert semantics).
    shutil.rmtree(str(root / "upsert_ckpt2"), ignore_errors=True)
    q2 = streaming.upsert_stream_sink(
        streaming.read_event_stream(spark, src, schema),
        target, ["event_id"], str(root / "upsert_ckpt2"),
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(target).count() == want.count()


def test_sessionize_custom_aggs(spark, event_source):
    """The projection must carry the caller's agg aliases, not a hardcoded
    (n_events, total_value) tuple."""
    src, schema, root = event_source
    out = streaming.sessionize(
        spark.read.parquet(src),
        gap="30 minutes",
        ts_col="ts",
        key_cols=["user_id"],
        aggs=[
            F.max("value").alias("peak_value"),
            F.count_distinct(F.col("event_type")).alias("n_event_types"),
        ],
    )
    assert set(out.columns) == {
        "user_id", "session_start", "session_end", "peak_value", "n_event_types",
    }
    row = out.orderBy("user_id", "session_start").first()
    assert row.n_event_types >= 1 and row.peak_value is not None


def test_streaming_sessionize_matches_batch(spark, event_source):
    src, schema, root = event_source
    stream = streaming.read_event_stream(spark, src, schema, max_files_per_trigger=1)
    sess = streaming.sessionize(
        stream, gap="30 minutes", ts_col="ts", key_cols=["user_id"], watermark="1 hour"
    )
    out = str(root / "sess_out")
    q = (
        sess.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(root / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    batch = streaming.sessionize(
        spark.read.parquet(src), gap="30 minutes", ts_col="ts", key_cols=["user_id"]
    )
    # Append mode emits watermark-closed sessions; each must exist in the
    # batch result with identical bounds and counts.
    joined = got.alias("g").join(
        batch.alias("b"), ["user_id", "session_start", "session_end"], "inner"
    )
    n = got.count()
    assert n > 0
    assert joined.count() == n
    assert joined.filter(F.col("g.n_events") != F.col("b.n_events")).count() == 0


def test_running_counts_stateful_across_batches(spark, event_source):
    src, schema, root = event_source
    stream = streaming.read_event_stream(spark, src, schema, max_files_per_trigger=1)
    counts = streaming.running_counts_stateful(stream, "event_type")
    out = str(root / "state_out")

    # parquet sinks reject update mode; foreachBatch appends each batch's
    # emissions (exactly what a real update-mode sink would consume).
    def sink(batch, batch_id):
        batch.write.mode("append").parquet(out)

    q = (
        counts.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(root / "state_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    # Multiple emissions per key (one per micro-batch that saw it); the MAX
    # is the final running total and must equal the batch count — state
    # really accumulated across the two files.
    final = {r.key: r.total for r in got.groupBy("key").agg(F.max("total").alias("total")).collect()}
    want = {
        r.event_type: r.n
        for r in spark.read.parquet(src).groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert final == want
    emissions_per_key = got.groupBy("key").count().agg(F.max("count")).first()[0]
    assert emissions_per_key == 2  # two micro-batches -> state carried over


def test_watermark_boundary_window_emission(spark, tmp_path):
    """Pins the q32 oracle's boundary rule: with max(ts) landing EXACTLY one
    hour past a day boundary, the final watermark equals that day boundary
    exactly, and Spark's append mode emits the window whose end == watermark
    (the eviction predicate is window_end <= watermark). The q32 oracle's
    ``window_start + 1 DAY <= max(ts) - 1 HOUR`` uses the same <=, so the
    equality case agrees between engines by construction."""
    import datetime

    rows = [
        (1, "click", 1.0, datetime.datetime(2026, 1, 1, 10, 0, 0)),
        (2, "click", 1.0, datetime.datetime(2026, 1, 1, 23, 59, 59)),
        # exactly day2 + 1h: watermark after the final no-data batch is
        # exactly 2026-01-02 00:00:00 — the boundary under test
        (3, "view", 1.0, datetime.datetime(2026, 1, 2, 1, 0, 0)),
    ]
    src = str(tmp_path / "src")
    events = spark.createDataFrame(rows, "user_id long, event_type string, value double, ts timestamp")
    events.coalesce(1).write.mode("overwrite").parquet(src)

    stream = streaming.read_event_stream(spark, src, events.schema)
    agg = streaming.windowed_event_counts(
        stream, ts_col="ts", key_col="event_type", window_size="1 day", lateness="1 hour"
    )
    out = str(tmp_path / "out")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    emitted = {
        (r.window_start, r.event_type, r.events)
        for r in spark.read.parquet(out).collect()
    }
    # window [day1, day2) ends exactly at the watermark -> emitted;
    # window [day2, day3) is still open -> held in state, not emitted
    assert emitted == {(datetime.datetime(2026, 1, 1, 0, 0, 0), "click", 2)}


def test_restart_same_checkpoint_exactly_once(spark, tmp_path):
    """Exactly-once across restarts: re-running availableNow from the SAME
    checkpoint must not re-emit already-appended windows (reprocessing would
    visibly duplicate append-mode output), and new data arriving between
    runs emits only the incrementally-closed windows."""
    import datetime

    def write_file(rows, name):
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, value double, ts timestamp"
        )
        df.coalesce(1).write.mode("append").parquet(str(tmp_path / "src"))

    day = datetime.datetime
    write_file(
        [
            (1, "click", 1.0, day(2026, 1, 1, 9, 0, 0)),
            (2, "click", 1.0, day(2026, 1, 2, 12, 0, 0)),
        ],
        "batch1",
    )
    schema = "user_id long, event_type string, value double, ts timestamp"
    from pyspark.sql.types import _parse_datatype_string

    sch = _parse_datatype_string(schema)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        stream = streaming.read_event_stream(spark, str(tmp_path / "src"), sch)
        agg = streaming.windowed_event_counts(stream, ts_col="ts", key_col="event_type")
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        return [
            (r.window_start, r.event_type, r.events)
            for r in spark.read.parquet(out).collect()
        ]

    first = run_once()
    # day1 closed (watermark = day2 12:00 - 1h), day2 still open
    assert sorted(first) == [(day(2026, 1, 1), "click", 1)]

    # restart with NO new data: nothing may be re-emitted
    second = run_once()
    assert sorted(second) == sorted(first)

    # new data closes day2; only the incremental window appends, no dupes
    write_file([(3, "view", 1.0, day(2026, 1, 3, 6, 0, 0))], "batch2")
    third = run_once()
    assert sorted(third) == [
        (day(2026, 1, 1), "click", 1),
        (day(2026, 1, 2), "click", 1),
    ]


def test_stream_stream_interval_join_matches_batch(spark, event_source):
    """Purchases joined to same-user clicks within a 30-minute lookback,
    streaming vs the identical batch join — row-for-row equal once the
    availableNow run drains (watermarks only gate lateness here; all data
    arrives, so no row is lost to eviction)."""
    from ecom_snowflake_duckdb_migration_spark.streaming import joins as sj

    src, schema, root = event_source
    events = spark.read.parquet(src)

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    stream = streaming.read_event_stream(spark, src, schema, max_files_per_trigger=1)
    s_clicks, s_purch = split(stream)
    joined = sj.attribute_purchases_to_clicks(s_clicks, s_purch)
    out = str(root / "join_out")
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(root / "join_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    b_clicks, b_purch = split(events)
    batch = sj.attribute_purchases_to_clicks(b_clicks, b_purch)

    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, batch.collect()))
    assert len(want) > 0, "no purchase/click pairs in the fixture window"
    assert got == want


def test_stream_static_enrichment(spark, event_source, sf_dir):
    from ecom_snowflake_duckdb_migration_spark.streaming import joins as sj

    src, schema, root = event_source
    dim = (
        load(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_key"), "c_mktsegment")
    )
    stream = streaming.read_event_stream(spark, src, schema, max_files_per_trigger=1)
    enriched = sj.enrich_stream_with_dim(stream, dim, "user_id", "user_key")
    out = str(root / "enrich_out")
    q = (
        enriched.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(root / "enrich_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    events = spark.read.parquet(src)
    assert got.count() == events.count()  # LEFT join preserves the stream
    matched = got.filter(F.col("c_mktsegment").isNotNull()).count()
    want_matched = events.join(dim, events.user_id == dim.user_key, "inner").count()
    assert matched == want_matched


def test_streaming_corpus_dedup_matches_batch(spark, sf_dir, tmp_path):
    """availableNow stream over three document drops == one-shot batch LSH
    over the full corpus: every near-dup pair is emitted exactly once, in
    the batch where its later member arrived; a re-run over the same
    source emits nothing new (checkpoint) and the store stays correct."""
    import os

    from ecom_snowflake_duckdb_migration_spark.operators import text as tx
    from ecom_snowflake_duckdb_migration_spark.streaming.corpus_dedup import (
        streaming_corpus_dedup,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "drops")
    os.makedirs(src)
    # three ordered drops; later file = later micro-batch (mtime order)
    import time as _time

    for i, (lo, hi) in enumerate([(0, 200), (200, 400), (400, 600)]):
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{src}/.tmp_{i}")
        # file source orders micro-batches by modification time
        batch_file = [
            f for f in os.listdir(f"{src}/.tmp_{i}") if f.endswith(".parquet")
        ][0]
        os.rename(f"{src}/.tmp_{i}/{batch_file}", f"{src}/drop_{i}.parquet")
        _time.sleep(1.1)

    from ecom_snowflake_duckdb_migration_spark.streaming import read_event_stream

    params = dict(k=3, num_hashes=32, bands=8, hash_fn="xxhash64")
    stream = read_event_stream(
        spark, src, docs.schema, max_files_per_trigger=1
    )
    store = str(tmp_path / "store")
    pairs_out = str(tmp_path / "pairs")
    q = streaming_corpus_dedup(
        stream, store, str(tmp_path / "ckpt"), pairs_out,
        threshold_e6=800_000, **params,
    )
    q.awaitTermination(120)

    got = {
        (r.d1, r.d2): r.jaccard_e6
        for r in spark.read.parquet(pairs_out).collect()
    }
    want = {
        (r.d1, r.d2): r.jaccard_e6
        for r in tx.minhash_lsh_pairs(docs, threshold_e6=800_000).collect()
    }
    assert got == want and got, "streamed pairs must equal the one-shot batch run"

    # replay: same source, same checkpoint -> no new batches, store intact
    q2 = streaming_corpus_dedup(
        read_event_stream(spark, src, docs.schema, max_files_per_trigger=1),
        store, str(tmp_path / "ckpt"), pairs_out,
        threshold_e6=800_000, **params,
    )
    q2.awaitTermination(60)
    assert {
        (r.d1, r.d2) for r in spark.read.parquet(pairs_out).collect()
    } == set(want)
    assert spark.read.parquet(f"{store}/docs").count() == docs.count()


def test_streaming_corpus_dedup_redelivery_safe(spark, sf_dir, tmp_path):
    """A later drop REdelivering already-seen doc ids must not re-emit
    their historical pairs or self-pairs; genuinely new docs still pair."""
    import os

    from ecom_snowflake_duckdb_migration_spark.operators import text as tx
    from ecom_snowflake_duckdb_migration_spark.streaming import read_event_stream
    from ecom_snowflake_duckdb_migration_spark.streaming.corpus_dedup import (
        streaming_corpus_dedup,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "drops")
    os.makedirs(src)

    def drop(i, df):
        tmp = f"{src}/.t{i}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        f = [x for x in os.listdir(tmp) if x.endswith(".parquet")][0]
        os.rename(f"{tmp}/{f}", f"{src}/drop_{i}.parquet")

    drop(0, docs.filter(F.col("doc_id") < 300))
    args = dict(
        store_dir=str(tmp_path / "store"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        pairs_out_dir=str(tmp_path / "pairs"),
        k=3, num_hashes=32, bands=8, hash_fn="xxhash64", threshold_e6=800_000,
    )
    q = streaming_corpus_dedup(
        read_event_stream(spark, src, docs.schema, max_files_per_trigger=1), **args
    )
    q.awaitTermination(120)
    first = {(r.d1, r.d2) for r in spark.read.parquet(args["pairs_out_dir"]).collect()}

    # drop 1: 100 redelivered ids + the genuinely new tail
    import time as _time

    _time.sleep(1.1)
    drop(1, docs.filter((F.col("doc_id") < 100) | (F.col("doc_id") >= 300)))
    q = streaming_corpus_dedup(
        read_event_stream(spark, src, docs.schema, max_files_per_trigger=1), **args
    )
    q.awaitTermination(120)
    got = {(r.d1, r.d2) for r in spark.read.parquet(args["pairs_out_dir"]).collect()}
    want = {
        (r.d1, r.d2)
        for r in tx.minhash_lsh_pairs(docs, threshold_e6=800_000).collect()
    }
    assert got == want, "redelivered ids must not duplicate or drop pairs"
    assert not any(d1 == d2 for d1, d2 in got)
    # docs store has no duplicate ids
    n = spark.read.parquet(f"{args['store_dir']}/docs")
    assert n.count() == n.select("doc_id").distinct().count() == docs.count()


def test_streaming_corpus_dedup_torn_docs_append_replay(spark, tmp_path):
    """A crash during the docs-store write used to leave a torn append:
    the replayed batch anti-joined the half-written docs out and the pairs
    overwrite permanently dropped their pairs. With the batch-keyed docs
    store the replay excludes its OWN partition, reprocesses the full
    batch, and the pairs partition comes back complete."""
    import os

    from ecom_snowflake_duckdb_migration_spark.operators.incremental_dedup import (
        lsh_band_table,
    )
    from ecom_snowflake_duckdb_migration_spark.sources import sketch_store
    from ecom_snowflake_duckdb_migration_spark.streaming import read_event_stream
    from ecom_snowflake_duckdb_migration_spark.streaming.corpus_dedup import (
        streaming_corpus_dedup,
    )

    text = " ".join(f"tok{i}" for i in range(30))
    docs = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    params = dict(k=3, num_hashes=32, bands=8, hash_fn="xxhash64")
    store = str(tmp_path / "store")

    # crash state: bands merged for BOTH docs, docs partition torn (doc 1
    # only), pairs for the batch already written once (then lost to the
    # crash window — start it absent; the replay must recreate it)
    sketch_store.merge_into(
        spark, f"{store}/bands",
        lsh_band_table(docs, "text", "doc_id", **params),
        "lsh_bands", **params,
    )
    docs.filter(F.col("doc_id") == 1).write.parquet(f"{store}/docs/batch_id=0")

    src = str(tmp_path / "drops")
    os.makedirs(src)
    tmp = f"{src}/.t0"
    docs.coalesce(1).write.parquet(tmp)
    f = [x for x in os.listdir(tmp) if x.endswith(".parquet")][0]
    os.rename(f"{tmp}/{f}", f"{src}/drop_0.parquet")

    q = streaming_corpus_dedup(
        read_event_stream(spark, src, docs.schema, max_files_per_trigger=1),
        store, str(tmp_path / "ckpt"), str(tmp_path / "pairs"),
        threshold_e6=800_000, **params,
    )
    q.awaitTermination(120)
    pairs = {
        (r.d1, r.d2) for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    assert pairs == {(1, 2)}, pairs  # the torn doc's pair survives replay
    store_docs = spark.read.parquet(f"{store}/docs")
    assert store_docs.count() == 2  # torn partition repaired by overwrite
    assert store_docs.select("doc_id").distinct().count() == 2


def test_streaming_lm_score_matches_batch(spark, sf_dir, tmp_path):
    """Stream-side LM scoring over two document drops == one-shot batch
    lm_score: per-doc scores are a pure function of (row, static model),
    so micro-batch union is exact."""
    from ecom_snowflake_duckdb_migration_spark.operators import text as tx
    from ecom_snowflake_duckdb_migration_spark.streaming import read_event_stream
    from ecom_snowflake_duckdb_migration_spark.streaming.scoring import (
        streaming_lm_score,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    model = tx.lm_trigram_model(docs.filter(F.col("source") == "src0"))
    corpus = docs.filter(F.col("source") != "src0").select("doc_id", "text")
    src = str(tmp_path / "drops")
    corpus.repartition(2).write.mode("overwrite").parquet(src)

    stream = read_event_stream(spark, src, corpus.schema, max_files_per_trigger=1)
    out = str(tmp_path / "scores")
    q = streaming_lm_score(stream, model, out, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    got = {
        r.doc_id: (r.n_trigrams, r.nll_e6) for r in spark.read.parquet(out).collect()
    }
    want = {
        r.doc_id: (r.n_trigrams, r.nll_e6)
        for r in tx.lm_score(corpus, model).collect()
    }
    assert got == want

    # redelivery safety: a replayed micro-batch overwrites its own
    # batch_id partition with identical rows — no duplicates appear
    import os

    part = sorted(p for p in os.listdir(out) if p.startswith("batch_id="))[0]
    replay = spark.read.parquet(out).filter(f"batch_id = {part.split('=')[1]}")
    replayed_ids = [r.doc_id for r in replay.select("doc_id").collect()]
    batch = corpus.filter(F.col("doc_id").isin(replayed_ids))
    tx.lm_score(batch, model).write.mode("overwrite").parquet(f"{out}/{part}")
    again = {
        r.doc_id: (r.n_trigrams, r.nll_e6) for r in spark.read.parquet(out).collect()
    }
    assert again == want


def test_stream_dedup_state_evicted_after_watermark(spark, tmp_path_factory):
    """dedup_stream must use dropDuplicatesWithinWatermark: per-key state is
    EVICTED once the watermark passes the key's event time + delay, so a
    duplicate arriving after the horizon is emitted again (bounded state —
    the at-least-once trade every 100 TB/day exact-dedup must accept).
    Plain dropDuplicates would pin state forever and still drop it; this
    test fails against that unbounded-state shape."""
    import datetime as dt

    root = tmp_path_factory.mktemp("dedup_evict")
    src, out, ckpt = str(root / "src"), str(root / "out"), str(root / "ckpt")

    def drop_file(rows):
        df = spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string"
        )
        df.coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = streaming.read_event_stream(
            spark, src, spark.read.parquet(src).schema
        )
        q = (
            streaming.dedup_stream(stream, ["event_id"], "ts", "1 hour")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    t = lambda h, m: dt.datetime(2026, 1, 15, h, m)
    drop_file([(1, t(10, 0), 7, "view", 1.0, "{}")])
    run_once()
    # batch 2: watermark is still 09:00 — the 12:31 duplicate of key 1 is
    # inside its state lifetime (expires 11:00) and must be dropped; the
    # 12:30 row advances the watermark to 11:30 for the next batch.
    drop_file([(2, t(12, 30), 8, "view", 1.0, "{}"),
               (1, t(12, 31), 7, "view", 1.0, "{}")])
    run_once()
    counts = {
        r.event_id: r.n
        for r in spark.read.parquet(out).groupBy("event_id").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert counts == {1: 1, 2: 1}, counts
    # batch 3: watermark 11:30 has passed key 1's 11:00 expiry — its state
    # is gone, so the new duplicate is re-emitted. dropDuplicates would
    # still hold the key and emit nothing.
    drop_file([(1, t(12, 40), 7, "view", 1.0, "{}")])
    run_once()
    counts = {
        r.event_id: r.n
        for r in spark.read.parquet(out).groupBy("event_id").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert counts == {1: 2, 2: 1}, counts


def test_streaming_semantic_dedup_matches_sequential_batches(spark, sf_dir, tmp_path):
    """availableNow stream over three embedding drops == the sequential
    batch composition (semantic_dedup on drop 0, then
    semantic_dedup_incremental per later drop against the kept-so-far
    store); a re-run over the same source adds nothing; a torn kept
    partition replays to the identical result."""
    import os

    from ecom_snowflake_duckdb_migration_spark.operators import similarity as sim
    from ecom_snowflake_duckdb_migration_spark.streaming import (
        read_event_stream,
        streaming_semantic_dedup,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = sim.make_centroids(dim=64, n_centroids=8, seed=42)
    tau = 0.35
    cuts = [(0, 70), (70, 140), (140, 10**9)]

    # sequential batch composition = the contract
    b0 = emb.filter((F.col("vec_id") >= 0) & (F.col("vec_id") < 70))
    kept = b0.join(
        sim.semantic_dedup(b0, cents, tau).select("vec_id"), "vec_id", "left_semi"
    ).localCheckpoint(eager=True)
    for lo, hi in cuts[1:]:
        b = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        new_kept = b.join(
            sim.semantic_dedup_incremental(
                b, kept.select("vec_id", "embedding"), cents, tau
            ).select("vec_id"),
            "vec_id",
            "left_semi",
        )
        kept = kept.unionByName(new_kept).localCheckpoint(eager=True)
    want = {r.vec_id for r in kept.collect()}

    import time as _time

    src = str(tmp_path / "drops")
    os.makedirs(src)
    for i, (lo, hi) in enumerate(cuts):
        tmp = f"{src}/.t{i}"
        emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)).coalesce(
            1
        ).write.parquet(tmp)
        f = [x for x in os.listdir(tmp) if x.endswith(".parquet")][0]
        os.rename(f"{tmp}/{f}", f"{src}/drop_{i}.parquet")
        _time.sleep(1.1)

    store = str(tmp_path / "store")
    args = dict(
        store_dir=store, checkpoint_dir=str(tmp_path / "ckpt"),
        centroids=cents, threshold=tau,
    )
    q = streaming_semantic_dedup(
        read_event_stream(spark, src, emb.schema, max_files_per_trigger=1), **args
    )
    q.awaitTermination(180)
    got = {r.vec_id for r in spark.read.parquet(f"{store}/kept").collect()}
    assert got == want, (len(got), len(want))

    # re-run, same checkpoint: nothing changes
    q = streaming_semantic_dedup(
        read_event_stream(spark, src, emb.schema, max_files_per_trigger=1), **args
    )
    q.awaitTermination(60)
    assert {r.vec_id for r in spark.read.parquet(f"{store}/kept").collect()} == want
    seen = spark.read.parquet(f"{store}/seen")
    assert seen.count() == emb.count()  # every vector processed exactly once


def test_streaming_semantic_dedup_torn_store_replay(spark, tmp_path):
    """Crash between the kept write and the seen write leaves torn
    batch-keyed partitions; the replayed batch must exclude its OWN
    partitions from both stores (see all of its rows as new) and
    overwrite them to the exact correct state."""
    import os

    from ecom_snowflake_duckdb_migration_spark.operators import similarity as sim
    from ecom_snowflake_duckdb_migration_spark.streaming import (
        read_event_stream,
        streaming_semantic_dedup,
    )

    cents = sim.make_centroids(dim=4, n_centroids=2, seed=42)
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    store = str(tmp_path / "store")
    # crash state: kept/batch_id=0 written (the batch's kept set {1}),
    # seen/batch_id=0 TORN (only id 1 committed)
    sim.semantic_cells(vecs.filter(F.col("vec_id") == 1), cents).write.parquet(
        f"{store}/kept/batch_id=0"
    )
    vecs.filter(F.col("vec_id") == 1).select("vec_id").write.parquet(
        f"{store}/seen/batch_id=0"
    )

    src = str(tmp_path / "drops")
    os.makedirs(src)
    tmp = f"{src}/.t0"
    vecs.coalesce(1).write.parquet(tmp)
    f = [x for x in os.listdir(tmp) if x.endswith(".parquet")][0]
    os.rename(f"{tmp}/{f}", f"{src}/drop_0.parquet")

    q = streaming_semantic_dedup(
        read_event_stream(spark, src, vecs.schema, max_files_per_trigger=1),
        store, str(tmp_path / "ckpt"), cents, threshold=0.9,
    )
    q.awaitTermination(120)
    kept = {r.vec_id for r in spark.read.parquet(f"{store}/kept").collect()}
    assert kept == {1}, kept  # NOT {2}: the torn seen row must not hide id 1
    seen = spark.read.parquet(f"{store}/seen")
    assert seen.count() == 2 and seen.select("vec_id").distinct().count() == 2


def test_read_batch_store_guards(spark, tmp_path):
    """store_io.read_batch_store: (a) missing dir and committed-batch-free
    dirs read as 'no corpus yet'; (b) a legacy flat-append store raises a
    migration error instead of an unresolved-column crash downstream; (c)
    a damaged store FAILS the batch rather than masquerading as empty
    (the round-7 ADVICE fix)."""
    from ecom_snowflake_duckdb_migration_spark.streaming.store_io import (
        LegacyStoreLayoutError,
        read_batch_store,
    )

    # (a) missing / uncommitted-only
    assert read_batch_store(spark, str(tmp_path / "nope"), 0) is None
    empty = tmp_path / "empty"
    (empty / "_temporary" / "0").mkdir(parents=True)
    assert read_batch_store(spark, str(empty), 0) is None

    # (b) legacy flat-append layout
    legacy = str(tmp_path / "legacy")
    spark.range(3).write.parquet(legacy)
    with pytest.raises(LegacyStoreLayoutError, match="flat-append"):
        read_batch_store(spark, legacy, 0)

    # happy path: committed batches, own partition excluded
    keyed = tmp_path / "keyed"
    spark.range(2).write.parquet(str(keyed / "batch_id=0"))
    spark.range(5).write.parquet(str(keyed / "batch_id=1"))
    got = read_batch_store(spark, str(keyed), 1, drop_batch_id=True)
    assert got.count() == 2 and got.columns == ["id"]

    # (c) damaged store: a committed partition holding a corrupt file
    # must raise, not return None
    bad = keyed / "batch_id=2"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"not a parquet file")
    df = read_batch_store(spark, str(keyed), 99)
    with pytest.raises(Exception):
        df.count()


def test_read_batch_store_resolves_fs_uris(spark, tmp_path):
    """Store paths resolve through the Hadoop FileSystem API, not
    driver-local os.path (round-8 ADVICE): a scheme-qualified URI of a
    POPULATED store must read its committed batches — under the old
    os.path.exists check, 'file:/...' read as missing and a populated
    durable store silently became 'no corpus yet'."""
    from ecom_snowflake_duckdb_migration_spark.streaming.store_io import (
        read_batch_store,
    )

    keyed = tmp_path / "uri_store"
    spark.range(4).write.parquet(str(keyed / "batch_id=0"))
    uri = "file:" + str(keyed)
    got = read_batch_store(spark, uri, 99, drop_batch_id=True)
    assert got is not None and got.count() == 4
    # and a missing URI still reads as 'no corpus yet', not an error
    assert read_batch_store(spark, "file:" + str(tmp_path / "absent"), 0) is None


def test_image_hashes_grid_bound(spark):
    """grid > 8 would silently truncate the 64-bit packed hash (numpy
    shifts >= 64 are undefined) — must raise instead (round-7 ADVICE)."""
    from ecom_snowflake_duckdb_migration_spark.multimodal import phash

    df = spark.createDataFrame([("m1", bytearray(b""))], "media_id STRING, payload BINARY")
    with pytest.raises(ValueError, match="grid"):
        phash.image_hashes(df, grid=9)
    with pytest.raises(ValueError, match="grid"):
        phash.image_near_pairs(df, grid=12)


def _last_state_rows(q, timeout=300) -> int:
    """Drain an availableNow query and return the final micro-batch's total
    state-store row count across stateful operators."""
    q.awaitTermination(timeout)
    prog = [p for p in (q.recentProgress or []) if p.get("stateOperators")]
    assert prog, "no stateful progress captured"
    return sum(op["numRowsTotal"] for op in prog[-1]["stateOperators"])


def _event_rows(spark, batch_i: int, n_keys: int, kind: str = "view"):
    """n_keys NEW keys per batch, event times batch_i hours apart — old
    keys fall behind the watermark so bounded state must evict them."""
    import datetime as dt

    base = dt.datetime(2026, 1, 15, 6, 0)
    rows = [
        (batch_i * 100_000 + j, base + dt.timedelta(hours=batch_i, seconds=j % 60),
         batch_i * 100_000 + j, kind, 1.0, "{}")
        for j in range(n_keys)
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )


def test_dedup_state_rows_bounded_under_growing_keys(spark, tmp_path_factory):
    """dropDuplicatesWithinWatermark state must stay at the watermark-
    implied bound (~2 batches of keys: the current batch plus the
    not-yet-advanced previous one) while cumulative distinct keys grow
    linearly — fails against any shape that pins a row per key forever."""
    root = tmp_path_factory.mktemp("dedup_bound")
    src, out, ckpt = str(root / "src"), str(root / "out"), str(root / "ckpt")
    K, n_batches = 100, 4
    state_curve = []
    for i in range(n_batches):
        _event_rows(spark, i, K).coalesce(1).write.mode("append").parquet(src)
        stream = streaming.read_event_stream(
            spark, src, spark.read.parquet(src).schema
        )
        q = (
            streaming.dedup_stream(stream, ["event_id"], "ts", "10 minutes")
            .writeStream.outputMode("append")
            .format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        state_curve.append(_last_state_rows(q))
    assert max(state_curve) <= int(2.5 * K), state_curve
    assert state_curve[-1] < n_batches * K, state_curve  # not cumulative
    assert spark.read.parquet(out).count() == n_batches * K


def test_session_window_state_rows_bounded(spark, tmp_path_factory):
    """session_window aggregation state holds only sessions the watermark
    has not yet closed — per-user sessions from hours ago must be evicted,
    not retained per key."""
    from ecom_snowflake_duckdb_migration_spark.streaming import sessionize

    root = tmp_path_factory.mktemp("sess_bound")
    src, out, ckpt = str(root / "src"), str(root / "out"), str(root / "ckpt")
    K, n_batches = 100, 4
    state_curve = []
    for i in range(n_batches):
        _event_rows(spark, i, K).coalesce(1).write.mode("append").parquet(src)
        stream = streaming.read_event_stream(
            spark, src, spark.read.parquet(src).schema
        )
        q = (
            sessionize(stream, gap="5 minutes", watermark="10 minutes")
            .writeStream.outputMode("append")
            .format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        state_curve.append(_last_state_rows(q))
    assert max(state_curve) <= int(2.5 * K), state_curve
    assert state_curve[-1] < n_batches * K, state_curve


def test_interval_join_state_rows_bounded(spark, tmp_path_factory):
    """Stream-stream interval join buffers both sides only within the
    watermark + join-window horizon: batches arriving hours apart must not
    accumulate buffered rows across batches."""
    root = tmp_path_factory.mktemp("join_bound")
    csrc, psrc = str(root / "clicks"), str(root / "purch")
    out, ckpt = str(root / "out"), str(root / "ckpt")
    K, n_batches = 100, 4
    state_curve = []
    for i in range(n_batches):
        _event_rows(spark, i, K, "click").coalesce(1).write.mode("append").parquet(csrc)
        _event_rows(spark, i, K, "purchase").coalesce(1).write.mode("append").parquet(psrc)
        schema = spark.read.parquet(csrc).schema
        clicks = streaming.read_event_stream(spark, csrc, schema)
        purchases = streaming.read_event_stream(spark, psrc, schema)
        q = (
            streaming.attribute_purchases_to_clicks(
                clicks, purchases, attribution_window="5 minutes",
                lateness="10 minutes",
            )
            .writeStream.outputMode("append")
            .format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        state_curve.append(_last_state_rows(q))
    # both sides buffer: bound is ~2 batches x 2 sides
    assert max(state_curve) <= int(2.5 * 2 * K), state_curve
    assert state_curve[-1] < n_batches * 2 * K, state_curve
    # the join itself matched every same-user click->purchase pair
    assert spark.read.parquet(out).count() == n_batches * K
