"""Streaming semantic (embedding-space) deduplication: each micro-batch
of vectors is vetoed against the durable kept-set cell store, the
survivors run the within-batch SemDeDup sweep, and the batch's kept rows
fold into the store — ``operators.similarity.semantic_dedup_incremental``
as a continuous ingest, the embedding twin of
:mod:`.corpus_dedup` (weekly-drop pattern -> stream).

Two durable artifacts under ``store_dir``, both batch-keyed
(``.../batch_id=N`` written with overwrite — the replay-atomic scheme
this package standardized after the round-6 torn-append finding):

- ``kept``: :func:`..operators.similarity.semantic_cells` rows of every
  kept vector ``(id, vec, nrm, cell, csim)`` — read back with
  ``corpus_celled=True`` so the recurring probe never recomputes corpus
  norms or cell assignment;
- ``seen``: ids of every PROCESSED vector (kept or removed) — the
  redelivery filter; a removed id redelivered later must not reprocess
  (it would otherwise survive, since removed rows are deliberately not
  stored — the frozen-corpus contract).

Replay safety: a replayed batch excludes its OWN partition from both
stores, so it sees all of its rows as new (full recompute, identical
overwrite) rather than a torn subset. Contract pinned by
tests/test_streaming.py: availableNow over K drops == the sequential
batch composition semantic_dedup(drop0) then
semantic_dedup_incremental(drop_i, kept_so_far) for i >= 1.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators.similarity import (
    semantic_cells,
    semantic_dedup,
    semantic_dedup_incremental,
)
from .store_io import read_batch_store


def streaming_semantic_dedup(
    vec_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    trigger: dict | None = None,
):
    """Wire a vector stream into the incremental-SemDeDup loop; returns
    the started StreamingQuery. The kept-set store at
    ``store_dir/kept`` is the output: after the stream drains, it holds
    the deduplicated corpus' cell rows."""
    kept_path = os.path.join(store_dir, "kept")
    seen_path = os.path.join(store_dir, "seen")

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.select(id_col, vec_col)
        seen = read_batch_store(spark, seen_path, batch_id, drop_batch_id=True)
        if seen is not None:
            batch = batch.join(seen.select(id_col), id_col, "left_anti")
        batch.persist()
        try:
            if batch.isEmpty():
                return
            corpus = read_batch_store(
                spark, kept_path, batch_id, drop_batch_id=True
            )
            if corpus is not None:
                kept_ids = semantic_dedup_incremental(
                    batch, corpus, centroids, threshold,
                    vec_col=vec_col, id_col=id_col, corpus_celled=True,
                ).select(id_col)
            else:
                kept_ids = semantic_dedup(
                    batch, centroids, threshold, vec_col, id_col
                ).select(id_col)
            kept_cells = semantic_cells(batch, centroids, vec_col, id_col).join(
                kept_ids, id_col, "left_semi"
            )
            # kept first, seen last: a crash between them replays the batch
            # (its seen partition is absent/torn and excluded), which
            # overwrites both partitions identically.
            kept_cells.write.mode("overwrite").parquet(
                os.path.join(kept_path, f"batch_id={batch_id}")
            )
            batch.select(id_col).write.mode("overwrite").parquet(
                os.path.join(seen_path, f"batch_id={batch_id}")
            )
        finally:
            batch.unpersist()

    return (
        vec_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
