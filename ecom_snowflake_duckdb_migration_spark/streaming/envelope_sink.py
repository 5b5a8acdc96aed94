"""Streaming envelope sink: ``foreachBatch`` into the envelope-JSON batch
writer, one batch-keyed subdirectory per micro-batch — the write side of
the reference's daily S3 drop
(src/pipeline/generate_latest_synthetic_data.py:390-433) as a structured
stream, closing the drop-directory round-trip (EnvelopeStreamReader is
the read side).

Exactly-once: each micro-batch writes ``out_dir/batch_id=N`` in OVERWRITE
mode, so a batch replayed after a crash between the write and the
checkpoint commit atomically replaces its own generation instead of
appending duplicates (the corpus_dedup/pairs partition-overwrite scheme;
the envelope writer's staged .tmp commit renames the new generation in
before deleting the old, so readers never observe an empty directory).
``read_envelope_json`` / the ``ecom_envelope`` batch reader list the tree
recursively, so the batch-keyed layout reads exactly like a flat drop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..sources import envelope_datasource as eds


def write_envelope_stream(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    table: str = "data",
    generated_at: str | None = None,
    trigger: dict | None = None,
):
    """Start the stream; returns the StreamingQuery.

    ``generated_at`` pins the envelope metadata timestamp (deterministic
    tests / reproducible drops — the F10 injectable-clock contract);
    omitted, each batch stamps wall-clock UTC."""

    def process(batch: DataFrame, batch_id: int) -> None:
        eds.register(batch.sparkSession)  # idempotent per session
        w = (
            batch.write.format("ecom_envelope")
            .mode("overwrite")
            .option("path", os.path.join(out_dir, f"batch_id={batch_id}"))
            .option("table", table)
        )
        if generated_at is not None:
            w = w.option("generated_at", generated_at)
        w.save()

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
