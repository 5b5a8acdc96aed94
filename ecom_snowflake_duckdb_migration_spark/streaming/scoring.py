"""Streaming document scoring against static models.

The ingestion-time half of the curation pipeline: documents arrive as
micro-batches (envelope drops, S3 landing files) and are scored/filtered
before they ever land in the corpus — the same operators the batch path
uses (``operators.text``), applied per micro-batch via ``foreachBatch``.

Why ``foreachBatch`` and not a streaming aggregation: per-document scores
(LM likelihood, quality metrics, language ID) depend only on the document
row plus a STATIC broadcast model — the per-doc trigram aggregation is
batch-local by construction, so there is no cross-batch state, no
watermark, and the union of micro-batch outputs is exactly the one-shot
batch result (pinned by tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators import text as tx


def streaming_lm_score(
    stream: DataFrame,
    model: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> StreamingQuery:
    """Score each arriving document's trigram likelihood under the static
    ``lm_trigram_model`` output and write ``(id_col, n_trigrams, nll_e6)``
    rows under ``out_path``. Replay-safe: each micro-batch overwrites its
    OWN ``batch_id=N`` partition (the directory name supplies the column
    via partition discovery, same scheme as ``corpus_dedup``), so a batch
    re-delivered after a crash rewrites identical rows instead of
    appending duplicates."""
    import os

    def _score(batch: DataFrame, batch_id: int) -> None:
        tx.lm_score(batch, model, text_col=text_col, id_col=id_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_path, f"batch_id={batch_id}"))

    return (
        stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
