"""Incremental corpus deduplication: probe a NEW batch against a stored
LSH band index instead of re-pairing the whole corpus.

A training-data pipeline ingests batches continually (the reference's daily
S3 drops, src/pipeline/ingest_latest_synthetic_data.py); re-running
all-pairs MinHash-LSH over (corpus ∪ batch) re-signs and re-shuffles the
entire history every day. The incremental contract instead is:

- **Durable artifact**: the band table ``(doc_id, band, bucket)`` — one row
  per (doc, band), three narrow columns, |corpus| x bands rows. Persisted
  through :mod:`..sources.sketch_store` (kind ``"lsh_bands"``; merge =
  distinct union, idempotent on re-delivery).
- **Per batch**: sign the BATCH only (one scan of the new docs), equi-join
  its band rows against the stored table on (band, bucket) for cross
  candidates, self-join within the batch for new-new candidates, then
  exact-Jaccard verify candidates only. Corpus text is read back just for
  the candidate ids (a semi-join — targeted row-group reads at scale,
  never a corpus scan).
- **Append** the batch's band rows to the store (``sketch_store.merge_into``).

Correctness (the batch-equivalence oracle, pinned in tests and x75): LSH
candidacy of a pair (a, b) depends only on a's and b's own band buckets,
and Jaccard verification is pairwise — both are independent of every other
document. Hence::

    pairs(corpus ∪ batch) == pairs(corpus)                 # prior runs
                             ∪ incremental_pairs(batch, corpus)

exactly — not approximately. 100 TB posture: per-batch cost is
O(|batch| x bands) join probes against a bucketed band table plus targeted
verification reads; history is never re-signed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import char_shingle_sets, jaccard_verify_pairs, lsh_band_stack, minhash_signatures


def lsh_band_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Sign + band a document frame into the durable (id, band, bucket) index."""
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes, hash_fn)
    return lsh_band_stack(sig, id_col, num_hashes, bands, hash_fn)


def incremental_minhash_pairs(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    corpus_bands: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold_e6: int = 800_000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """All near-dup pairs TOUCHING the new batch: batch-vs-corpus (probed
    against the stored band table, corpus never re-signed) plus
    batch-vs-batch. Output contract matches ``minhash_lsh_pairs``:
    (d1, d2, jaccard_e6) with d1 < d2.

    ``corpus_docs`` is only read for candidate ids (semi-join) — pass the
    full corpus relation; the plan prunes it. Ids must be unique across
    corpus ∪ batch (the ingest layer's PK contract, sources/upsert.py).
    """
    new_bands = lsh_band_table(new_docs, text_col, id_col, k, num_hashes, bands, hash_fn)
    n = new_bands.alias("n")
    c = corpus_bands.alias("c")
    nid, cid = F.col(f"n.{id_col}"), F.col(f"c.{id_col}")
    cross = (
        # nid != cid: if a batch doc's own band rows are already in the
        # store (a replayed batch after a crash between the store merge and
        # the checkpoint commit), least/greatest would otherwise emit a
        # degenerate (A, A) candidate that verifies at jaccard 1.0.
        n.join(
            c,
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.bucket") == F.col("c.bucket"))
            & (nid != cid),
        )
        .select(F.least(nid, cid).alias("d1"), F.greatest(nid, cid).alias("d2"))
    )
    m = new_bands.alias("m")
    within = (
        n.join(
            m,
            (F.col("n.band") == F.col("m.band"))
            & (F.col("n.bucket") == F.col("m.bucket"))
            & (nid < F.col(f"m.{id_col}")),
        )
        .select(nid.alias("d1"), F.col(f"m.{id_col}").alias("d2"))
    )
    candidates = cross.unionByName(within).distinct()
    # Text read-back only for docs that actually appear in a candidate
    # pair — BOTH sides semi-join on the candidate ids. On a large daily
    # batch where few docs have near-dups, shingling the whole batch a
    # second time would dominate the verify cost for nothing.
    cand_ids = (
        candidates.select(F.col("d1").alias(id_col))
        .unionByName(candidates.select(F.col("d2").alias(id_col)))
        .distinct()
    )
    corpus_needed = corpus_docs.select(id_col, text_col).join(cand_ids, id_col, "left_semi")
    new_needed = new_docs.select(id_col, text_col).join(cand_ids, id_col, "left_semi")
    sh = char_shingle_sets(new_needed.unionByName(corpus_needed), text_col, id_col, k)
    return jaccard_verify_pairs(candidates, sh, id_col, threshold_e6)
