"""Round-10 optimization: stage-level breakdown of the most expensive
LLM-pipeline operators at sf0.1 (guide §1: measure first, isolate with
the noop sink, label jobs).

Each stage is timed with the noop sink (computes every column, discards
output) after one warm pass, min-of-3. Stages are cumulative prefixes of
the operator pipeline, so stage_k - stage_{k-1} isolates one step.

Usage: python scripts/r10_profile_ops.py [op ...]   (default: all)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ecom_snowflake_duckdb_migration_spark.operators import similarity as sim
from ecom_snowflake_duckdb_migration_spark.operators import text as tx
from ecom_snowflake_duckdb_migration_spark.queries import load
from ecom_snowflake_duckdb_migration_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn, n=3):
    fn()  # warm
    best = None
    for _ in range(n):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        fn()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    spark.sparkContext.setJobDescription(None)
    print(f"{label:55s} {best:8.3f}s", flush=True)
    return best


def main() -> int:
    only = set(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app_name="r10-profile")
    par = spark.sparkContext.defaultParallelism
    docs = load(spark, sf_dir, "documents").repartition(par).localCheckpoint()
    emb = load(spark, sf_dir, "embeddings").repartition(par).localCheckpoint()
    corpus = docs.filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")
    cents = sim.make_centroids(dim=64, n_centroids=8, seed=42)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )

    def want(name):
        return not only or name in only

    if want("minhash_lsh_pairs"):
        print("== minhash_lsh_pairs (13.7s in PERF_LLM_OPS) ==")
        timed(spark, "mh: signatures only", lambda: noop(tx.minhash_signatures(docs)))
        timed(
            spark,
            "mh: band_candidates",
            lambda: noop(tx.band_candidates(tx.minhash_signatures(docs))),
        )
        cand = tx.band_candidates(tx.minhash_signatures(docs)).localCheckpoint()
        n_cand = cand.count()
        print(f"   candidates: {n_cand}")
        sh = tx.char_shingle_sets(docs, "text", "doc_id", 3)
        timed(spark, "mh: shingle_sets only", lambda: noop(sh))
        timed(
            spark,
            "mh: verify(checkpointed cands)",
            lambda: noop(tx.jaccard_verify_pairs(cand, sh, "doc_id", 800_000)),
        )
        timed(
            spark,
            "mh: full op",
            lambda: noop(tx.minhash_lsh_pairs(docs, threshold_e6=800_000)),
        )

    if want("semantic_dedup"):
        print("== semantic_dedup (5.6s) ==")
        timed(
            spark,
            "sd: semantic_cells only",
            lambda: noop(sim.semantic_cells(emb, cents)),
        )
        celled = sim.semantic_cells(emb, cents).localCheckpoint()
        timed(
            spark,
            "sd: celled pairs+antijoin (expr)",
            lambda: noop(
                sim.semantic_dedup_celled(celled, 0.35, pair_method="expr", dim=64)
            ),
        )
        timed(
            spark,
            "sd: celled pairs+antijoin (pandas)",
            lambda: noop(
                sim.semantic_dedup_celled(celled, 0.35, pair_method="pandas", dim=64)
            ),
        )
        timed(
            spark,
            "sd: full op (auto=expr)",
            lambda: noop(sim.semantic_dedup(emb, cents, threshold=0.35)),
        )

    if want("quality_classifier"):
        print("== quality_classifier (5.0s) ==")
        t0 = time.perf_counter()
        w = tx.quality_classifier_train(corpus, bench, n_buckets=512, n_iters=8)
        print(f"   train(8 iters): {time.perf_counter() - t0:.3f}s", flush=True)
        timed(
            spark,
            "qc: score only (trained w)",
            lambda: noop(tx.quality_classifier_score(corpus, w)),
        )

    if want("knn_join"):
        print("== knn_join (4.3s) ==")
        timed(
            spark,
            "knn: full op",
            lambda: noop(sim.knn_join(emb, queries, cents, k=5, nprobe=4)),
        )

    if want("ivfadc_knn_join"):
        print("== ivfadc_knn_join (3.8s) ==")
        books = sim.make_pq_codebooks(64, 4, 4, seed=42)
        timed(
            spark,
            "ivfadc: full op",
            lambda: noop(
                sim.ivfadc_knn_join(emb, queries, cents, books, k=5, nprobe=4)
            ),
        )

    if want("density_prune"):
        print("== density_prune (2.8s) ==")
        timed(
            spark,
            "dp: full op",
            lambda: noop(sim.density_prune(emb, cents, drop_frac_e6=250_000)),
        )

    if want("curate"):
        print("== curate (7.0s) ==")
        timed(spark, "cu: full cascade", lambda: noop(tx.curate(corpus, bench)))

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
