"""Round-10 sf64 spot-run of the five most expensive LLM operators.

The full catalog sweeps only at sf0.01 (the driver gate); BENCH_SCALING
carries the ten OLAP headliners through sf64 — this script extends the
scale evidence to the LLM-ops side: the five entries with the largest
sf0.1 wall time in PERF_LLM_OPS (minhash_lsh_pairs,
incremental_semantic_dedup, curate, minhash_estimate_pairs,
semantic_dedup) run once at sf64 geometry (~1.28M documents / 128k
vectors), each with production method dispatch and production cell
sizing (n_centroids ~ 0.1% N = 1280 — far past the numpy dispatch
point; the round-10 semantic_cells + BLAS pair kernels exist exactly
because the expr pair fold measured hours at this geometry).

Results merge into BENCH_SCALING.json under "round10_sf64_llm_ops".

Usage: python scripts/perf_sf64_ops.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from ecom_snowflake_duckdb_migration_spark.operators import similarity as sim
from ecom_snowflake_duckdb_migration_spark.operators import text as tx
from ecom_snowflake_duckdb_migration_spark.queries import load
from ecom_snowflake_duckdb_migration_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf64"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SCALING.json"
    # same harness raise as perf_crossover's sf64 rows: AQE-materialized
    # broadcast sides at this scale exceed the 1g default result cap
    spark = get_spark(
        app_name="sf64-llm-ops",
        extra_conf={"spark.driver.maxResultSize": "8g"},
    )
    par = spark.sparkContext.defaultParallelism
    docs = load(spark, sf_dir, "documents").repartition(par).localCheckpoint(
        eager=True
    )
    emb = load(spark, sf_dir, "embeddings").repartition(par).localCheckpoint(
        eager=True
    )
    n_docs, n_vecs = docs.count(), emb.count()
    print(f"sf64: {n_docs} docs, {n_vecs} vectors", flush=True)
    bench = docs.filter(F.col("source") == "src0")
    # production cell sizing: ~0.1% of N -> 1280 cells; auto-dispatch runs
    # the numpy assigner + BLAS pair kernels (expr is the oracle form)
    cents = sim.make_centroids(dim=64, n_centroids=1280, seed=42)

    # frozen-corpus store for the incremental probe (one-time cost,
    # reported separately like PERF_LLM_OPS does)
    corpus_v = emb.filter(F.col("vec_id") % 5 != 0)
    batch_v = emb.filter(F.col("vec_id") % 5 == 0)
    t0 = time.perf_counter()
    kept = sim.semantic_dedup(corpus_v, cents, threshold=0.35)
    store = (
        sim.semantic_cells(corpus_v, cents)
        .join(kept.select("vec_id"), "vec_id", "left_semi")
        .localCheckpoint(eager=True)
    )
    store_build_sec = round(time.perf_counter() - t0, 2)
    print(f"store build {store_build_sec}s", flush=True)

    ops = {
        "minhash_lsh_pairs": lambda: tx.minhash_lsh_pairs(
            docs, threshold_e6=800_000
        ),
        "incremental_semantic_dedup": lambda: sim.semantic_dedup_incremental(
            batch_v, store, cents, threshold=0.35, corpus_celled=True
        ),
        "curate": lambda: tx.curate(docs, bench),
        "minhash_estimate_pairs": lambda: tx.minhash_estimate_pairs(
            docs, threshold_e6=800_000
        ),
        "semantic_dedup_1280cells": lambda: sim.semantic_dedup(
            emb, cents, threshold=0.35
        ),
    }
    rows = {}
    for name, fn in ops.items():
        t0 = time.perf_counter()
        n = fn().count()
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn().count()
        second = time.perf_counter() - t0
        rows[name] = {
            "rows": n,
            "first_sec": round(first, 2),
            "repeat_sec": round(second, 2),
        }
        if name == "incremental_semantic_dedup":
            rows[name]["store_build_sec"] = store_build_sec
        print(f"{name}: {rows[name]}", flush=True)

    with open(out_path) as f:
        out = json.load(f)
    out["round10_sf64_llm_ops"] = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_vectors": n_vecs,
        "n_cells": 1280,
        "note": "five most expensive PERF_LLM_OPS entries at sf64, "
        "production dispatch (numpy cell assigner past 16 cells — the "
        "round-10 semantic_cells kernel) and production cell sizing",
        "entries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"merged round10_sf64_llm_ops into {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
