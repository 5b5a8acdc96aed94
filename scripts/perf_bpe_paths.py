"""Fold-path vs Arrow-path BPE tokenizer throughput at sf0.1.

``bpe_apply`` chains one Catalyst fold per merge (codegen grows linearly
in the merge count); ``bpe_apply_pandas`` ships the merge list in the task
closure and tokenizes per Arrow batch. The fold docstring claims the
expression path holds "up to a few hundred merges" — this measures where
the crossover actually sits so the claim is a number, not a guess.

Usage: python scripts/perf_bpe_paths.py [sf_dir] [n_reps]
Writes PERF_BPE_PATHS.json (merge-count sweep, best/median secs per path)
and asserts both paths agree bit-for-bit at every sweep point.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from ecom_snowflake_duckdb_migration_spark.operators import text as tx
from ecom_snowflake_duckdb_migration_spark.queries import load
from ecom_snowflake_duckdb_migration_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark()
    par = spark.sparkContext.defaultParallelism
    docs = load(spark, sf_dir, "documents").repartition(par).localCheckpoint(eager=True)

    # one training pass at the largest horizon; prefixes give the sweep.
    # The driver-local trainer (the vocabulary-scale path) trains the
    # same sequence — measure both and record merges/sec.
    max_merges = 256
    t0 = time.perf_counter()
    all_merges = [
        (r.a, r.b) for r in tx.bpe_train(docs, n_merges=max_merges).collect()
    ]
    train_sec = round(time.perf_counter() - t0, 2)
    print(f"distributed: trained {len(all_merges)} merges in {train_sec}s", flush=True)

    t0 = time.perf_counter()
    local_rows = tx.bpe_train_local(docs, n_merges=max_merges).collect()
    local_sec = round(time.perf_counter() - t0, 2)
    local_merges = [(r.a, r.b) for r in local_rows]
    assert local_merges == all_merges, "trainer paths diverged"
    print(f"local: trained {len(local_merges)} merges in {local_sec}s", flush=True)

    # vocabulary-scale horizon: the synthetic documents corpus has a
    # 31-word vocabulary (saturates at 89 merges), so the >=1k-merge
    # measurement trains on customer c_name — 15k distinct words (one
    # per customer), a realistically rich symbol space.
    cust = load(spark, sf_dir, "customer")
    rich = cust.selectExpr("c_name AS text")
    t0 = time.perf_counter()
    deep = tx.bpe_train_local(rich, n_merges=4096, min_pair_count=1).collect()
    deep_sec = round(time.perf_counter() - t0, 2)
    print(f"local deep (customer c_name vocab): {len(deep)} merges in "
          f"{deep_sec}s ({round(len(deep) / max(deep_sec, 1e-9), 1)} merges/sec)",
          flush=True)

    results = {"sf_dir": sf_dir, "n_reps": n_reps, "parallelism": par,
               "train_merges": len(all_merges), "train_sec": train_sec,
               "train_local_sec": local_sec,
               "train_local_equals_distributed": local_merges == all_merges,
               "train_local_deep": {
                   "corpus": "customer c_name, 15k distinct words (documents "
                             "has a 31-word vocabulary; saturates at 89 merges)",
                   "n_merges": len(deep), "sec": deep_sec,
                   "merges_per_sec": round(len(deep) / max(deep_sec, 1e-9), 1)},
               "sweep": {}}
    ks = [k for k in (8, 32, 128, 256) if k <= len(all_merges)]
    if len(all_merges) not in ks:
        ks.append(len(all_merges))  # the corpus-saturated full merge list
    for k in ks:
        merges = all_merges[:k]
        row = {}
        for label, fn in (
            ("fold", lambda m=merges: tx.bpe_apply(docs, m)),
            ("arrow", lambda m=merges: tx.bpe_apply_pandas(docs, m)),
        ):
            try:
                fn().count()  # warm
                times = []
                for _ in range(n_reps):
                    t0 = time.perf_counter()
                    fn().count()
                    times.append(time.perf_counter() - t0)
                row[label] = {"best_sec": round(min(times), 4),
                              "median_sec": round(sorted(times)[len(times) // 2], 4)}
            except Exception as exc:  # the fold path MAY die past codegen limits
                row[label] = {"error": str(exc).splitlines()[0][:160]}
        # bit-equality of the two paths at this sweep point
        if all("error" not in row[p] for p in ("fold", "arrow")):
            a = tx.bpe_apply(docs, merges).orderBy("doc_id").collect()
            b = tx.bpe_apply_pandas(docs, merges).orderBy("doc_id").collect()
            row["paths_equal"] = a == b
        else:
            row["paths_equal"] = None
        results["sweep"][str(k)] = row
        print(f"k={k}: {row}", flush=True)

    with open("PERF_BPE_PATHS.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote PERF_BPE_PATHS.json")
    return 0 if all(r["paths_equal"] is not False
                    for r in results["sweep"].values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
