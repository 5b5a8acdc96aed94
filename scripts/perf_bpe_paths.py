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

    # one training pass at the largest horizon; prefixes give the sweep
    max_merges = 256
    t0 = time.perf_counter()
    all_merges = [
        (r.a, r.b) for r in tx.bpe_train(docs, n_merges=max_merges).collect()
    ]
    train_sec = round(time.perf_counter() - t0, 2)
    print(f"trained {len(all_merges)} merges in {train_sec}s", flush=True)

    results = {"sf_dir": sf_dir, "n_reps": n_reps, "parallelism": par,
               "train_merges": len(all_merges), "train_sec": train_sec,
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
