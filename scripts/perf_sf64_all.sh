#!/bin/sh
# Run each sf64 LLM op in its own process so one op's shuffle footprint
# never squeezes the next JVM, clearing stale tmpfs shuffle dirs between
# runs (a killed JVM leaves /dev/shm/spark-local behind and the OOM
# killer takes the next driver first).
set -e
cd /root/repo
for op in minhash_index_build exact_then_near_pairs curate \
          semantic_dedup_1280cells incremental_semantic_dedup; do
  rm -rf /dev/shm/spark-local
  echo "=== $op ==="
  python scripts/perf_sf64_ops.py /root/repo/benchdata/sf64 BENCH_SCALING.json "$op"
done
rm -rf /dev/shm/spark-local
echo "all sf64 ops done"
