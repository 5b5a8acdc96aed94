"""Round-11 optimization: dump .explain('formatted') for the bench
headliners (and any named extra catalog entries) to plans/r11/.

Usage: python scripts/r11_plans.py <suffix> [entry ...]
  suffix: 'before' or 'after' (file name becomes <query>_<suffix>.txt)
  entry:  extra catalog entry names beyond the bench HEADLINE list;
          pass only names you are touching this round. The pseudo-entry
          name ``corpus_run`` dumps the pipeline runner's split-write
          input plan (the durable-barrier evidence: the pack/report
          stages must read the ``_assigned`` parquet, not re-derive the
          curate cascade).

Plans are captured under the BENCH session profile (same conf bench.py
uses at the target sf) so the committed plan matches what the timed run
executes — including the bucketed-fact layout when enabled.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _dump(df, out_dir: str, name: str, suffix: str, sf_dir: str) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(f"# {name} @ {sf_dir} (bench profile) — {suffix}\n")
        f.write(buf.getvalue())
    print(f"wrote {path}")


def _corpus_run_frames(spark, sf_dir: str):
    """The split-write input frame + after-report frame of corpus_run,
    built exactly as corpus_pipeline.corpus_run builds them (durable
    ``_assigned`` parquet barrier included), without writing shards."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ecom_snowflake_duckdb_migration_spark.operators import sampling as sp
    from ecom_snowflake_duckdb_migration_spark.operators import text as tx
    from ecom_snowflake_duckdb_migration_spark.corpus_pipeline import (
        DEFAULT_SPLITS_E6,
    )
    from ecom_snowflake_duckdb_migration_spark.queries import load

    docs = load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")
    kept = tx.curate(corpus, bench)
    survivors = corpus.join(kept.select("doc_id"), "doc_id", "left_semi")
    tmp = tempfile.mkdtemp(prefix="r11_corpus_plan_")
    assigned_path = os.path.join(tmp, "_assigned")
    sp.shuffle_split(
        survivors, dict(DEFAULT_SPLITS_E6), id_col="doc_id", seed=42
    ).write.mode("overwrite").parquet(assigned_path)
    assigned = spark.read.parquet(assigned_path)
    chunked = tx.chunk_documents(assigned, chunk_size=500, overlap=100).join(
        assigned.select("doc_id", "split", "shuffle_key"), "doc_id"
    )
    part = tx.pack_sequences(
        chunked.filter(F.col("split") == "train").drop("split"),
        2048,
        token_col="chunk_tokens",
        order_cols=("shuffle_key", "chunk_id"),
    )
    ranged = part.repartitionByRange("pack_id", "pack_offset").sortWithinPartitions(
        "pack_id", "pack_offset"
    )
    report_after = tx.corpus_report(assigned, "text", "doc_id").orderBy("source")
    return ranged, report_after, tmp, shutil


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    extras = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE  # noqa: E402  (repo root on sys.path)
    from ecom_snowflake_duckdb_migration_spark.queries import all_queries
    from ecom_snowflake_duckdb_migration_spark.session import get_spark

    specs = all_queries()
    want_corpus = "corpus_run" in extras
    extras = [e for e in extras if e != "corpus_run"]
    names = list(HEADLINE) + [e for e in extras if e in specs]
    unknown = [e for e in extras if e not in specs]
    if unknown:
        print(f"WARNING: unknown entries skipped: {unknown}")

    # bench profile at sf0.1 (see bench.py): AQE off, sp=4, 16MB splits,
    # warehouse pinned to the repo so the bucketed fact cache resolves
    spark = get_spark(
        app_name=f"r11-plans-{suffix}",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.warehouse.dir": os.path.join(REPO, "spark-warehouse"),
            "spark.sql.files.maxPartitionBytes": "16777216",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    from ecom_snowflake_duckdb_migration_spark.sources.bucketed import (
        ensure_bucketed_facts,
    )

    ensure_bucketed_facts(spark, sf_dir, buckets=16)

    out_dir = os.environ.get(
        "SPARK_GRAFT_PLANS_OUT", os.path.join(REPO, "plans", "r11")
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        _dump(specs[name].fn(spark, sf_dir), out_dir, name, suffix, sf_dir)
    if want_corpus:
        ranged, report_after, tmp, shutil = _corpus_run_frames(spark, sf_dir)
        _dump(ranged, out_dir, "corpus_run_split_write", suffix, sf_dir)
        _dump(report_after, out_dir, "corpus_run_report_after", suffix, sf_dir)
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
