"""Round-10 optimization: dump .explain('formatted') for the bench
headliners (and any named extra catalog entries) to plans/r10/.

Usage: python scripts/r10_plans.py <suffix> [entry ...]
  suffix: 'before' or 'after' (file name becomes <query>_<suffix>.txt)
  entry:  extra catalog entry names beyond the bench HEADLINE list;
          pass only names you are touching this round.

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


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    extras = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE  # noqa: E402  (repo root on sys.path)
    from ecom_snowflake_duckdb_migration_spark.queries import all_queries
    from ecom_snowflake_duckdb_migration_spark.session import get_spark

    specs = all_queries()
    names = list(HEADLINE) + [e for e in extras if e in specs]
    unknown = [e for e in extras if e not in specs]
    if unknown:
        print(f"WARNING: unknown entries skipped: {unknown}")

    # bench profile at sf0.1 (see bench.py): AQE off, sp=4, 16MB splits,
    # warehouse pinned to the repo so the bucketed fact cache resolves
    spark = get_spark(
        app_name=f"r10-plans-{suffix}",
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
        "SPARK_GRAFT_PLANS_OUT", os.path.join(REPO, "plans", "r10")
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} (bench profile) — {suffix}\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
