"""Parquet small-files compaction — the 100 TB maintenance operator.

A day of streaming micro-batches (streaming/ingest.py sinks, the
reference's daily S3 drops) or a wide shuffle write leaves thousands of
KB-scale files; every later scan then pays per-file open + footer reads
and the driver pays the listing. ``compact_parquet`` rewrites a directory
to ``ceil(total_bytes / target_file_bytes)`` files — optionally
range-clustered on sort keys so row-group min/max pruning works after the
rewrite — using the sketch_store crash-safe swap (write to a ``.tmp``
sibling, two renames, recovery preamble; sources/sketch_store.py:84).

Filesystem access goes through the session's Hadoop FileSystem API, so
the same code serves file://, hdfs:// and s3a:// (on object stores a
rename is a server-side copy — there, prefer compacting into a NEW prefix
and flipping the catalog pointer that write_table registration provides;
the swap here is the single-filesystem path).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def parquet_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(data file count, total data bytes) under ``path``, recursively —
    counts ``*.parquet`` only (skips _SUCCESS, sidecars, checksums)."""
    fs, hpath, _ = _fs(spark, path)
    it = fs.listFiles(hpath, True)
    n = total = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            n += 1
            total += st.getLen()
    return n, total


def _scratch_paths(jvm, path: str):
    """HIDDEN scratch siblings for the swap: ``parent/.{name}.tmp`` and
    ``parent/.{name}.old``. The leading dot matters when the compacted
    directory is a LEAF PARTITION (``store/cell=3``): Spark's partition
    discovery skips dot/underscore-prefixed paths, so a concurrent
    reader of the store ROOT never lists the scratch dirs as bogus
    partition values (``cell=3.old`` would otherwise parse as a string
    partition mid-swap) — probes keep reading committed files throughout
    a compaction."""
    base = path.rstrip("/")
    parent, _, name = base.rpartition("/")
    P = jvm.org.apache.hadoop.fs.Path
    prefix = f"{parent}/" if parent else ""
    return P(f"{prefix}.{name}.old"), P(f"{prefix}.{name}.tmp")


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(total_bytes / target_file_bytes)`` files; returns
    ``{files_before, files_after, bytes_before, bytes_after, rows}``.

    ``sort_by``: range-partition + sort within partitions on these
    columns, so the compacted files carry disjoint sorted key ranges and
    footer min/max stats prune whole files for key predicates (the
    cluster_by_zorder single-key analogue; use Z-order for 2-D).

    Output sizing uses the INPUT's compressed bytes — same codec in and
    out, so it lands near the target without a second pass. The swap is
    crash-safe, not atomic: a reader can hit ENOENT for the instant
    between the two renames and should retry; a crash leaves a complete
    ``.old`` or ``.tmp``, never a torn directory, and the recovery
    preamble restores ``.old`` on the next call.
    """
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    fs, hpath, jvm = _fs(spark, path)
    old, tmp = _scratch_paths(jvm, path)

    # Recovery: a crash between the swap renames leaves the only complete
    # directory at '.old' and nothing at path — restore before touching
    # anything (same contract as sketch_store.merge_into).
    if not fs.exists(hpath) and fs.exists(old):
        if not fs.rename(old, hpath):
            raise OSError(f"recovery rename {old} -> {path} failed")

    # Hive-partitioned layouts are refused, not silently flattened: the
    # rewrite would demote partition directories to plain columns in a
    # flat directory, destroying pruning and breaking any reader that
    # addresses path/dt=.../ directly. Compact each leaf partition
    # directory instead. Only directory components strictly BELOW the
    # root count — the root itself being a dt=... leaf is exactly the
    # supported per-partition call, and must not trip its own guard.
    root = str(fs.makeQualified(hpath).toUri().getPath()).rstrip("/")
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        rel = str(it.next().getPath().toUri().getPath())
        parent = rel.rsplit("/", 1)[0]
        below = parent[len(root):].strip("/") if parent.startswith(root) else parent
        for comp in below.split("/"):
            if "=" in comp:
                raise ValueError(
                    f"{path!r} is hive-partitioned ({comp}); "
                    "compact each leaf partition directory separately"
                )

    files_before, bytes_before = parquet_file_stats(spark, path)
    n_out = max(1, math.ceil(bytes_before / target_file_bytes))
    df: DataFrame = spark.read.parquet(path)
    if sort_by:
        shaped = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        shaped = df.repartition(n_out)
    if fs.exists(tmp):
        fs.delete(tmp, True)
    shaped.write.mode("overwrite").parquet(str(tmp))
    rows = spark.read.parquet(str(tmp)).count()

    # Hadoop rename() reports failure by RETURNING FALSE, not raising —
    # every step is checked so a failed (not crashed) rename aborts
    # before the delete can remove the only surviving copy. Rename onto
    # an existing directory would also nest tmp INSIDE path; the checks
    # make that impossible to reach.
    if fs.exists(old):
        fs.delete(old, True)
    if not fs.rename(hpath, old):
        raise OSError(f"swap aborted: rename {path} -> {old} failed; data intact")
    if not fs.rename(tmp, hpath):
        # put the original back before surfacing the failure
        fs.rename(old, hpath)
        raise OSError(
            f"swap aborted: rename {tmp} -> {path} failed; original restored"
        )
    fs.delete(old, True)
    files_after, bytes_after = parquet_file_stats(spark, path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes_before": bytes_before,
        "bytes_after": bytes_after,
        "rows": rows,
    }


def compact_cell_store(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
    sort_by: list[str] | None = None,
) -> dict:
    """Compact every LEAF PARTITION directory (``col=value``) of a
    partitioned store — the maintenance pass for append-grown ANN
    indexes: ``append_ivfadc_store`` / ``append`` on ``write_ivf_store``
    layouts land one file per batch per cell, so weekly drops x cells =
    small-file creep and every probe pays per-file opens (the
    write-clustering note in similarity.write_ivf_store measured 2.7 s
    of open overhead alone on a slivered store).

    Each leaf compacts independently through :func:`compact_parquet`'s
    crash-safe two-rename swap; the scratch directories are HIDDEN
    siblings (``.cell=3.tmp`` / ``.cell=3.old``) that partition
    discovery skips, so CONCURRENT PROBES of the store root keep reading
    committed files mid-compaction — a probe never sees a half-written
    leaf or a bogus string partition value. Leaves already at fewer than
    ``min_files`` data files are skipped (no rewrite churn on quiet
    cells). A crash mid-pass leaves every untouched leaf intact and the
    in-flight leaf recoverable by the next call (the per-leaf recovery
    preamble).

    Returns ``{leaves, compacted, skipped, files_before, files_after,
    rows}`` summed over compacted leaves.
    """
    fs, hpath, jvm = _fs(spark, path)
    if not fs.exists(hpath):
        raise FileNotFoundError(path)
    leaves = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isDirectory() and "=" in name and not name.startswith((".", "_")):
            leaves.append(str(st.getPath().toUri().getPath()))
    out = {
        "leaves": len(leaves), "compacted": 0, "skipped": 0,
        "files_before": 0, "files_after": 0, "rows": 0,
    }
    for leaf in sorted(leaves):
        n_files, _ = parquet_file_stats(spark, leaf)
        if n_files < min_files:
            out["skipped"] += 1
            continue
        stats = compact_parquet(
            spark, leaf, target_file_bytes=target_file_bytes, sort_by=sort_by
        )
        out["compacted"] += 1
        out["files_before"] += stats["files_before"]
        out["files_after"] += stats["files_after"]
        out["rows"] += stats["rows"]
    return out
