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


# ---------------------------------------------------------------------------
# Batch-keyed store consolidation
# ---------------------------------------------------------------------------

CONSOLIDATED_MARKER = "_consolidated_upto"


def read_consolidated_floor(spark: SparkSession, path: str) -> int | None:
    """The store's consolidation floor: batches below this id were merged
    into the ``batch_id=<floor>`` partition and their directories are
    garbage (deleted, or pending deletion after a crash). ``None`` when
    the store has never been consolidated. Readers must drop
    ``batch_id < floor`` rows — streaming/store_io.read_batch_store does."""
    fs, hpath, jvm = _fs(spark, path)
    marker = jvm.org.apache.hadoop.fs.Path(
        f"{str(hpath).rstrip('/')}/{CONSOLIDATED_MARKER}"
    )
    if not fs.exists(marker):
        return None
    stream = fs.open(marker)
    try:
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return int(text.strip())


def _write_consolidated_marker(fs, jvm, path: str, upto: int) -> None:
    marker = jvm.org.apache.hadoop.fs.Path(
        f"{path.rstrip('/')}/{CONSOLIDATED_MARKER}"
    )
    out = fs.create(marker, True)
    try:
        out.writeBytes(f"{upto}\n")
    finally:
        out.close()


def consolidate_batch_store(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_batches: int = 2,
) -> dict:
    """Merge every committed ``batch_id=N`` partition of a batch-keyed
    durable store (streaming/corpus_dedup, streaming/semantic_dedup docs
    and band stores) into the HIGHEST committed id's directory — the
    across-batch twin of :func:`compact_cell_store`'s per-leaf pass. A
    long-running stream lands one directory per micro-batch; after ~10^3
    batches every probe pays partition listing + per-file opens on a
    sliver per batch, and this pass folds them into
    ``ceil(bytes / target_file_bytes)`` files under one partition.

    Replay safety: the streaming engine only ever replays the LAST
    (uncommitted) batch, whose id exceeds every committed id, so merging
    committed batches into the max committed id K can never collide with
    a replay overwrite, and ``read_batch_store``'s current-batch
    exclusion (!= N with N > K) never excludes consolidated rows.

    Crash safety (crash-safe, not atomic — the module's standard
    contract): the merged data is staged in a hidden ``.batch_id=K.tmp``
    sibling, swapped in with the two checked renames, then a root-level
    ``_consolidated_upto`` marker (= K) is written BEFORE the stale
    ``batch_id<K`` directories are deleted. A crash between the swap and
    the marker leaves duplicate rows visible for that window only; a
    crash between the marker and the deletions leaves stale directories
    that every reader already ignores (``read_batch_store`` filters
    ``batch_id < floor``) and the next call garbage-collects. The
    recovery preamble restores a ``.old`` orphan exactly like
    :func:`compact_parquet`. The merge itself reads above the previous
    floor, so stale pre-floor directories are never double-counted.

    Returns ``{batches_before, batches_after, files_before, files_after,
    rows, upto}``; a store with fewer than ``min_batches`` committed
    batches only runs recovery + garbage collection.
    """
    from pyspark.sql import functions as F

    fs, hpath, jvm = _fs(spark, path)
    if not fs.exists(hpath):
        raise FileNotFoundError(path)
    root = str(hpath).rstrip("/")
    P = jvm.org.apache.hadoop.fs.Path

    # recovery preamble: a crash between the two swap renames leaves the
    # only complete copy of the target partition at '.batch_id=K.old'
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if name.startswith(".batch_id=") and name.endswith(".old"):
            visible = P(f"{root}/{name[1:-len('.old')]}")
            if fs.exists(visible):
                fs.delete(st.getPath(), True)  # crash after swap: scrap .old
            elif not fs.rename(st.getPath(), visible):
                raise OSError(f"recovery rename {name} failed")

    floor = read_consolidated_floor(spark, path)
    ids = sorted(
        int(st.getPath().getName().split("=", 1)[1])
        for st in fs.listStatus(hpath)
        if st.isDirectory()
        and st.getPath().getName().startswith("batch_id=")
    )
    live = [i for i in ids if floor is None or i >= floor]
    stale = [i for i in ids if floor is not None and i < floor]
    out = {
        "batches_before": len(live), "batches_after": len(live),
        "files_before": 0, "files_after": 0, "rows": 0,
        "upto": floor,
    }
    if len(live) >= min_batches:
        upto = max(live)
        files_before = sum(
            parquet_file_stats(spark, f"{root}/batch_id={i}")[0] for i in live
        )
        total_bytes = sum(
            parquet_file_stats(spark, f"{root}/batch_id={i}")[1] for i in live
        )
        n_out = max(1, math.ceil(total_bytes / target_file_bytes))
        merged = (
            spark.read.parquet(path)
            .where(F.col("batch_id").isin([int(i) for i in live]))
            .drop("batch_id")
            .repartition(n_out)
        )
        target = P(f"{root}/batch_id={upto}")
        old = P(f"{root}/.batch_id={upto}.old")
        tmp = P(f"{root}/.batch_id={upto}.tmp")
        if fs.exists(tmp):
            fs.delete(tmp, True)
        merged.write.mode("overwrite").parquet(str(tmp))
        rows = spark.read.parquet(str(tmp)).count()
        if fs.exists(old):
            fs.delete(old, True)
        if not fs.rename(target, old):
            raise OSError(f"swap aborted: rename batch_id={upto} -> .old failed")
        if not fs.rename(tmp, target):
            fs.rename(old, target)
            raise OSError(
                f"swap aborted: rename .tmp -> batch_id={upto} failed; restored"
            )
        _write_consolidated_marker(fs, jvm, root, upto)
        fs.delete(old, True)
        stale = sorted(set(stale) | {i for i in live if i < upto})
        out.update(
            batches_after=1,
            files_before=files_before,
            files_after=parquet_file_stats(spark, str(target))[0],
            rows=rows,
            upto=upto,
        )
    # garbage-collect directories below the floor (normal path AND the
    # crash-recovery path where a previous call died before its deletes)
    for i in stale:
        fs.delete(P(f"{root}/batch_id={i}"), True)
    return out
