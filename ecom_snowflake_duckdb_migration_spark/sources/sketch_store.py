"""Durable sketch store: persist, validate, and merge-into sketch artifacts.

Operationalizes operators/sketches.py for the shard-and-merge workflow: a
100 TB pipeline computes one sketch per ingest batch (day, shard, source)
and folds it into a running artifact instead of ever re-scanning history.
The store is a parquet directory plus a ``_sketch_meta.json`` sidecar (same
pattern as the CSV metadata sidecar, writers.py:34) recording the sketch
kind and its parameters — merging two sketches is only algebraically valid
when those parameters match, so ``merge_into`` refuses mismatches instead
of silently producing garbage.

Merge algebra per kind (all idempotent on re-delivery of the same rows —
max/OR — or exactly-once by upstream dedup for the additive ones):
- hll / hll_group: (group-,) bucket-wise MAX(rho)
- countmin:        cell-wise SUM  (additive: upstream must not re-deliver)
- kmv:             distinct union, re-take k smallest
- bloom:           word-wise OR
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META_NAME = "_sketch_meta.json"

# kind -> (merge fn over a unioned frame, required meta params)
_MERGE_KEYS = {
    "hll": (["bucket"], {"rho": "max"}, ("p",)),
    "countmin": (["r", "cell"], {"total": "sum"}, ("d", "w")),
    "kmv": (None, None, ("k",)),  # special-cased: distinct + top-k
    "bloom": (["word"], {"bits": "bit_or"}, ("m_bits", "k")),
    # LSH band index for incremental corpus dedup (operators.incremental_dedup):
    # no value columns — merge is a distinct union of (id, band, bucket) rows,
    # idempotent on re-delivered batches. Params pin the signing scheme:
    # probing with mismatched k/num_hashes/bands/hash_fn is meaningless.
    "lsh_bands": (["band", "bucket"], {}, ("k", "num_hashes", "bands", "hash_fn")),
}


def _meta_path(path: str) -> str:
    return os.path.join(path, _META_NAME)


def write_sketch(df: DataFrame, path: str, kind: str, **params) -> None:
    """Persist a sketch with its kind/params sidecar (overwrite)."""
    if kind not in _MERGE_KEYS:
        raise ValueError(f"unknown sketch kind: {kind!r}")
    _, _, required = _MERGE_KEYS[kind]
    missing = [p for p in required if p not in params]
    if missing:
        raise ValueError(f"{kind} sketch requires params {missing}")
    df.write.mode("overwrite").parquet(path)
    with open(_meta_path(path), "w") as f:
        json.dump({"kind": kind, "params": params}, f)


def read_sketch(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Load a sketch and its metadata; raises if the sidecar is absent."""
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    return spark.read.parquet(path), meta


def merge_sketches(a: DataFrame, b: DataFrame, kind: str, **params) -> DataFrame:
    """Merge two same-kind, same-params sketch frames (pure transform)."""
    if kind == "kmv":
        k = int(params["k"])
        return a.unionByName(b).distinct().orderBy("h").limit(k)
    keys, aggs, _ = _MERGE_KEYS[kind]
    u = a.unionByName(b)
    if not aggs:  # pure set-union kinds (lsh_bands): dedup rows, no agg
        return u.distinct()
    agg_cols = [getattr(F, fn)(c).alias(c) for c, fn in aggs.items()]
    # hll_group sketches carry extra group columns ahead of the bucket —
    # merge on every non-value column so the same code serves both.
    extra = [c for c in a.columns if c not in keys and c not in aggs]
    return u.groupBy(*extra, *keys).agg(*agg_cols).select(*a.columns)


def merge_into(spark: SparkSession, path: str, new_sketch: DataFrame, kind: str, **params) -> DataFrame:
    """Fold a new partial sketch into the stored artifact; returns the merged frame.

    Refuses kind/param mismatches (merging an HLL(p=9) into an HLL(p=10)
    or a (d,w)-mismatched count-min is algebraically meaningless). First
    call creates the store. The swap is write-to-sibling then rename: the
    sidecar is written INTO the sibling before any rename, so a reader
    never sees a parquet dir without its metadata, and every directory on
    disk is complete at all times. The swap itself is two renames (old
    aside, sibling in) — not a single atomic exchange, so a concurrent
    reader can hit ENOENT in that instant and should retry; a crash leaves
    a complete ``.old`` or ``.tmp`` to recover from, never a torn store.
    """
    import shutil

    # Crash recovery BEFORE anything else: a crash between the two swap
    # renames leaves the only complete store at '.old' and nothing at
    # ``path``. Without this, the next merge would take the first-write
    # branch (no sidecar at path) and then rmtree '.old' — silently
    # discarding the entire accumulated history.
    old = path.rstrip("/") + ".old"
    if not os.path.exists(_meta_path(path)) and os.path.exists(
        os.path.join(old, _META_NAME)
    ):
        if os.path.isdir(path):  # torn partial at path: the .old is older
            shutil.rmtree(path)  # but complete — prefer complete
        os.rename(old, path)

    if os.path.exists(_meta_path(path)):
        prev, meta = read_sketch(spark, path)
        if meta["kind"] != kind or {k: meta["params"].get(k) for k in params} != {
            k: params[k] for k in params
        }:
            raise ValueError(
                f"sketch at {path} is {meta['kind']}({meta['params']}); "
                f"refusing to merge {kind}({params})"
            )
        merged = merge_sketches(prev, new_sketch, kind, **params)
    else:
        merged = new_sketch
    tmp = path.rstrip("/") + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    # Sidecar goes into the sibling BEFORE the swap: the rename then moves
    # parquet + metadata together, so no reader window sees one without
    # the other. (Spark ignores _-prefixed files inside parquet dirs.)
    with open(_meta_path(tmp), "w") as f:
        json.dump({"kind": kind, "params": dict(params)}, f)
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.isdir(old):
        shutil.rmtree(old)
    return spark.read.parquet(path)
