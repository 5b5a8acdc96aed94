"""Deterministic sampling for reproducible corpus construction.

Training-data pipelines mix sources by quota ("keep 30% of crawl, 100% of
reference corpora"). `rand()`-based sampling is irreproducible across
engines, runs, and partitionings; these operators decide membership from a
content hash, so the same (seed, id) always samples the same way on any
engine — the selection is a pure function of the data.

Engine parity trick: the decision is `substring(md5(seed || ':' || id), 1,
8) < threshold_hex`. Lowercase-hex strings compare lexicographically
exactly like the integers they encode, and Spark and DuckDB produce
identical md5 hex — so the DuckDB oracle replays the identical selection
without any hex->int conversion.

Scale: per-row hash + compare, no shuffle, codegen-eligible; the sample
decision never needs a global pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HEX_SPACE = 16 ** 8  # 8 hex chars = 32 bits of the hash


def rate_to_threshold_hex(rate_e6: int) -> str:
    """Map an e6 fixed-point rate to the 8-hex-char decision threshold."""
    if not 0 <= rate_e6 <= 1_000_000:
        raise ValueError("rate_e6 must be in [0, 1000000]")
    if rate_e6 == 1_000_000:
        return "g"  # sorts after every hex digit -> keep all
    return format(rate_e6 * _HEX_SPACE // 1_000_000, "08x")


def sample_hash(id_col, seed: int):
    """The 8-hex-char decision hash for (seed, id)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), col.cast("string"))), 1, 8)


def deterministic_sample(
    df: DataFrame, rate_e6: int, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Keep ~rate_e6/1e6 of rows, decided purely by hash(seed, id)."""
    return df.filter(sample_hash(id_col, seed) < F.lit(rate_to_threshold_hex(rate_e6)))


def stratified_sample(
    df: DataFrame,
    rates_e6: dict[str, int],
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    default_rate_e6: int = 0,
) -> DataFrame:
    """Per-stratum quota sampling (source mixing): each stratum keeps its
    own hash fraction; strata absent from ``rates_e6`` keep
    ``default_rate_e6``. Membership is deterministic per (seed, id), so
    re-runs, engine changes, and repartitioning never change the corpus."""
    threshold = F.lit(rate_to_threshold_hex(default_rate_e6))
    for stratum, rate in sorted(rates_e6.items()):
        threshold = (
            F.when(F.col(strata_col) == stratum, F.lit(rate_to_threshold_hex(rate)))
            .otherwise(threshold)
        )
    return df.filter(sample_hash(id_col, seed) < threshold)
