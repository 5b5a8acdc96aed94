"""Near-duplicate cluster resolution: pairs -> connected components ->
canonical representative per cluster.

The missing last stage of every dedup pipeline (exact/minhash/simhash/
cosine produce PAIRS; training-data curation needs "keep one document per
duplicate GROUP"). Implemented as iterative min-label propagation over
DataFrames:

    label(v) <- min(label(v), min(label(u) for u adjacent))    until fixpoint

Each iteration is one join + one aggregation (both on the component key);
iteration count is bounded by the graph diameter, which for near-dup
clusters is tiny (duplicate groups are near-cliques — typically 2-3 hops).
This is the standard large-graph connected-components pattern (hash-to-min),
fully distributed — no driver-side union-find.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    left: str = "d1",
    right: str = "d2",
    max_iterations: int = 20,
) -> DataFrame:
    """Resolve an undirected edge list to components.

    Returns ``(node, component)`` where component = min node id in the
    component (ids compared by their natural type ordering).
    """
    edges = (
        pairs.select(F.col(left).alias("a"), F.col(right).alias("b"))
        .union(pairs.select(F.col(right).alias("a"), F.col(left).alias("b")))
        .distinct()
    )
    # start: every node labels itself
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        # The changed-flag rides along in the update projection, so the
        # convergence probe below is a scan of the (already materialized)
        # checkpoint with an early-out limit — no extra join job per round.
        new_component = F.least(
            F.col("component"), F.coalesce("nbr_component", F.col("component"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                new_component.alias("component"),
                (new_component != F.col("component")).alias("_changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)  # truncate lineage per round
        changed = updated.filter("_changed").limit(1).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    return labels


def select_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    left: str = "d1",
    right: str = "d2",
    prefer: Column | None = None,
) -> DataFrame:
    """Keep one representative per duplicate cluster (plus all unpaired
    docs). Default preference: smallest id; pass ``prefer`` (an orderable
    Column, e.g. ``F.desc('quality_score')``) to keep the best instead."""
    from pyspark.sql import Window

    comp = connected_components(pairs, left, right)
    tagged = docs.join(comp, docs[id_col] == comp.node, "left")
    singletons = tagged.filter(F.col("component").isNull()).drop("node", "component")
    clustered = tagged.filter(F.col("component").isNotNull())
    order = [prefer] if prefer is not None else []
    w = Window.partitionBy("component").orderBy(*order, F.col(id_col).asc())
    keep = (
        clustered.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "node", "component")
    )
    return singletons.unionByName(keep)
