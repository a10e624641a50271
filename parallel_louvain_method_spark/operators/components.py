"""Connected components — min-label propagation with pointer jumping
(SURVEY.md A11, [NR] north rule; exact counts required).

Algorithm: every vertex starts labeled with its own id; each round
1. neighbor-min: ``label[v] <- min(label[v], min_{u~v} label[u])``
   (one join + groupBy-min over the symmetric edge table), then
2. pointer-jump: ``label[v] <- label[label[v]]`` (self-join of the label
   table), which contracts label chains and gives the logarithmic-round
   behavior of the large-star/small-star family (PAPERS.md, "Finding
   connected components in map-reduce in logarithmic rounds").

Terminates when a round changes nothing; the result labels each component
by its minimum vertex id (deterministic, exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from parallel_louvain_method_spark.operators.graph import (
    symmetric_edges,
    vertex_ids,
)


def connected_components(
    edges: DataFrame,
    max_iter: int = 50,
    broadcast_vertex_threshold: int = 5_000_000,
) -> DataFrame:
    """Returns ``DataFrame[vtx: long, component: long]`` with
    ``component = min vertex id of the component``.

    While the vertex set is below ``broadcast_vertex_threshold`` the label
    table gets an explicit broadcast hint in the per-round join —
    ``localCheckpoint`` erases its statistics, so the planner would
    otherwise sort-merge-join, re-sorting the cached edge side every round.
    """
    sym = (
        symmetric_edges(edges)
        .select("src", "dst")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts = vertex_ids(edges).withColumnRenamed("v", "vtx")
    n = verts.count()
    hint = (
        (lambda df: F.broadcast(df))
        if n <= broadcast_vertex_threshold
        else (lambda df: df)
    )
    labels = verts.select("vtx", F.col("vtx").alias("component")).localCheckpoint(
        eager=True
    )

    for _ in range(max_iter):
        nbr_min = (
            sym.join(hint(labels.withColumnRenamed("vtx", "dst")), "dst")
            .groupBy(F.col("src").alias("vtx"))
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = (
            labels.join(hint(nbr_min), "vtx", "left")
            .select(
                "vtx",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
        )
        # pointer jump: component <- component's own current label
        jumped = (
            stepped.alias("a")
            .join(
                hint(
                    stepped.select(
                        F.col("vtx").alias("component"),
                        F.col("component").alias("parent"),
                    ).alias("b")
                ),
                "component",
                "left",
            )
            .select(
                F.col("vtx"),
                F.coalesce(F.col("parent"), F.col("component")).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.withColumnRenamed("component", "new_component")
            .join(labels, "vtx")
            .filter(F.col("new_component") != F.col("component"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break

    sym.unpersist()
    return labels


def component_counts(edges: DataFrame) -> DataFrame:
    """``DataFrame[component, size]`` — exact sizes (north rule)."""
    return (
        connected_components(edges)
        .groupBy("component")
        .agg(F.count("*").alias("size"))
    )
