"""DAG layering — topological levels by longest path ([NR+] link-graph
analytics family: the standard consumer of :func:`~parallel_louvain_method_spark.operators.scc.condensation`).

``level(v) = length of the longest path ending at v`` (0 for sources):
the canonical parallel-schedule layering — level-k vertices depend only
on levels < k, so each level is an independent batch (dependency-graph
scheduling, dataflow staging, web-graph depth census).

One Bellman-style max-propagation round per iteration (the
elementwise-MAX mirror of paths.py's min-merge): candidates =
``levels ⋈ edges`` max-combined map-side per dst, merged with the old
state by ``greatest``.  Levels only ever increase and each value is the
length of a simple path, so on a DAG the fixpoint arrives in
``longest_path + 1 <= |V|`` rounds — which doubles as a CYCLE DETECTOR:
any vertex whose level reaches ``|V|`` lies on (or downstream of) a
cycle, and the loop RAISES rather than spinning (run
:func:`~parallel_louvain_method_spark.operators.scc.condensation`
first to collapse cycles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parallel_louvain_method_spark.plans.lineage import fresh_checkpoint


def topological_levels(edges: DataFrame) -> DataFrame:
    """Longest-path levels of the DAG ``edges`` (``src → dst``, weights
    ignored, self-loops rejected as trivial cycles):
    ``DataFrame[vtx: long, level: long]`` over every vertex of the edge
    table.  Raises ``ValueError`` if the graph has a cycle."""
    if edges.filter(F.col("src") == F.col("dst")).limit(1).count() > 0:
        raise ValueError("topological_levels: self-loop found (not a DAG)")
    rel = fresh_checkpoint(edges.select("src", "dst").distinct())
    verts = (
        rel.select(F.col("src").alias("vtx"))
        .unionByName(rel.select(F.col("dst").alias("vtx")))
        .distinct()
    )
    n = verts.count()
    if n == 0:  # empty DAG (e.g. the condensation of one giant SCC)
        return verts.select(
            F.col("vtx").cast("long"), F.lit(0).cast("long").alias("level")
        )
    state = fresh_checkpoint(verts.select("vtx", F.lit(0).alias("level")))
    prev_sum = 0
    for _ in range(n):
        cand = (
            rel.join(state.withColumnRenamed("vtx", "src"), "src")
            .groupBy(F.col("dst").alias("vtx"))
            .agg((F.max("level") + 1).alias("clevel"))
        )
        nxt = fresh_checkpoint(
            state.join(cand, "vtx", "left").select(
                "vtx",
                F.greatest(
                    F.col("level"), F.coalesce("clevel", F.col("level"))
                ).alias("level"),
            )
        )
        # levels only ever increase, so an unchanged level SUM proves an
        # unchanged state — one aggregate on the just-checkpointed frame
        # instead of a join-and-count against the previous round
        level_sum = int(nxt.agg(F.sum("level")).first()[0] or 0)
        state = nxt
        if level_sum == prev_sum:
            return state.select(
                F.col("vtx").cast("long"),
                F.col("level").cast("long").alias("level"),
            )
        prev_sum = level_sum
    raise ValueError(
        "topological_levels: no fixpoint within |V| rounds — the graph "
        "has a cycle; run scc.condensation first"
    )
