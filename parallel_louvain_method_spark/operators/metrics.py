"""Whole-graph / partition diagnostic metrics.

The reference stops at modularity of its own Louvain state
(/root/reference/src/community.cpp:183-200); a link-graph analytics user
asks two follow-up questions the moment communities exist: "is this graph
assortative?" (hubs-link-to-hubs vs hubs-link-to-leaves — decides whether
degree-based partitioning/salting will skew) and "how good is THIS
partition?" (per-community conductance — the standard cut-quality score
for any assignment, whether it came from Louvain, LPA, or an external
label).  Both are pure DataFrame joins + one aggregation: no iteration,
no Python in the hot path, shuffle keyed on vertex ids exactly like the
engine's own degree/community aggregations.

Conventions (shared with the engine, documented against the gate twins):

- degrees are computed over the SYMMETRIC deduped table, self-loops
  counted once — identical to :func:`..graph.degrees`
  (reference semantics, src/graph.cpp:238-247);
- the assortativity correlation runs over the self-loop-EXCLUDED
  symmetric rows, so each undirected edge contributes one (du, dv) and
  one (dv, du) sample — the standard symmetrized Pearson form
  (Newman 2002, "Assortative mixing in networks", eq. 4);
- conductance(c) = cut(c) / min(vol(c), vol(G) - vol(c)), NULL when the
  denominator is zero (a community that is the whole graph, or an
  isolated community with no volume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .graph import exclude_self_loops, symmetric_edges


def degree_assortativity(edges: DataFrame, weighted: bool = False) -> DataFrame:
    """Pearson degree-degree correlation over edges, as a 1-row frame.

    ``DataFrame[assortativity: double]`` — r in [-1, 1]; NULL when every
    vertex has the same degree (zero variance) or the graph has no
    non-loop edge.  ``weighted=True`` uses weight-summed degrees (the
    engine's :func:`..graph.degrees`); the default uses simple row-count
    degrees over the symmetric table.

    Plan shape: one degree aggregation (shuffle on vertex id), reused on
    both endpoints of a vertex-keyed join, then a single scalar ``corr``
    — the same two-join skeleton as the neighbor→community join (J1), so
    it inherits the engine's skew posture: degree rows are tiny
    (vtx, double) and the join is AQE-splittable on the hot keys.
    """
    sym = symmetric_edges(edges)
    dm = F.sum("weight") if weighted else F.count("*").cast("double")
    deg = sym.groupBy(F.col("src").alias("v")).agg(dm.alias("deg"))
    samples = (
        exclude_self_loops(sym)
        .select("src", "dst")
        .join(deg.select(F.col("v").alias("src"), F.col("deg").alias("du")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("deg").alias("dv")), "dst")
    )
    # explicit Pearson (population moments; the n/(n-1) factors cancel) —
    # ANSI-mode `corr` raises DIVIDE_BY_ZERO on zero-variance inputs (a
    # regular graph), where the right answer is NULL, not an error
    return samples.agg(
        F.try_divide(
            F.covar_pop("du", "dv"),
            F.stddev_pop("du") * F.stddev_pop("dv"),
        ).alias("assortativity")
    )


def partition_quality(edges: DataFrame, assignment: DataFrame) -> DataFrame:
    """Per-community cut metrics for an arbitrary vertex→community map.

    ``assignment``: ``DataFrame[vtx: long, community: long]`` covering the
    graph's vertices (vertices missing from the assignment drop out of
    the metrics; assignment rows for absent vertices count toward
    ``n_vertices`` only).

    Returns ``DataFrame[community, n_vertices, volume, internal_weight,
    cut_weight, conductance]`` where, over the symmetric deduped table
    (self-loops once, per the engine's degree convention):

    - ``volume`` = Σ weight of rows whose src is in c;
    - ``internal_weight`` = Σ weight of rows with both endpoints in c
      (so a proper undirected internal edge contributes twice, a
      self-loop once — exactly 2·w_in(c) + loops(c));
    - ``cut_weight`` = volume − internal_weight = Σ weight leaving c;
    - ``conductance`` = cut / min(vol, vol(G) − vol), NULL if min is 0.

    One vertex-keyed join per endpoint, one groupBy(community) — the same
    shuffle skeleton as the engine's community-totals aggregation (J2/A5,
    operators/louvain.py); the vol(G) scalar rides as a broadcast 1-row
    cross join, never a driver round-trip inside a loop.
    """
    sym = symmetric_edges(edges)
    a_src = assignment.select(F.col("vtx").alias("src"), F.col("community").alias("cs"))
    a_dst = assignment.select(F.col("vtx").alias("dst"), F.col("community").alias("cd"))
    tagged = sym.join(a_src, "src").join(a_dst, "dst")
    per_c = tagged.groupBy(F.col("cs").alias("community")).agg(
        F.sum("weight").alias("volume"),
        F.sum(F.when(F.col("cs") == F.col("cd"), F.col("weight")).otherwise(0.0)).alias(
            "internal_weight"
        ),
    )
    sizes = assignment.groupBy("community").agg(
        F.count_distinct("vtx").alias("n_vertices")
    )
    total = per_c.agg(F.sum("volume").alias("total_volume"))
    denom = F.least(F.col("volume"), F.col("total_volume") - F.col("volume"))
    return (
        sizes.join(per_c, "community", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "community",
            "n_vertices",
            F.coalesce("volume", F.lit(0.0)).alias("volume"),
            F.coalesce("internal_weight", F.lit(0.0)).alias("internal_weight"),
            (F.coalesce("volume", F.lit(0.0)) - F.coalesce("internal_weight", F.lit(0.0))).alias(
                "cut_weight"
            ),
            F.when(
                denom > 0.0,
                (F.col("volume") - F.col("internal_weight")) / denom,
            ).alias("conductance"),
        )
    )
