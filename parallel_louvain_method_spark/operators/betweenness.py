"""Betweenness centrality (level-synchronous Brandes) — [NR+]
link-graph analytics family: the last of the classic centralities
(degree A1, PageRank A10, eigenvector A23, HITS A24, closeness /
harmonic A21-A22) and the standard importance measure for brokers /
bridges in a web link graph.

Exact all-sources betweenness is O(|V|·|E|) and never runs at 100 TB;
the published scale path is SAMPLED betweenness (Brandes-Pich 2007:
dependencies from a source subset are an unbiased estimator) and/or
TRUNCATED k-betweenness (only shortest paths of length <= k count —
bounded-distance dependency).  This module implements exactly that
surface: :func:`betweenness_centrality` takes an explicit ``sources``
sample and an optional ``max_hops`` truncation, so the cost is
O(|sources| · hops) join rounds no matter the graph.

Both Brandes phases are flat vertex-keyed relations (the paths.py /
components.py posture — no per-vertex maps, every step an equi-join):

- **forward** (per hop d): BFS counting shortest paths —
  ``sigma(v, root) = number of shortest root→v paths``.  New frontier =
  ``rel ⋈ frontier`` summed per (dst, root) map-side, anti-joined
  against the visited set; sigma sums are integer-valued doubles, so
  they are EXACT regardless of aggregation order (< 2^53).
- **backward** (per depth d, descending): the dependency recursion
  ``delta(v) = Σ_{w: succ} sigma_v/sigma_w · (1 + delta(w))`` over the
  predecessor-successor pair relation (one 3-way equi-join built once:
  edge ⋈ state ⋈ state with ``dist_w = dist_v + 1``, same root).  Each
  depth needs only the NEXT depth's deltas, so the loop carries one
  bounded DataFrame and appends to an accumulator.

``betweenness(v) = Σ_roots delta(v, root)`` over ``v != root`` (the
textbook accumulation — endpoints are never interior vertices).  For an
undirected graph with ``sources = all vertices`` this is exactly 2× the
classic C_B; the raw dependency sum is returned unscaled so the
fixed-source gate oracle is bit-comparable — apply the published
normalization of your choice downstream.

The reference computes no centralities; this extends its link-graph
toolbox the same way pagerank.py does (north-rule family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parallel_louvain_method_spark.operators.paths import _relax_edges
from parallel_louvain_method_spark.plans.lineage import fresh_checkpoint


def _seeds(spark, sources: list[int]) -> DataFrame:
    if not sources:
        raise ValueError("betweenness requires at least one source id")
    if len(set(sources)) != len(sources):
        raise ValueError("betweenness: duplicate source ids")
    return spark.createDataFrame(
        [(int(s), int(s), 0, 1.0) for s in sources],
        "vtx long, root long, dist int, sigma double",
    )


def betweenness_centrality(
    edges: DataFrame,
    sources: list[int],
    max_hops: int | None = None,
    directed: bool = False,
) -> DataFrame:
    """Sampled (and optionally hop-truncated) betweenness:
    ``DataFrame[vtx: long, btw: double]`` — one row for EVERY vertex of
    the edge table (zero-dependency vertices included with ``btw = 0``),
    where ``btw`` is the summed Brandes dependency of ``vtx`` over the
    given source set, counting only shortest paths of length
    ``<= max_hops`` (``None`` = untruncated; the forward BFS terminates
    naturally when the frontier empties, < |V| rounds).

    ``sources`` is the estimator's sample — pass every vertex for the
    exact (small-graph) value, a uniform sample for the Brandes-Pich
    estimate at scale.  Results are deterministic for a fixed sample.
    """
    if max_hops is not None and max_hops < 1:
        raise ValueError("betweenness: max_hops must be >= 1")
    spark = edges.sparkSession
    rel = fresh_checkpoint(
        _relax_edges(edges, weighted=False, directed=directed)
        .select("src", "dst")
    )

    # forward: level-synchronous BFS with path counting
    state = fresh_checkpoint(_seeds(spark, sources))
    frontier = state
    depth = 0
    while max_hops is None or depth < max_hops:
        new = (
            # rel/frontier/state are stats-free checkpoint leaves every
            # hop: hash-join with the small per-(vtx, root) side as build
            # instead of the planner's default sort-merge of both sides
            rel.join(
                frontier.withColumnRenamed("vtx", "src").hint(
                    "shuffle_hash"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("vtx"), "root")
            .agg(F.sum("sigma").alias("sigma"))
            .join(
                state.select("vtx", "root").hint("shuffle_hash"),
                ["vtx", "root"],
                "left_anti",
            )
            .select(
                "vtx", "root", F.lit(depth + 1).alias("dist"), "sigma"
            )
        )
        new = fresh_checkpoint(new)
        if new.count() == 0:
            break
        state = fresh_checkpoint(state.unionByName(new))
        frontier = new
        depth += 1

    # predecessor-successor pairs: (v, root) -> each BFS-tree successor w
    ps = (
        rel.join(
            state.select(
                F.col("vtx").alias("src"),
                "root",
                F.col("dist").alias("dv"),
                F.col("sigma").alias("sv"),
            ).hint("shuffle_hash"),
            "src",
        )
        .join(
            state.select(
                F.col("vtx").alias("dst"),
                "root",
                F.col("dist").alias("dw"),
                F.col("sigma").alias("sw"),
            ),
            ["dst", "root"],
        )
        .filter(F.col("dw") == F.col("dv") + 1)
        .select(
            F.col("src").alias("v"), "root", "dv", "sv",
            F.col("dst").alias("w"), "sw",
        )
    )
    ps = fresh_checkpoint(ps)

    # backward: per-depth dependency accumulation (deepest first); each
    # round needs only the NEXT depth's deltas
    acc: DataFrame | None = None
    nxt = spark.createDataFrame([], "vtx long, root long, delta double")
    for d in range(depth - 1, -1, -1):
        cur = (
            ps.filter(F.col("dv") == d)
            .join(
                nxt.select(
                    F.col("vtx").alias("w"), "root",
                    F.col("delta").alias("dw_delta"),
                ),
                ["w", "root"],
                "left",
            )
            .groupBy(F.col("v").alias("vtx"), "root")
            .agg(
                F.sum(
                    (F.col("sv") / F.col("sw"))
                    * (F.lit(1.0) + F.coalesce("dw_delta", F.lit(0.0)))
                ).alias("delta")
            )
        )
        cur = fresh_checkpoint(cur)
        interior = cur.filter(F.col("vtx") != F.col("root"))
        acc = (
            interior if acc is None
            else fresh_checkpoint(acc.unionByName(interior))
        )
        nxt = cur

    verts = (
        rel.select(F.col("src").alias("vtx"))
        .unionByName(rel.select(F.col("dst").alias("vtx")))
        .distinct()
    )
    if acc is None:
        return verts.select(
            F.col("vtx").cast("long"), F.lit(0.0).alias("btw")
        )
    sums = acc.groupBy("vtx").agg(F.sum("delta").alias("btw"))
    return verts.join(sums, "vtx", "left").select(
        F.col("vtx").cast("long"),
        F.coalesce("btw", F.lit(0.0)).alias("btw"),
    )
