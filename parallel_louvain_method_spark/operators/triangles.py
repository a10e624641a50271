"""Exact triangle counting — SURVEY.md J7/A13, [NR] north rule.

Canonical degree-ordered two-join algorithm (the standard distributed
pattern; see also the reference's absent-but-required BFS-era Graph500
lineage):

1. simplify: undirected, self-loops dropped, parallel edges collapsed;
2. orient each edge from the endpoint with (lower degree, lower id) to the
   higher — every triangle then has exactly ONE wedge at its lowest-ordered
   vertex, and each directed adjacency list is short (O(sqrt(m)) for the
   heavy tail), which is the skew defense: no hub ever enumerates its full
   neighborhood squared;
3. wedges = oriented ⋈ oriented on the middle vertex;
4. triangles = wedges semi-joined against oriented edges on (a, c).

Two shuffle joins total; both run wholly in the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from parallel_louvain_method_spark.operators.graph import symmetric_edges


def _oriented(edges: DataFrame) -> DataFrame:
    """Simple undirected edges oriented by (degree, id)."""
    simple = (
        symmetric_edges(edges)
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = simple.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("d"))
    with_deg = (
        simple.join(deg.withColumnRenamed("v", "src").withColumnRenamed("d", "ds"), "src")
        .join(deg.withColumnRenamed("v", "dst").withColumnRenamed("d", "dd"), "dst")
    )
    # keep one direction: src -> dst iff (deg, id) of src < (deg, id) of dst
    return with_deg.filter(
        (F.col("ds") < F.col("dd"))
        | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst")


def triangle_count(edges: DataFrame) -> int:
    """Total number of distinct triangles in the graph (exact)."""
    oriented = _oriented(edges).persist(StorageLevel.MEMORY_AND_DISK)
    wedges = (
        oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(
            oriented.select(F.col("src").alias("b"), F.col("dst").alias("c")),
            "b",
        )
    )
    n = (
        wedges.join(
            oriented.select(F.col("src").alias("a"), F.col("dst").alias("c")),
            ["a", "c"],
        ).count()
    )
    oriented.unpersist()
    return n


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """``DataFrame[vtx, triangles]`` — per-vertex triangle participation."""
    oriented = _oriented(edges).persist(StorageLevel.MEMORY_AND_DISK)
    closed = (
        oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .join(
            oriented.select(F.col("src").alias("b"), F.col("dst").alias("c")),
            "b",
        )
        .join(
            oriented.select(F.col("src").alias("a"), F.col("dst").alias("c")),
            ["a", "c"],
        )
    )
    per_vtx = (
        closed.select(F.explode(F.array("a", "b", "c")).alias("vtx"))
        .groupBy("vtx")
        .agg(F.count("*").alias("triangles"))
    )
    oriented.unpersist()
    return per_vtx


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per vertex:
    ``coeff(v) = 2·triangles(v) / (d(v)·(d(v)−1))``, 0.0 below degree 2.

    ``DataFrame[vtx: long, coeff: double]`` over every vertex with at
    least one edge.  Composes the degree-ordered triangle enumeration
    (skew-safe: no hub enumerates its neighborhood squared) with the
    simple-degree aggregation — two extra JVM-side joins over
    :func:`triangles_per_vertex`, nothing per-row in Python.
    """
    simple = (
        symmetric_edges(edges)
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = simple.groupBy(F.col("src").alias("vtx")).agg(
        F.count("*").alias("d")
    )
    tri = triangles_per_vertex(edges)
    return deg.join(tri, "vtx", "left").select(
        F.col("vtx").cast("long").alias("vtx"),
        F.when(
            F.col("d") >= 2,
            F.lit(2.0)
            * F.coalesce(F.col("triangles"), F.lit(0))
            / (F.col("d") * (F.col("d") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("coeff"),
    )
