"""k-core decomposition — iterative peeling ([NR] link-graph analytics
family, alongside PageRank / connected components / label propagation /
triangle counting; SURVEY.md §2 A10-A13).

The k-core is the maximal subgraph in which every vertex has degree >= k
(degree counted inside the subgraph; undirected, self-loops dropped,
parallel edges collapsed).  Peeling computes it: repeatedly delete every
vertex whose current degree is below k until nothing changes.

Scale design (the same discipline as the other iterative operators):

- each round is ONE map-side-combined degree aggregation over the live
  edge set plus two semi-joins that can only SHRINK it — no data is ever
  re-expanded, so round r scans at most the survivor edges of round r-1;
- the live table is re-checkpointed per round with ``fresh_checkpoint``
  (stats-free leaves, plans/lineage.py) so neither lineage depth nor
  Catalyst's carried sizeInBytes compound across rounds;
- convergence costs one driver action per round: the keep-set COUNT.
  Live edges shrink monotonically, hence degrees shrink monotonically,
  hence keep sets are NESTED across rounds — an unchanged count therefore
  proves an unchanged set (no expensive set comparison needed);
- the keep side of the semi-joins is a vertex table (<= |V| rows, two
  longs); Spark's planner broadcasts it while small and shuffles past
  that — no driver-side collection anywhere.

:func:`kcore_peel` is the fixed-round twin (exactly ``rounds``
iterations) whose algebra a DuckDB oracle can unroll — same pattern as
``pagerank_k3`` / ``lpa_k2``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parallel_louvain_method_spark.operators.graph import symmetric_edges
from parallel_louvain_method_spark.plans.lineage import fresh_checkpoint


def _simple_sym(edges: DataFrame) -> DataFrame:
    """Undirected simple edge set: symmetric, no self-loops, deduped."""
    return (
        symmetric_edges(edges)
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _round(live: DataFrame, k: int) -> tuple[DataFrame, DataFrame]:
    """One peel round: (survivors with degree >= k, restricted edges)."""
    deg = live.groupBy(F.col("src").alias("vtx")).agg(
        F.count("*").alias("d")
    )
    keep = deg.filter(F.col("d") >= k).select("vtx")
    nxt = live.join(
        keep.withColumnRenamed("vtx", "src"), "src", "left_semi"
    ).join(keep.withColumnRenamed("vtx", "dst"), "dst", "left_semi")
    return keep, nxt


def kcore(edges: DataFrame, k: int, max_iter: int = 100) -> DataFrame:
    """Vertices of the k-core: ``DataFrame[vtx: long]``.

    ``k >= 1``; isolated vertices (no edges at all) are never in a k-core
    for k >= 1 and are not represented in the output.
    """
    if k < 1:
        raise ValueError("kcore requires k >= 1")
    spark = edges.sparkSession
    live = fresh_checkpoint(_simple_sym(edges))
    n_prev = -1
    for _ in range(max_iter):
        keep, nxt = _round(live, k)
        n = keep.count()
        if n == 0:
            return spark.createDataFrame([], "vtx long")
        if n == n_prev:
            # keep sets are nested round-over-round, so an unchanged count
            # proves the set is unchanged: global fixpoint
            break
        n_prev = n
        live = fresh_checkpoint(nxt)
    return keep.select(F.col("vtx").cast("long").alias("vtx"))


def kcore_peel(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Survivors of exactly ``rounds`` peel iterations (not necessarily a
    fixpoint) — the SQL-unrollable oracle twin of :func:`kcore`."""
    if k < 1 or rounds < 1:
        raise ValueError("kcore_peel requires k >= 1 and rounds >= 1")
    live = _simple_sym(edges)
    keep = None
    for i in range(rounds):
        keep, nxt = _round(live, k)
        if i < rounds - 1:  # the last round's restriction is never read
            live = fresh_checkpoint(nxt)
    return keep.select(F.col("vtx").cast("long").alias("vtx"))
