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

Rounds-to-fixpoint is **O(|V|) worst case** (a path graph peeled at k=2
loses one vertex per round from each end), so unlike the doubling loops
(components.py: 50 rounds cover 2^50 vertices) no small constant bound is
safely conservative — the peel therefore runs UNBOUNDED by default and
RAISES if an explicit ``max_iter`` is exhausted before the fixpoint
(ADVICE r4: the old silent 100-round cap could return a superset).

:func:`kcore_peel` is the fixed-round twin (exactly ``rounds``
iterations) whose algebra a DuckDB oracle can unroll — same pattern as
``pagerank_k3`` / ``lpa_k2``.  :func:`coreness` extends the peel to the
full decomposition (every vertex's core number) by peeling at increasing
k over the nested core subgraphs; :func:`coreness_peel` is its
fixed-schedule oracle twin.
"""

from __future__ import annotations

import itertools

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


def _peel_fixpoint(
    live: DataFrame, k: int, max_iter: int | None
) -> tuple[DataFrame, DataFrame, int]:
    """Peel ``live`` (checkpointed simple symmetric edges) at ``k`` until
    the keep set stops shrinking.  Returns (keep, live_at_fixpoint,
    keep_count).  Raises RuntimeError if ``max_iter`` rounds were not
    enough — never silently returns a superset of the k-core."""
    spark = live.sparkSession
    n_prev = -1
    rounds = range(max_iter) if max_iter is not None else itertools.count()
    for _ in rounds:
        keep, nxt = _round(live, k)
        n = keep.count()
        if n == 0:
            return spark.createDataFrame([], "vtx long"), nxt, 0
        if n == n_prev:
            # keep sets are nested round-over-round, so an unchanged count
            # proves the set is unchanged: global fixpoint
            return keep, live, n
        n_prev = n
        live = fresh_checkpoint(nxt)
    raise RuntimeError(
        f"k-core peel (k={k}) did not reach a fixpoint within "
        f"{max_iter} rounds (rounds-to-fixpoint is O(|V|) worst case); "
        "raise max_iter or pass max_iter=None for the unbounded peel"
    )


def kcore(edges: DataFrame, k: int, max_iter: int | None = None) -> DataFrame:
    """Vertices of the k-core: ``DataFrame[vtx: long]``.

    ``k >= 1``; isolated vertices (no edges at all) are never in a k-core
    for k >= 1 and are not represented in the output.  ``max_iter`` is an
    optional safety bound on peel rounds: when given and exhausted before
    the fixpoint the peel RAISES (a silent cap would return a superset of
    the true k-core); the default peels to the fixpoint, which always
    terminates — the keep count strictly decreases every non-final round.
    """
    if k < 1:
        raise ValueError("kcore requires k >= 1")
    live = fresh_checkpoint(_simple_sym(edges))
    keep, _live, _n = _peel_fixpoint(live, k, max_iter)
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


def _weighted_sym(edges: DataFrame) -> DataFrame:
    """Undirected weighted simple graph: symmetric set-semantics edges,
    self-loops dropped, distinct-weight parallels collapsed by SUM — the
    strength relation of the s-core."""
    return (
        symmetric_edges(edges)
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
    )


def _round_s(live: DataFrame, s: float) -> tuple[DataFrame, DataFrame]:
    """One s-core peel round: survivors with strength (weighted degree)
    >= s, and the live edges restricted to them."""
    strength = live.groupBy(F.col("src").alias("vtx")).agg(
        F.sum("weight").alias("w")
    )
    keep = strength.filter(F.col("w") >= s).select("vtx")
    nxt = live.join(
        keep.withColumnRenamed("vtx", "src"), "src", "left_semi"
    ).join(keep.withColumnRenamed("vtx", "dst"), "dst", "left_semi")
    return keep, nxt


def s_core(
    edges: DataFrame, s: float, max_iter: int | None = None
) -> DataFrame:
    """Vertices of the s-core (Eidsaa & Almaas strength core — the
    weighted generalization of :func:`kcore`): the maximal subgraph in
    which every vertex's STRENGTH (sum of incident simple-edge weights,
    self-loops dropped, distinct-weight parallels weight-summed) is
    >= ``s``.  ``DataFrame[vtx: long]``.

    Requires non-negative weights (checked up front, one action): the
    peel's correctness rests on strengths SHRINKING as edges are removed,
    which makes keep sets nested round-over-round — the same
    count-convergence proof as :func:`kcore`, which this reduces to at
    ``s = k`` on unit weights (pinned in pytest).  Same scale posture:
    shrink-only semi-joins, per-round stats-free checkpoints, one COUNT
    action per round, RAISE on ``max_iter`` exhaustion (never a silent
    superset — rounds-to-fixpoint is O(|V|) worst case).
    """
    if not s > 0:
        raise ValueError("s_core requires s > 0")
    live = fresh_checkpoint(_weighted_sym(edges))
    wmin = live.agg(F.min("weight")).first()[0]
    if wmin is not None and wmin < 0:
        raise ValueError(
            "s_core requires non-negative weights (peel monotonicity); "
            f"found min weight {wmin}"
        )
    spark = live.sparkSession
    n_prev = -1
    rounds = range(max_iter) if max_iter is not None else itertools.count()
    for _ in rounds:
        keep, nxt = _round_s(live, s)
        n = keep.count()
        if n == 0:
            return spark.createDataFrame([], "vtx long")
        if n == n_prev:
            return keep.select(F.col("vtx").cast("long").alias("vtx"))
        n_prev = n
        live = fresh_checkpoint(nxt)
    raise RuntimeError(
        f"s-core peel (s={s}) did not reach a fixpoint within "
        f"{max_iter} rounds; raise max_iter or pass max_iter=None"
    )


def s_core_peel(edges: DataFrame, s: float, rounds: int) -> DataFrame:
    """Survivors of exactly ``rounds`` s-core peel iterations — the
    SQL-unrollable oracle twin of :func:`s_core` (the ``kcore_peel``
    pattern with SUM(weight) in place of COUNT(*))."""
    if not s > 0 or rounds < 1:
        raise ValueError("s_core_peel requires s > 0 and rounds >= 1")
    live = _weighted_sym(edges)
    keep = None
    for i in range(rounds):
        keep, nxt = _round_s(live, s)
        if i < rounds - 1:
            live = fresh_checkpoint(nxt)
    return keep.select(F.col("vtx").cast("long").alias("vtx"))


def coreness(
    edges: DataFrame, max_k: int | None = None, max_iter: int | None = None
) -> DataFrame:
    """Full k-core decomposition: ``DataFrame[vtx: long, coreness: long]``
    — each vertex's core number (the largest k such that it belongs to
    the k-core).  Isolated vertices are absent (as in :func:`kcore`);
    every vertex with at least one simple edge has coreness >= 1.

    Peels at increasing k over the NESTED core subgraphs: the (k+1)-core
    is a subgraph of the k-core, so stage k+1 resumes from stage k's
    fixpoint edges — total edge work is the sum of shrinking live sets,
    never a restart from the full graph.  Vertices that drop out while
    peeling at k have coreness k-1.  The number of stages is the graph
    degeneracy (+1); ``max_k`` clamps it — survivors past stage
    ``max_k + 1`` report coreness = ``max_k`` ("at least max_k"), which
    bounds the stage count for gate twins and for graphs with dense
    clique cores.  ``max_iter`` bounds each stage's peel rounds (raises
    on exhaustion, like :func:`kcore`).

    The accumulated result is a union of per-stage DISJOINT vertex sets;
    it is re-checkpointed every few stages so the union plan never grows
    with degeneracy.
    """
    spark = edges.sparkSession
    live = fresh_checkpoint(_simple_sym(edges))
    prev_keep = live.select(F.col("src").alias("vtx")).distinct()
    n_prev = prev_keep.count()
    if n_prev == 0:
        return spark.createDataFrame([], "vtx long, coreness long")
    out: DataFrame | None = None
    k = 2
    while True:
        if max_k is not None and k > max_k:
            final = prev_keep.withColumn("coreness", F.lit(max_k))
            out = final if out is None else out.unionByName(final)
            break
        keep, live, n = _peel_fixpoint(live, k, max_iter)
        if n < n_prev:
            dropped = prev_keep.join(keep, "vtx", "left_anti").withColumn(
                "coreness", F.lit(k - 1)
            )
            out = dropped if out is None else out.unionByName(dropped)
        if n == 0:
            break
        prev_keep, n_prev = keep, n
        k += 1
        if k % 8 == 0 and out is not None:
            out = fresh_checkpoint(out)
        prev_keep = fresh_checkpoint(prev_keep)
    return out.select(
        F.col("vtx").cast("long").alias("vtx"),
        F.col("coreness").cast("long").alias("coreness"),
    )


def coreness_peel(edges: DataFrame, max_k: int, rounds: int) -> DataFrame:
    """Fixed-schedule twin of :func:`coreness` — exactly ``rounds`` peel
    iterations per stage k = 2 .. ``max_k``, survivors of the last stage
    reported as coreness = ``max_k`` (the same clamp as
    ``coreness(max_k=...)``).  Matches :func:`coreness` whenever every
    stage reaches its fixpoint within ``rounds``; SQL-unrollable, so a
    DuckDB oracle can replay the identical schedule (the ``kcore80_peel2``
    pattern extended to the full decomposition)."""
    if max_k < 2 or rounds < 1:
        raise ValueError("coreness_peel requires max_k >= 2 and rounds >= 1")
    live = fresh_checkpoint(_simple_sym(edges))
    prev_keep = live.select(F.col("src").alias("vtx")).distinct()
    out: DataFrame | None = None
    for k in range(2, max_k + 1):
        keep = prev_keep
        for _ in range(rounds):
            keep, nxt = _round(live, k)
            live = fresh_checkpoint(nxt)
        dropped = prev_keep.join(keep, "vtx", "left_anti").withColumn(
            "coreness", F.lit(k - 1)
        )
        out = dropped if out is None else out.unionByName(dropped)
        prev_keep = keep
    out = out.unionByName(prev_keep.withColumn("coreness", F.lit(max_k)))
    return out.select(
        F.col("vtx").cast("long").alias("vtx"),
        F.col("coreness").cast("long").alias("coreness"),
    )
