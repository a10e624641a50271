"""Multi-source shortest paths (Bellman-Ford relaxation rounds) —
[NR+] link-graph analytics family, same loop posture as the other
iterative vertex-state operators (components.py, kcore.py, mis.py).

Landmark / seed-set distances are the standard link-graph primitive
behind reachability features, geodesic sketches, and landmark-based
distance estimation; GraphX ships the same surface as ``ShortestPaths``
(per-vertex landmark→distance).  Here the state is the flat relation
``(vtx, root, dist)`` — one row per (vertex, landmark) pair that has a
finite distance so far — which keeps the state O(reached · |sources|)
and every step a plain equi-join.

Per round (one Bellman-Ford relaxation over the whole edge set):

1. candidates: ``state ⋈ edges`` on ``vtx = src`` →
   ``(dst, root, dist + w)``, min-combined per ``(dst, root)``
   map-side before the shuffle;
2. merge: full-outer join with the old state, keep the elementwise
   minimum; the round's improvement count is the loop action.

Distances only ever decrease and each (vtx, root) value is the length of
some simple path, so the fixpoint is reached in < |V| rounds — unbounded
by default, RAISE on ``max_iter`` exhaustion (the kcore contract: never
a silent overestimate).  Negative weights are rejected up front
(negative cycles would diverge).

:func:`shortest_paths_rounds` is the fixed-round oracle twin (the
``kcore80_peel2`` pattern): distances using at most ``rounds`` edges,
SQL-unrollable as one join + GROUP BY min per round.  Both engines
compute each candidate as the same float sum ``dist + w`` and take MIN
over the same set, so fixed-round results are bit-identical IEEE.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, functions as F

from parallel_louvain_method_spark.operators.graph import symmetric_edges
from parallel_louvain_method_spark.plans.lineage import fresh_checkpoint


def _relax_edges(
    edges: DataFrame, weighted: bool, directed: bool
) -> DataFrame:
    """The relaxation relation ``(src, dst, w)``: simple (deduped,
    self-loop-free, min weight per pair), symmetrized unless directed."""
    if weighted and "weight" not in edges.columns:
        raise ValueError(
            "shortest_paths(weighted=True) requires a weight column; "
            "pass weighted=False for hop distances"
        )
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(1.0))
    base = edges if directed else symmetric_edges(edges)
    w = F.col("weight").cast("double") if weighted else F.lit(1.0)
    return (
        base.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min(w).alias("w"))
    )


def _init_state(spark, sources: list[int]) -> DataFrame:
    if not sources:
        raise ValueError("shortest_paths requires at least one source id")
    if len(set(sources)) != len(sources):
        raise ValueError("shortest_paths: duplicate source ids")
    return spark.createDataFrame(
        [(int(s), int(s), 0.0) for s in sources],
        "vtx long, root long, dist double",
    )


def _relax_round(state: DataFrame, rel: DataFrame) -> DataFrame:
    """One relaxation: the elementwise-min merge of ``state`` with the
    one-step candidates (map-side combined min per (vtx, root))."""
    cand = (
        rel.join(state.withColumnRenamed("vtx", "src"), "src")
        .groupBy(F.col("dst").alias("vtx"), "root")
        .agg(F.min(F.col("dist") + F.col("w")).alias("cdist"))
    )
    return (
        state.join(cand, ["vtx", "root"], "full_outer")
        .select(
            "vtx",
            "root",
            F.least(
                F.coalesce(F.col("dist"), F.col("cdist")),
                F.coalesce(F.col("cdist"), F.col("dist")),
            ).alias("dist"),
        )
    )


def _guard_weights(rel: DataFrame) -> None:
    mn = rel.agg(F.min("w")).first()[0]
    if mn is not None and mn < 0:
        raise ValueError(
            f"shortest_paths requires non-negative weights (min {mn}); "
            "negative cycles make shortest paths unbounded"
        )


def shortest_paths(
    edges: DataFrame,
    sources: list[int],
    weighted: bool = True,
    directed: bool = False,
    max_iter: int | None = None,
) -> DataFrame:
    """Multi-source shortest paths: ``DataFrame[vtx: long, root: long,
    dist: double]`` — one row per (vertex, source) pair with a finite
    distance; unreachable pairs are absent.  Each source always has its
    own ``dist = 0`` row (even when it never appears in the edge table).

    ``weighted=False`` gives hop counts (unit weights); ``directed=True``
    relaxes along ``src → dst`` as given instead of symmetrizing.
    ``max_iter`` bounds the relaxation rounds and RAISES on exhaustion —
    never a silent distance overestimate; the unbounded default always
    terminates (< |V| rounds, distances strictly decrease).
    """
    rel = _relax_edges(edges, weighted, directed)
    _guard_weights(rel)
    rel = fresh_checkpoint(rel)
    state = fresh_checkpoint(_init_state(edges.sparkSession, sources))
    rounds = range(max_iter) if max_iter is not None else itertools.count()
    for _ in rounds:
        nxt = fresh_checkpoint(_relax_round(state, rel))
        improved = (
            nxt.join(state.withColumnRenamed("dist", "old"),
                     ["vtx", "root"], "left")
            .filter(F.col("old").isNull() | (F.col("dist") < F.col("old")))
            .count()
        )
        state = nxt
        if improved == 0:
            return state
    raise RuntimeError(
        f"shortest_paths did not converge within {max_iter} rounds "
        "(fixpoint needs < |V| rounds); raise max_iter or pass "
        "max_iter=None for the unbounded loop"
    )


def shortest_paths_rounds(
    edges: DataFrame,
    sources: list[int],
    rounds: int,
    weighted: bool = True,
    directed: bool = False,
) -> DataFrame:
    """Distances using at most ``rounds`` edges (not necessarily the
    fixpoint) — the SQL-unrollable oracle twin of :func:`shortest_paths`."""
    if rounds < 1:
        raise ValueError("shortest_paths_rounds requires rounds >= 1")
    rel = _relax_edges(edges, weighted, directed)
    _guard_weights(rel)
    rel = fresh_checkpoint(rel)
    state = _init_state(edges.sparkSession, sources)
    for i in range(rounds):
        state = _relax_round(state, rel)
        if i % 4 == 3:  # bound the unrolled plan depth
            state = fresh_checkpoint(state)
    return state
