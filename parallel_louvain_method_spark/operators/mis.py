"""Maximal independent set (Luby) and greedy graph coloring
(Jones-Plassmann) — [NR+] link-graph analytics family, same posture as
the other iterative vertex-set operators (kcore.py, components.py).

An MIS is the classic symmetry-breaking primitive (parallel scheduling,
conflict-free update ordering, the seed step of many distributed greedy
algorithms); JP coloring partitions the vertices into independent color
classes by extracting one MIS per round from the residual graph.

Luby's round, determinized: every live vertex draws a priority and joins
the MIS iff its (priority, id) key is smaller than every live
neighbor's.  The "draw" is a seeded integer hash — the same
bit-reproducible, ANSI-overflow-guarded discipline as walks.py — and the
per-round total order is packed into ONE BIGINT::

    key(v, r) = ((v * mixer_r + r * B) % M) * 2^31 + v

``M = 2^31 - 1``, ids below 2^31 (guarded), so key < 2^62: a single
monotone encoding of (priority, id) that both Spark and a SQL oracle
compare natively — no struct mins.  The seed and the round number enter
``mixer_r`` as MULTIPLIERS on the vertex id (an additive term would
shift all priorities equally and never re-break ties across rounds; cf.
walks._rank_hash, which fixed the same bug for neighbor ranking).

Scale design per round (Luby expects O(log |V|) rounds; at least the
global minimum-key vertex enters the MIS every round, so termination is
O(|V|) worst case — unbounded by default, RAISE on ``max_iter``
exhaustion, the kcore.py contract):

- one neighbor-min aggregation over the live edge set (map-side
  combined; a hub's incoming keys reduce inside partitions first) plus
  shrink-only semi-/anti-joins — no data is ever re-expanded;
- the live tables are re-checkpointed per round with
  ``fresh_checkpoint`` (stats-free leaves, plans/lineage.py);
- convergence is the live-vertex COUNT already needed for the loop —
  one action per round, no set comparison.

:func:`mis_rounds` / :func:`coloring_rounds` are the fixed-round oracle
twins (the ``kcore80_peel2`` pattern): exactly ``rounds`` Luby rounds,
SQL-unrollable with one neighbor-min + one key comparison per round.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, functions as F

from parallel_louvain_method_spark.operators.kcore import _simple_sym
from parallel_louvain_method_spark.plans.lineage import fresh_checkpoint

_A, _B, _C = 2654435761, 40503, 69069
_M = 2147483647  # 2^31 - 1


def _mixer(round_no: int, seed: int) -> int:
    """Per-round multiplicative priority mixer in [1, _M).

    (seed + round) is multiplied by the LARGE constant ``_A`` (not the
    small ``_C``): a small multiplier moves the mixer by only ~69k per
    seed/round step, which barely perturbs ``v * mixer mod M`` for small
    ids and leaves the priority ORDER unchanged — caught by the
    seed-sensitivity pytest; ``_A mod M`` jumps ~5*10^8 per step."""
    m = (_C + ((seed + round_no) * _A + _B) % _M) % _M
    return m if m != 0 else 1


def _key(v, round_no: int, seed: int):
    """Packed (priority, id) BIGINT total order for round ``round_no``."""
    return (
        F.pmod(v * F.lit(_mixer(round_no, seed)) + F.lit(round_no * _B),
               F.lit(_M))
        * F.lit(1 << 31)
        + v
    )


def _guard_ids(sym: DataFrame, what: str) -> None:
    row = sym.agg(
        F.max(F.greatest("src", "dst")).alias("mx"),
        F.min(F.least("src", "dst")).alias("mn"),
    ).first()
    if row["mn"] is not None and row["mn"] < 0:
        raise ValueError(
            f"{what} requires non-negative vertex ids (min id {row['mn']});"
            " renumber with graph.dense_ids first"
        )
    if row["mx"] is not None and row["mx"] >= (1 << 31):
        raise ValueError(
            f"{what}: vertex ids must stay below 2^31 for the packed "
            f"priority key (max id {row['mx']}); renumber with "
            "graph.dense_ids first"
        )


def _luby_round(
    live_v: DataFrame, live_e: DataFrame, round_no: int, seed: int
) -> DataFrame:
    """One determinized Luby selection: vertices of ``live_v`` whose key
    is smaller than every ``live_e``-neighbor's key (residual-isolated
    vertices have no neighbor row and always win)."""
    keyed = live_v.select("vtx", _key(F.col("vtx"), round_no, seed).alias("k"))
    nbr_min = (
        # live_v/live_e are stats-free checkpoint leaves: hash-join with
        # the per-vertex key table as build side instead of the planner's
        # default sort-merge of both sides every round
        live_e.join(
            keyed.select(
                F.col("vtx").alias("dst"), F.col("k").alias("nk")
            ).hint("shuffle_hash"),
            "dst",
        )
        .groupBy(F.col("src").alias("vtx"))
        .agg(F.min("nk").alias("nk"))
    )
    return (
        keyed.join(nbr_min, "vtx", "left")
        .filter(F.col("nk").isNull() | (F.col("k") < F.col("nk")))
        .select("vtx")
    )


def maximal_independent_set(
    edges: DataFrame, seed: int = 0, max_iter: int | None = None
) -> DataFrame:
    """Deterministic Luby MIS over the simple undirected graph:
    ``DataFrame[vtx: long]`` — an independent set (no two selected
    vertices adjacent) that is maximal (every unselected vertex has a
    selected neighbor).  Isolated input vertices never appear (the edge
    table defines the universe, as everywhere in this package).

    Bit-reproducible given (graph, seed); different seeds explore
    different maximal sets.  ``max_iter`` bounds the rounds and RAISES
    on exhaustion — never a silent non-maximal subset.
    """
    sym = _simple_sym(edges)
    _guard_ids(sym, "maximal_independent_set")
    live_e = fresh_checkpoint(sym)
    live_v = fresh_checkpoint(live_e.select(F.col("src").alias("vtx")).distinct())
    spark = edges.sparkSession
    out: DataFrame | None = None
    rounds = range(max_iter) if max_iter is not None else itertools.count()
    for r in rounds:
        if live_v.count() == 0:
            break
        sel = _luby_round(live_v, live_e, r, seed)
        # remove the MIS and its neighborhood from the residual graph
        gone = sel.unionByName(
            live_e.join(
                sel.withColumnRenamed("vtx", "src"), "src", "left_semi"
            ).select(F.col("dst").alias("vtx"))
        ).distinct()
        sel = fresh_checkpoint(sel)
        out = sel if out is None else fresh_checkpoint(out.unionByName(sel))
        live_v = fresh_checkpoint(live_v.join(gone, "vtx", "left_anti"))
        live_e = fresh_checkpoint(
            live_e.join(
                live_v.withColumnRenamed("vtx", "src"), "src", "left_semi"
            ).join(live_v.withColumnRenamed("vtx", "dst"), "dst", "left_semi")
        )
    else:
        if live_v.count() != 0:  # the last round may have just finished it
            raise RuntimeError(
                f"maximal_independent_set did not empty the graph within "
                f"{max_iter} rounds (O(|V|) worst case); raise max_iter or "
                "pass max_iter=None for the unbounded loop"
            )
    if out is None:
        return spark.createDataFrame([], "vtx long")
    return out.select(F.col("vtx").cast("long").alias("vtx"))


def mis_rounds(edges: DataFrame, rounds: int, seed: int = 0) -> DataFrame:
    """Vertices selected in the first ``rounds`` Luby rounds (independent
    but not necessarily maximal) — the SQL-unrollable oracle twin of
    :func:`maximal_independent_set`."""
    if rounds < 1:
        raise ValueError("mis_rounds requires rounds >= 1")
    sym = _simple_sym(edges)
    _guard_ids(sym, "mis_rounds")
    live_e = fresh_checkpoint(sym)
    live_v = live_e.select(F.col("src").alias("vtx")).distinct()
    out: DataFrame | None = None
    for r in range(rounds):
        sel = _luby_round(live_v, live_e, r, seed)
        out = sel if out is None else out.unionByName(sel)
        if r == rounds - 1:
            break
        gone = sel.unionByName(
            live_e.join(
                sel.withColumnRenamed("vtx", "src"), "src", "left_semi"
            ).select(F.col("dst").alias("vtx"))
        ).distinct()
        live_v = fresh_checkpoint(live_v.join(gone, "vtx", "left_anti"))
        live_e = fresh_checkpoint(
            live_e.join(
                live_v.withColumnRenamed("vtx", "src"), "src", "left_semi"
            ).join(live_v.withColumnRenamed("vtx", "dst"), "dst", "left_semi")
        )
    return out.select(F.col("vtx").cast("long").alias("vtx"))


def greedy_coloring(
    edges: DataFrame, seed: int = 0, max_iter: int | None = None
) -> DataFrame:
    """Jones-Plassmann greedy coloring: ``DataFrame[vtx: long, color:
    int]`` — color r = the MIS extracted from the round-r residual graph
    (only the MIS leaves per round, unlike :func:`maximal_independent_set`
    which also removes its neighborhood).  Proper by construction: a
    color class is independent, and adjacent vertices can never win the
    same round.  Colors used <= Δ+1; rounds = colors used, so cliques
    are the worst case (one vertex per round) — ``max_iter`` RAISES on
    exhaustion, the usual contract."""
    sym = _simple_sym(edges)
    _guard_ids(sym, "greedy_coloring")
    live_e = fresh_checkpoint(sym)
    live_v = fresh_checkpoint(live_e.select(F.col("src").alias("vtx")).distinct())
    spark = edges.sparkSession
    out: DataFrame | None = None
    rounds = range(max_iter) if max_iter is not None else itertools.count()
    for r in rounds:
        if live_v.count() == 0:
            break
        sel = fresh_checkpoint(_luby_round(live_v, live_e, r, seed))
        colored = sel.withColumn("color", F.lit(r).cast("int"))
        out = (
            colored if out is None
            else fresh_checkpoint(out.unionByName(colored))
        )
        live_v = fresh_checkpoint(live_v.join(sel, "vtx", "left_anti"))
        live_e = fresh_checkpoint(
            live_e.join(
                live_v.withColumnRenamed("vtx", "src"), "src", "left_semi"
            ).join(live_v.withColumnRenamed("vtx", "dst"), "dst", "left_semi")
        )
    else:
        if live_v.count() != 0:  # the last round may have just finished it
            raise RuntimeError(
                f"greedy_coloring did not color the graph within {max_iter} "
                "rounds (rounds = colors used; cliques need one per vertex); "
                "raise max_iter or pass max_iter=None for the unbounded loop"
            )
    if out is None:
        return spark.createDataFrame([], "vtx long, color int")
    return out.select(
        F.col("vtx").cast("long").alias("vtx"),
        F.col("color").cast("int").alias("color"),
    )


def coloring_rounds(edges: DataFrame, rounds: int, seed: int = 0) -> DataFrame:
    """Vertices colored in the first ``rounds`` JP rounds — the
    SQL-unrollable oracle twin of :func:`greedy_coloring` (uncolored
    residual vertices are simply absent)."""
    if rounds < 1:
        raise ValueError("coloring_rounds requires rounds >= 1")
    sym = _simple_sym(edges)
    _guard_ids(sym, "coloring_rounds")
    live_e = fresh_checkpoint(sym)
    live_v = live_e.select(F.col("src").alias("vtx")).distinct()
    out: DataFrame | None = None
    for r in range(rounds):
        sel = _luby_round(live_v, live_e, r, seed)
        colored = sel.withColumn("color", F.lit(r).cast("int"))
        out = colored if out is None else out.unionByName(colored)
        if r == rounds - 1:
            break
        sel = fresh_checkpoint(sel)
        live_v = fresh_checkpoint(live_v.join(sel, "vtx", "left_anti"))
        live_e = fresh_checkpoint(
            live_e.join(
                live_v.withColumnRenamed("vtx", "src"), "src", "left_semi"
            ).join(live_v.withColumnRenamed("vtx", "dst"), "dst", "left_semi")
        )
    return out.select(
        F.col("vtx").cast("long").alias("vtx"),
        F.col("color").cast("int").alias("color"),
    )
