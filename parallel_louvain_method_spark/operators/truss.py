"""Edge support (embeddedness) and k-truss decomposition.

The edge-level companion to k-core (operators/kcore.py): ``support(e)``
is the number of triangles containing e, and the k-truss is the maximal
subgraph whose every edge closes ≥ k−2 triangles WITHIN the subgraph —
the standard cohesive-subgraph ladder (Cohen 2008, "Trusses: cohesive
subgraphs for social network analysis").  Link-graph usage: support-0
edges are bridges/noise candidates, the 4-truss is the classic
"communities without whiskers" filter before Louvain.

Built entirely on the degree-ordered triangle machinery
(operators/triangles.py): every triangle is enumerated exactly once at
its lowest-(degree, id) vertex, so no hub ever squares its neighborhood
— the skew posture is inherited, and each peel round is two JVM-side
shuffle joins over a monotonically shrinking edge set.  The reference
has no truss operator; the conventions (simple graph, self-loops
dropped) follow its triangle semantics (src/graph.h:25 set adjacency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .triangles import _closed_wedges, _degrees, _orient, _simple_undirected
from ..plans.lineage import fresh_checkpoint


def _canonical(edges: DataFrame) -> DataFrame:
    """Canonical simple edge set: ``DataFrame[u, v]`` with u < v."""
    return (
        _simple_undirected(edges)
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )


def _support_of(canon: DataFrame) -> DataFrame:
    """Per-edge triangle count over a canonical edge set.

    Rebuilds the symmetric view + degree orientation of the CURRENT
    subgraph (a truss peel changes degrees, so the orientation must
    follow), enumerates each triangle once, explodes its three edges
    back to canonical (u, v) and counts.  Triangle-free edges keep a
    0 row via the left join.
    """
    sym = canon.unionByName(
        canon.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).select(F.col("u").alias("src"), F.col("v").alias("dst"))
    tri = _closed_wedges(_orient(sym, _degrees(sym)))
    per_edge = (
        tri.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("a", "b").alias("u"),
                        F.greatest("a", "b").alias("v"),
                    ),
                    F.struct(
                        F.least("b", "c").alias("u"),
                        F.greatest("b", "c").alias("v"),
                    ),
                    F.struct(
                        F.least("a", "c").alias("u"),
                        F.greatest("a", "c").alias("v"),
                    ),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .groupBy("u", "v")
        .agg(F.count("*").alias("support"))
    )
    return canon.join(per_edge, ["u", "v"], "left").select(
        "u", "v", F.coalesce("support", F.lit(0)).cast("long").alias("support")
    )


def edge_support(edges: DataFrame) -> DataFrame:
    """``DataFrame[u: long, v: long, support: long]`` — triangles through
    each canonical simple edge (u < v; self-loops excluded)."""
    canon = _canonical(edges).select(
        F.col("u").cast("long").alias("u"), F.col("v").cast("long").alias("v")
    )
    return _support_of(canon)


def ktruss(
    edges: DataFrame, k: int, max_iter: int | None = None
) -> DataFrame:
    """Edges of the k-truss: ``DataFrame[u, v, support]`` (u < v), where
    every surviving edge closes ≥ k−2 triangles inside the surviving
    subgraph, with its support AT the fixpoint.

    ``k >= 2`` (the 2-truss is the whole simple graph; k=3 drops
    triangle-free edges).  ``max_iter`` mirrors :func:`..kcore.kcore`:
    when given and exhausted before the fixpoint the peel RAISES — a
    silent cap would return a superset of the true truss.  The default
    peels to the fixpoint, which terminates: the edge count strictly
    decreases every non-final round (O(|E|) rounds worst case, e.g. a
    path of stacked triangles).
    """
    if k < 2:
        raise ValueError("ktruss requires k >= 2")
    canon = fresh_checkpoint(
        _canonical(edges).select(
            F.col("u").cast("long").alias("u"),
            F.col("v").cast("long").alias("v"),
        )
    )
    n_prev = canon.count()
    it = 0
    while True:
        it += 1
        sup = _support_of(canon)
        if k == 2:
            return sup
        kept = fresh_checkpoint(sup.filter(F.col("support") >= k - 2))
        n = kept.count()
        if n == n_prev or n == 0:
            # no edge removed: the supports were computed on exactly the
            # surviving subgraph, so they are the fixpoint supports
            return kept
        if max_iter is not None and it >= max_iter:
            raise RuntimeError(
                f"ktruss(k={k}) did not reach a fixpoint in {max_iter} "
                f"rounds ({n} edges still live, was {n_prev}); raise "
                "max_iter or pass max_iter=None for the unbounded peel"
            )
        canon, n_prev = kept.select("u", "v"), n


def ktruss_peel(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Survivors of exactly ``rounds`` support-filter iterations (not
    necessarily a fixpoint) — the SQL-unrollable oracle twin of
    :func:`ktruss`, same pattern as :func:`..kcore.kcore_peel`.
    Returns ``DataFrame[u: long, v: long]``.
    """
    if k < 2 or rounds < 1:
        raise ValueError("ktruss_peel requires k >= 2 and rounds >= 1")
    canon = _canonical(edges).select(
        F.col("u").cast("long").alias("u"), F.col("v").cast("long").alias("v")
    )
    for i in range(rounds):
        canon = _support_of(canon).filter(
            F.col("support") >= k - 2
        ).select("u", "v")
        if i < rounds - 1:
            canon = fresh_checkpoint(canon)
    return canon
