"""Link prediction over the undirected graph — common neighbors and
Adamic-Adar ([NR+]; the standard companion queries to the reference's
community/triangle family, SURVEY.md §2.4's neighbor-aggregation shape).

Both scores enumerate WEDGES (u - w - v): for every center w, each
unordered pair of w's neighbors is one wedge.  That is quadratic in the
center's degree, so at web scale a hub would try to emit deg² pairs —
the same blow-up the dedup/LSH operators cap per bucket.  ``max_degree``
caps the CENTERS (a wedge through a 10⁶-degree hub carries almost no
signal anyway: 1/ln(10⁶) ≈ 0.07), and the dropped-center count is
returned so the truncation is observable, never silent (the no-silent-
caps rule, operators/dedup.py).

Everything is built-in DataFrame ops: one self-join on the center key +
one aggregation; degrees are UNWEIGHTED neighbor counts (the classic
formula).  Scores:

- ``n_common``: |N(u) ∩ N(v)|
- ``adamic_adar``: Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w)) — centers need
  deg ≥ 2 to form a wedge, so ln(deg) ≥ ln 2 > 0 and the division is
  total;
- ``resource_alloc``: Σ_{w} 1 / deg(w) (same wedge aggregate, harsher
  hub discount);
- ``jaccard``: |N(u) ∩ N(v)| / |N(u) ∪ N(v)| — needs deg(u) and deg(v),
  two joins of the (already reduced) pair table against the degree
  table.  NOTE: with a ``max_degree`` cap the intersection COUNT only
  sees wedges through kept centers while the union uses full degrees,
  so capped jaccard is a lower bound (exact when nothing is dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from parallel_louvain_method_spark.operators.graph import (
    exclude_self_loops,
    symmetric_edges,
)


def adamic_adar(
    edges: DataFrame,
    max_degree: int | None = 10_000,
    min_common: int = 1,
    exclude_adjacent: bool = True,
    with_jaccard: bool = True,
) -> tuple[DataFrame, int]:
    """Returns ``(pairs, dropped_centers)``.

    ``pairs``: ``DataFrame[src, dst, n_common, jaccard, adamic_adar,
    resource_alloc]`` with ``src < dst``, one row per 2-hop pair sharing
    ≥ ``min_common`` neighbors (through centers of degree ≤
    ``max_degree``); ``with_jaccard=False`` drops the jaccard column and
    its two degree joins.
    ``exclude_adjacent`` drops pairs that are already edges — the link-
    PREDICTION semantics (candidates are non-edges); pass False to score
    existing edges too (embeddedness).  ``dropped_centers`` is the number
    of hub centers excluded by ``max_degree``."""
    # distinct on (src, dst): symmetric_edges keeps parallel edges with
    # DISTINCT weights (set semantics), which would double-count wedges —
    # neighbor sets are unweighted here
    sym = (
        exclude_self_loops(symmetric_edges(edges))
        .select("src", "dst")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = sym.groupBy(F.col("src").alias("w")).agg(
        F.count("*").alias("deg")
    )
    centers = deg.filter(F.col("deg") >= 2)
    dropped = 0
    if max_degree is not None:
        dropped = centers.filter(F.col("deg") > max_degree).count()
        centers = centers.filter(F.col("deg") <= max_degree)

    # neighbor lists keyed by center, joined with the center's degree so
    # the wedge join carries 1/ln(deg) along instead of re-joining later.
    # Materialized PRE-PARTITIONED on the wedge key: the self-join below
    # reads the same cache on both sides, and a persisted
    # hashpartitioning(w) satisfies both sides' requirement — zero
    # exchanges in the wedge stage itself (the n_parts shuffle here is
    # the one the join would have done anyway, paid once instead of
    # twice)
    n_parts = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    nbrs = (
        sym.select(F.col("src").alias("w"), F.col("dst").alias("u"))
        .join(centers, "w")
        .repartition(n_parts, "w")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    wedges = (
        nbrs.alias("a")
        .join(nbrs.alias("b"), "w")
        .filter(F.col("a.u") < F.col("b.u"))
        .select(
            F.col("a.u").alias("src"),
            F.col("b.u").alias("dst"),
            (F.lit(1.0) / F.log(F.col("a.deg"))).alias("aa_w"),
            (F.lit(1.0) / F.col("a.deg")).alias("ra_w"),
        )
    )
    pairs = wedges.groupBy("src", "dst").agg(
        F.count("*").alias("n_common"),
        F.sum("aa_w").alias("adamic_adar"),
        F.sum("ra_w").alias("resource_alloc"),
    )
    if min_common > 1:
        pairs = pairs.filter(F.col("n_common") >= min_common)
    if exclude_adjacent:
        existing = sym.filter(F.col("src") < F.col("dst"))
        pairs = pairs.join(existing, ["src", "dst"], "left_anti")
    # jaccard joins UNCAPPED degrees onto the reduced pair table (two
    # joins of the small-by-now pairs against the |V|-row degree table) —
    # skippable (with_jaccard=False) by callers that only want the wedge
    # aggregates, e.g. common_neighbors
    if with_jaccard:
        pairs = (
            pairs.join(
                deg.withColumnsRenamed({"w": "src", "deg": "deg_src"}), "src"
            )
            .join(
                deg.withColumnsRenamed({"w": "dst", "deg": "deg_dst"}), "dst"
            )
            .select(
                "src", "dst", "n_common",
                (
                    F.col("n_common")
                    / (F.col("deg_src") + F.col("deg_dst") - F.col("n_common"))
                ).alias("jaccard"),
                "adamic_adar", "resource_alloc",
            )
        )
    # result outlives the working caches (the dedup operators' lifetime
    # rule, operators/dedup.py): checkpoint, then release
    out = pairs.localCheckpoint(eager=True)
    nbrs.unpersist()
    sym.unpersist()
    return out, dropped


def common_neighbors(
    edges: DataFrame,
    max_degree: int | None = 10_000,
    min_common: int = 1,
    exclude_adjacent: bool = True,
) -> tuple[DataFrame, int]:
    """``(DataFrame[src, dst, n_common], dropped_centers)`` — the count
    without the weighted scores; same wedge plan, minus the jaccard
    degree joins (the wedge-side aa/ra sums cost nothing extra)."""
    pairs, dropped = adamic_adar(
        edges,
        max_degree=max_degree,
        min_common=min_common,
        exclude_adjacent=exclude_adjacent,
        with_jaccard=False,
    )
    return pairs.select("src", "dst", "n_common"), dropped
