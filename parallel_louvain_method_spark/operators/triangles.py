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

Two shuffle joins total; both run wholly in the JVM.  The simple edge set
and the degree table are computed ONCE per public entry point and shared
between orientation, coefficient denominators, and the count (ADVICE r4:
clustering_coefficient used to redo both O(E) passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from parallel_louvain_method_spark.operators.graph import symmetric_edges


def _simple_undirected(edges: DataFrame) -> DataFrame:
    """Simple undirected edge set: symmetric, self-loops dropped, parallel
    edges collapsed."""
    return (
        symmetric_edges(edges)
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _degrees(simple: DataFrame) -> DataFrame:
    """Simple degree per vertex (symmetric input: groupBy(src) is exact)."""
    return simple.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("d"))


def _orient(simple: DataFrame, deg: DataFrame) -> DataFrame:
    """Keep one direction per edge: src → dst iff (deg, id) of src is
    lower — the skew defense (no hub's out-list exceeds ~O(sqrt(m)))."""
    with_deg = (
        simple.join(
            deg.withColumnRenamed("v", "src").withColumnRenamed("d", "ds"),
            "src",
        )
        .join(
            deg.withColumnRenamed("v", "dst").withColumnRenamed("d", "dd"),
            "dst",
        )
    )
    return with_deg.filter(
        (F.col("ds") < F.col("dd"))
        | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst")


def _oriented(edges: DataFrame) -> DataFrame:
    """Simple undirected edges oriented by (degree, id)."""
    simple = _simple_undirected(edges)
    return _orient(simple, _degrees(simple))


def _closed_wedges(oriented: DataFrame) -> DataFrame:
    """Triangles as (a, b, c) rows: wedge at the lowest-ordered vertex,
    closed against the oriented edge set."""
    return (
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


def triangle_count(edges: DataFrame) -> int:
    """Total number of distinct triangles in the graph (exact)."""
    oriented = _oriented(edges).persist(StorageLevel.MEMORY_AND_DISK)
    n = _closed_wedges(oriented).count()
    oriented.unpersist()
    return n


def triangles_per_vertex(
    edges: DataFrame, oriented: DataFrame | None = None
) -> DataFrame:
    """``DataFrame[vtx, triangles]`` — per-vertex triangle participation.

    ``oriented``: pre-computed (and ideally persisted) output of the
    degree-ordered orientation; passed by callers that already built it
    (``clustering_coefficient``) so the simple/degree passes run once.
    """
    own = oriented is None
    if own:
        oriented = _oriented(edges).persist(StorageLevel.MEMORY_AND_DISK)
    per_vtx = (
        _closed_wedges(oriented)
        .select(F.explode(F.array("a", "b", "c")).alias("vtx"))
        .groupBy("vtx")
        .agg(F.count("*").alias("triangles"))
    )
    if own:
        oriented.unpersist()
    return per_vtx


def clustering_coefficient(
    edges: DataFrame, include_triangles: bool = False
) -> DataFrame:
    """Local clustering coefficient per vertex:
    ``coeff(v) = 2·triangles(v) / (d(v)·(d(v)−1))``, 0.0 below degree 2.

    ``DataFrame[vtx: long, coeff: double]`` over every vertex with at
    least one edge; with ``include_triangles`` a ``triangles: long``
    column is appended (0 for triangle-free vertices) so callers needing
    the global count too can derive it as ``sum(triangles) / 3`` without
    re-enumerating (ADVICE r4: the CLI used to run both shuffle joins
    twice).

    Composes the degree-ordered triangle enumeration (skew-safe: no hub
    enumerates its neighborhood squared) with the simple-degree
    aggregation.  The simple edge set is materialized ONCE
    (``fresh_checkpoint`` — stats-free, result-lifetime blocks) and feeds
    degrees, orientation, and the wedge joins; nothing per-row in Python.
    """
    from parallel_louvain_method_spark.plans.lineage import fresh_checkpoint

    simple = fresh_checkpoint(_simple_undirected(edges))
    deg = _degrees(simple)
    # checkpointed: the wedge query references `oriented` on THREE sides
    # with three different join keys, so an unmaterialized plan re-runs
    # the orientation join (and the degree agg under it) once per side
    oriented = fresh_checkpoint(_orient(simple, deg))
    tri = triangles_per_vertex(edges, oriented=oriented)
    out = deg.withColumnRenamed("v", "vtx").join(tri, "vtx", "left").select(
        F.col("vtx").cast("long").alias("vtx"),
        F.when(
            F.col("d") >= 2,
            F.lit(2.0)
            * F.coalesce(F.col("triangles"), F.lit(0))
            / (F.col("d") * (F.col("d") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("coeff"),
        F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
    )
    return out if include_triangles else out.drop("triangles")


def four_cycle_count(
    edges: DataFrame, max_center_degree: int | None = None
) -> tuple[int, int]:
    """Exact number of distinct 4-cycles (rectangles) in the simple
    undirected graph, the next motif up from ``triangle_count``.

    Co-degree identity: every 4-cycle ``u-v-w-x-u`` has two diagonals
    ``{u,w}`` and ``{v,x}``; a diagonal pair with ``c`` common neighbors
    closes ``C(c,2)`` rectangles, and summing over all unordered pairs
    counts each rectangle exactly twice, so

        ``#C4 = Σ_pairs c·(c-1) / 4``.

    Plan: one self-join of the neighbor table on the wedge center + one
    aggregation to co-degrees + one scalar sum — the same wedge shape as
    link prediction (operators/linkpred.py), which is the skew hot spot:
    a center of degree d emits ``C(d,2)`` wedge rows.  Unlike triangle
    counting, the degree orientation cannot prune rectangle wedges
    without undercounting, so the hub defense here is the observable-cap
    rule (operators/dedup.py): ``max_center_degree`` drops hub CENTERS
    and the dropped count is returned — the result is then a lower
    bound.  Default is exact (no cap).

    Returns ``(n_four_cycles, dropped_centers)``.
    """
    simple = _simple_undirected(edges).persist(StorageLevel.MEMORY_AND_DISK)
    nbrs = simple.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    dropped = 0
    if max_center_degree is not None:
        deg = _degrees(simple)
        dropped = deg.filter(F.col("d") > max_center_degree).count()
        nbrs = nbrs.join(
            deg.filter(F.col("d") <= max_center_degree).select(
                F.col("v").alias("w")
            ),
            "w",
        )
    n_parts = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    nbrs = nbrs.repartition(n_parts, "w").persist(StorageLevel.MEMORY_AND_DISK)
    codeg = (
        nbrs.alias("a")
        .join(nbrs.alias("b"), "w")
        .filter(F.col("a.u") < F.col("b.u"))
        .groupBy(F.col("a.u").alias("p"), F.col("b.u").alias("q"))
        .agg(F.count("*").alias("c"))
    )
    row = codeg.agg(
        F.sum(F.col("c") * (F.col("c") - F.lit(1))).alias("s")
    ).first()
    nbrs.unpersist()
    simple.unpersist()
    s = row["s"] or 0
    return int(s) // 4, dropped


def triad_census(edges: DataFrame) -> DataFrame:
    """Directed triangle census: classify every triangle of the
    UNDERLYING undirected graph by its arc pattern — one row
    ``DataFrame[n_cyclic, n_transitive, n_mixed]``.

    * cyclic — all three sides one-way, arcs forming a directed cycle
      (a→b→c→a): feedback loops / circular dependencies;
    * transitive — all three sides one-way, one vertex pointing at both
      others whose arc agrees (a→b, a→c, b→c): hierarchy-consistent;
    * mixed — at least one side reciprocated (both arcs present).

    Cyclic vs transitive is THE local signature of hierarchy in a
    directed link graph (dependency / citation / precedence edges): a
    pure hierarchy has zero cyclic triads, and the cyclic fraction
    measures how far the graph is from a partial order.

    Plan: pair flags (one row per underlying edge: forward/backward arc
    present) via one canonical-key aggregation; triangles enumerated
    once with the same degree-ordered two-join as
    :func:`triangle_count`; three equi-joins re-attach the side flags
    (no fan-out — each join key is one triangle side); classification
    and the final count are pure expressions.  All JVM-side.
    """
    darc = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    pf = (
        darc.groupBy(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
        )
        .agg(
            F.max((F.col("src") < F.col("dst")).cast("int")).alias("fwd"),
            F.max((F.col("src") > F.col("dst")).cast("int")).alias("rev"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    simple = pf.select(F.col("lo").alias("src"), F.col("hi").alias("dst")).union(
        pf.select(F.col("hi").alias("src"), F.col("lo").alias("dst"))
    )
    tri = _closed_wedges(_orient(simple, _degrees(simple)))

    def _side(t: DataFrame, x: str, y: str, tag: str) -> DataFrame:
        side = pf.select(
            F.col("lo").alias(f"lo_{tag}"),
            F.col("hi").alias(f"hi_{tag}"),
            F.col("fwd").alias(f"fwd_{tag}"),
            F.col("rev").alias(f"rev_{tag}"),
        )
        t = t.withColumn(f"lo_{tag}", F.least(x, y)).withColumn(
            f"hi_{tag}", F.greatest(x, y)
        )
        return t.join(side, [f"lo_{tag}", f"hi_{tag}"])

    flagged = _side(_side(_side(tri, "a", "b", "ab"), "b", "c", "bc"), "a", "c", "ac")

    def _arc(x: str, y: str, tag: str):
        """1 iff the arc x→y exists (flags are stored on the canonical
        lo→hi orientation)."""
        return F.when(
            F.col(x) < F.col(y), F.col(f"fwd_{tag}")
        ).otherwise(F.col(f"rev_{tag}"))

    f_ab, f_ba = _arc("a", "b", "ab"), _arc("b", "a", "ab")
    f_bc, f_cb = _arc("b", "c", "bc"), _arc("c", "b", "bc")
    f_ac, f_ca = _arc("a", "c", "ac"), _arc("c", "a", "ac")
    mixed = (
        ((f_ab == 1) & (f_ba == 1))
        | ((f_bc == 1) & (f_cb == 1))
        | ((f_ac == 1) & (f_ca == 1))
    )
    cyclic = ((f_ab == 1) & (f_bc == 1) & (f_ca == 1)) | (
        (f_ba == 1) & (f_cb == 1) & (f_ac == 1)
    )
    out = flagged.agg(
        F.coalesce(
            F.sum((~mixed & cyclic).cast("long")), F.lit(0)
        ).alias("n_cyclic"),
        F.coalesce(
            F.sum((~mixed & ~cyclic).cast("long")), F.lit(0)
        ).alias("n_transitive"),
        F.coalesce(F.sum(mixed.cast("long")), F.lit(0)).alias("n_mixed"),
    )
    rows = out.localCheckpoint(eager=True)
    pf.unpersist()
    return rows


def clique4_count(edges: DataFrame) -> int:
    """Exact number of 4-cliques (K4 subgraphs) — the next motif up from
    :func:`triangle_count`, same degree-ordered discipline.

    Every K4 {a,b,c,d} has exactly one labeling with a < b < c < d in the
    orientation's total (degree, id) order, so it is counted once: as the
    triangle (a, b, c) extended by the common oriented out-neighbor d of
    all three.  The extension joins each triangle against the SHORT
    oriented out-list of its highest-ordered vertex c (O(sqrt m) even at
    hubs), then keeps d only when (a, d) and (b, d) are also oriented
    edges — two semi-joins.  Four shuffle joins total beyond the triangle
    enumeration; all JVM-side, skew-bounded by the same orientation
    argument as the triangle pass.
    """
    oriented = _oriented(edges).persist(StorageLevel.MEMORY_AND_DISK)
    tri = _closed_wedges(oriented)  # (a, b, c) with a<b<c in orient order
    cand = tri.join(
        oriented.select(F.col("src").alias("c"), F.col("dst").alias("d")),
        "c",
    )
    n = (
        cand.join(
            oriented.select(F.col("src").alias("a"), F.col("dst").alias("d")),
            ["a", "d"],
            "left_semi",
        )
        .join(
            oriented.select(F.col("src").alias("b"), F.col("dst").alias("d")),
            ["b", "d"],
            "left_semi",
        )
        .count()
    )
    oriented.unpersist()
    return n


def clique4_count_df(edges: DataFrame) -> DataFrame:
    """One-row DataFrame twin of :func:`clique4_count` (driver-gate
    shape: the count as a column, no driver-side action)."""
    oriented = _oriented(edges)
    from parallel_louvain_method_spark.plans.lineage import fresh_checkpoint

    # referenced on four join sides -> materialize once (house rule)
    oriented = fresh_checkpoint(oriented)
    tri = _closed_wedges(oriented)
    cand = tri.join(
        oriented.select(F.col("src").alias("c"), F.col("dst").alias("d")),
        "c",
    )
    kept = cand.join(
        oriented.select(F.col("src").alias("a"), F.col("dst").alias("d")),
        ["a", "d"],
        "left_semi",
    ).join(
        oriented.select(F.col("src").alias("b"), F.col("dst").alias("d")),
        ["b", "d"],
        "left_semi",
    )
    return kept.agg(F.count("*").cast("long").alias("n_clique4"))


def incremental_triangle_delta(
    old_edges: DataFrame, new_edges: DataFrame
) -> int:
    """Exact number of triangles CREATED by a batch of added edges —
    T(old ∪ new) − T(old) — touching only the batch's neighborhood, never
    re-enumerating the old graph's triangles.

    Every created triangle contains ≥1 new edge; classify by how many:

    - 1 new edge (u,v) + 2 old: common OLD neighbors of u and v — a join
      of the batch against the old adjacency, O(|batch| · deg);
    - 2 new edges meeting at w + 1 old closing edge (u,v): new-new wedges
      at w semi-joined against the old edge set;
    - 3 new edges: the ordinary oriented count on the (tiny) batch graph.

    The three cases partition the created triangles (a triangle has one
    fixed number of new edges), so the delta is their plain sum.  New
    edges already present in the old graph are ignored (re-adding an edge
    creates nothing); duplicates inside the batch are collapsed.
    """
    old_s = _simple_undirected(old_edges).persist(StorageLevel.MEMORY_AND_DISK)
    old_canon = old_s.filter(F.col("src") < F.col("dst"))
    new_s = (
        _simple_undirected(new_edges)
        .join(old_s, ["src", "dst"], "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    new_canon = new_s.filter(F.col("src") < F.col("dst"))
    # case 1: new (u,v), old (u,w) and (v,w)
    c1 = (
        new_canon.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(
            old_s.select(F.col("src").alias("u"), F.col("dst").alias("w")),
            "u",
        )
        .join(
            old_s.select(F.col("src").alias("v"), F.col("dst").alias("w")),
            ["v", "w"],
        )
        .count()
    )
    # case 2: new (u,w) and (v,w) meeting at w, old closing edge (u,v)
    c2 = (
        new_s.select(F.col("dst").alias("w"), F.col("src").alias("u"))
        .join(
            new_s.select(F.col("dst").alias("w"), F.col("src").alias("v")),
            "w",
        )
        .filter(F.col("u") < F.col("v"))
        .join(
            old_canon.select(
                F.col("src").alias("u"), F.col("dst").alias("v")
            ),
            ["u", "v"],
            "left_semi",
        )
        .count()
    )
    # case 3: triangles entirely inside the batch
    c3 = _closed_wedges(_orient(new_s, _degrees(new_s))).count()
    old_s.unpersist()
    new_s.unpersist()
    return c1 + c2 + c3


def graphlet_counts(edges: DataFrame) -> DataFrame:
    """Connected 3- and 4-vertex path/star graphlet census in ONE row:
    ``(n_wedges, n_claws, n_paths3, n_triangles)``.

    Everything except the triangle count is closed-form over degrees —
    wedges Σ C(d,2), claws (3-stars) Σ C(d,3), and 3-edge paths
    Σ_{(u,v)∈E} (d_u−1)(d_v−1) − 3·T (each triangle is counted three
    times by the edge-product form and must be subtracted) — so the only
    join is the degree lookup plus the skew-bounded oriented triangle
    join already gated as A13.  Exact integers throughout; the standard
    motif baseline against which triad/K4 enrichment is normalized.
    """
    simple = _simple_undirected(edges).persist(StorageLevel.MEMORY_AND_DISK)
    deg = _degrees(simple)
    d = F.col("d").cast("double")
    deg_aggs = deg.agg(
        F.sum(d * (d - 1) / 2).cast("long").alias("n_wedges"),
        F.sum(d * (d - 1) * (d - 2) / 6).cast("long").alias("n_claws"),
    )
    canon = simple.filter(F.col("src") < F.col("dst"))
    pair_prod = (
        canon.join(
            deg.select(F.col("v").alias("src"), F.col("d").alias("du")), "src"
        )
        .join(
            deg.select(F.col("v").alias("dst"), F.col("d").alias("dv")), "dst"
        )
        .agg(
            F.sum(
                (F.col("du") - 1).cast("long") * (F.col("dv") - 1).cast("long")
            ).alias("edge_prod")
        )
    )
    n_tri = _closed_wedges(_orient(simple, deg)).count()
    simple.unpersist()
    return (
        deg_aggs.crossJoin(F.broadcast(pair_prod))
        .select(
            "n_wedges",
            "n_claws",
            (F.col("edge_prod") - 3 * n_tri).alias("n_paths3"),
            F.lit(n_tri).cast("long").alias("n_triangles"),
        )
    )


def weighted_clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Barrat weighted clustering coefficient per vertex (Barrat,
    Barthelemy, Pastor-Satorras & Vespignani 2004)::

        C_w(v) = 1 / (s_v · (k_v − 1)) · Σ_{(u,h) ordered neighbor pairs}
                 a_vu a_vh a_uh (w_vu + w_vh) / 2
               = 1 / (s_v · (k_v − 1)) · Σ_{triangles (v,u,h)} (w_vu + w_vh)

    (the paper's sum runs over ORDERED pairs, so each triangle at v
    contributes its incident-weight average twice — dropping the ordered
    double and the /2 together is the exact same number)

    where s_v is the strength (weighted degree) and k_v the simple
    degree.  Reduces exactly to the unweighted local coefficient on
    unit weights (pinned in pytest).  Vertices with k < 2 are emitted
    with coefficient 0 (the A15 convention).

    Plan: the same degree-ordered oriented triangle join as A13/A15 but
    carrying the three edge weights; each closed wedge (a,b,c) emits its
    three per-vertex contributions in one select, then a vertex groupBy
    and a strength/degree join — hub cost stays bounded by the
    orientation argument, weights ride for free.
    """
    # weighted simple undirected: parallel (src,dst) duplicates collapse
    # to their max weight so orientation and weights stay consistent
    sym_w = (
        symmetric_edges(edges)
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    simple = sym_w.select("src", "dst")
    deg = _degrees(simple)
    strength = sym_w.groupBy(F.col("src").alias("v")).agg(
        F.sum("w").alias("s")
    )
    oriented = _orient(simple, deg).join(sym_w, ["src", "dst"])
    tri = (
        oriented.select(
            F.col("src").alias("a"), F.col("dst").alias("b"),
            F.col("w").alias("wab"),
        )
        .join(
            oriented.select(
                F.col("src").alias("b"), F.col("dst").alias("c"),
                F.col("w").alias("wbc"),
            ),
            "b",
        )
        .join(
            oriented.select(
                F.col("src").alias("a"), F.col("dst").alias("c"),
                F.col("w").alias("wac"),
            ),
            ["a", "c"],
        )
    )
    contrib = (
        tri.select(
            F.col("a").alias("v"),
            (F.col("wab") + F.col("wac")).alias("t"),
        )
        .union(
            tri.select(
                F.col("b").alias("v"),
                (F.col("wab") + F.col("wbc")).alias("t"),
            )
        )
        .union(
            tri.select(
                F.col("c").alias("v"),
                (F.col("wbc") + F.col("wac")).alias("t"),
            )
        )
        .groupBy("v")
        .agg(F.sum("t").alias("tw"))
    )
    out = (
        deg.join(strength, "v")
        .join(contrib, "v", "left")
        .select(
            F.col("v").alias("vtx"),
            F.when(
                F.col("d") >= 2,
                F.coalesce(F.col("tw"), F.lit(0.0))
                / (F.col("s") * (F.col("d") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("coeff_w"),
        )
    )
    out = out.localCheckpoint(eager=True)
    sym_w.unpersist()
    return out
