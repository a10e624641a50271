"""Deterministic random walks — DeepWalk-style corpus generation.

The input to every graph-embedding trainer (DeepWalk, node2vec at p=q=1)
is a corpus of fixed-length random walks.  At 10^12-edge scale the walk
generator IS the pipeline bottleneck, and it must be deterministic to be
resumable and oracle-checkable, so the "randomness" here is a seeded
integer hash of (walk_id, step, current vertex) — a splitmix-style LCG
mix kept inside ±2^63 so the SAME closed-form expression evaluates
identically in Spark (ANSI, no overflow) and any SQL oracle.

Per step the frontier does two vertex-keyed joins, both JVM-side:
state ⋈ degree (to size the modulus) and (cur, idx) ⋈ indexed adjacency
(to pick the neighbor) — no Python, no explosion (the adjacency join is
equi on (src, idx), never a fan-out over a hub's whole list).  State is
one row per live walk; walk storage is O(walks), independent of degree
skew.  The reference has no walk generator; conventions (simple
undirected graph, self-loops dropped) follow its adjacency-set semantics
(src/graph.h:25).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .triangles import _simple_undirected
from ..plans.lineage import fresh_checkpoint

# LCG-style mixing constants (Knuth / Numerical Recipes lineage); the mix
# stays within |operands| * 2^32 < 2^63 for vertex ids below ~2^31 and
# walk ids below ~2^31 — documented bound, checked at build time.
_A, _B, _C = 2654435761, 40503, 69069
_M = 2147483647  # 2^31 - 1


def _choice_hash(walk_id, step: int, cur, seed: int):
    """Deterministic per-(walk, step, vertex) choice in [0, _M)."""
    return F.pmod(
        walk_id * F.lit(_A) + F.lit(step * _B) + cur * F.lit(_C) + F.lit(seed),
        F.lit(_M),
    )


def _rank_hash(src, hop: int, dst, seed: int):
    """Deterministic per-(src, hop, neighbor) RANKING key in [0, _M).

    Unlike :func:`_choice_hash` (whose output feeds a modulus, where an
    additive seed genuinely moves the choice), a ranking key must let the
    seed PERMUTE a vertex's neighbor order — an additive constant shifts
    every neighbor's key equally and preserves the order except at mod
    wraps.  The seed therefore enters as a multiplier on the neighbor id
    (premixed into [0, _M) so ``dst * mixer`` stays below 2^62; the
    src/hop term is reduced mod _M first, keeping the sum overflow-free
    for ids below 2^31 under ANSI arithmetic)."""
    mixer = (_C + (seed * _A + _B) % _M) % _M
    return F.pmod(
        F.pmod(src * F.lit(_A) + F.lit(hop * _B), F.lit(_M))
        + dst * F.lit(mixer),
        F.lit(_M),
    )


def random_walks(
    edges: DataFrame,
    walk_length: int,
    walks_per_vertex: int = 1,
    seed: int = 0,
) -> DataFrame:
    """``DataFrame[walk_id: long, step: int, vtx: long]`` — one row per
    visited position, steps 0..walk_length, every position a vertex of
    the simple undirected graph (self-loops dropped).

    One walk starts at every non-isolated vertex, ``walks_per_vertex``
    times (``walk_id = vtx * walks_per_vertex + replica``); each step
    moves to neighbor number ``H(walk_id, step, cur) mod degree(cur)`` of
    the current vertex's sorted adjacency list.  Deterministic given
    (graph, seed): re-runs, resumes and the DuckDB gate twin reproduce
    walks bit-for-bit.  Sequences come out by exploding nothing —
    downstream groupBy(walk_id) + sort_array(collect_list(struct(step,
    vtx))) reassembles corpus lines when a trainer wants strings.

    Vertex ids must fit in 31 bits for the overflow-free hash (ANSI mode
    would raise, not wrap); violators raise here with the bound.
    """
    if walk_length < 1 or walks_per_vertex < 1:
        raise ValueError(
            "random_walks requires walk_length >= 1 and walks_per_vertex >= 1"
        )
    sym = _simple_undirected(edges)
    # one pass for both id bounds: the hash mix is only overflow-free for
    # ids in [0, 2^31) and walk ids below 2^31 (max walk_id is
    # mx*wpv + wpv - 1); negative ids would overflow the int64 products
    # mid-job (ANSI raise) or silently wrap — reject both upfront
    row = sym.agg(
        F.max(F.greatest("src", "dst")).alias("mx"),
        F.min(F.least("src", "dst")).alias("mn"),
    ).first()
    mx, mn = row["mx"], row["mn"]
    if mn is not None and mn < 0:
        raise ValueError(
            f"random_walks requires non-negative vertex ids (min id {mn});"
            " renumber with graph.dense_ids first"
        )
    if mx is not None and (
        mx * walks_per_vertex + walks_per_vertex - 1 >= (1 << 31)
    ):
        raise ValueError(
            "random_walks: max_vertex_id * walks_per_vertex + "
            "walks_per_vertex - 1 must stay below 2^31 for the "
            f"overflow-free choice hash (max id {mx}); renumber with "
            "graph.dense_ids first"
        )
    from pyspark.sql import Window

    # materialized ONCE: every step's plan joins these, and leaving them
    # lazy re-runs the window + aggregation walk_length times over
    sym = fresh_checkpoint(sym)
    adj = fresh_checkpoint(
        sym.withColumn(
            "idx",
            F.row_number().over(
                Window.partitionBy("src").orderBy("dst")
            ) - 1,
        ).select("src", "dst", "idx")
    )
    deg = fresh_checkpoint(
        sym.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("deg"))
    )

    starts = deg.select(
        "v",
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))
        ).alias("rep"),
    )
    state = starts.select(
        (F.col("v") * walks_per_vertex + F.col("rep")).alias("walk_id"),
        F.col("v").alias("cur"),
    )
    out = state.select(
        "walk_id", F.lit(0).alias("step"), F.col("cur").alias("vtx")
    )
    for step in range(walk_length):
        nxt = (
            state.join(deg.withColumnRenamed("v", "cur"), "cur")
            .withColumn(
                "idx",
                F.pmod(
                    _choice_hash(F.col("walk_id"), step, F.col("cur"), seed),
                    F.col("deg"),
                ),
            )
            .join(
                adj.withColumnRenamed("src", "cur"),
                ["cur", "idx"],
            )
            .select("walk_id", F.col("dst").alias("cur"))
        )
        # linear lineage (no self-join): a flat plan every few steps is
        # enough to keep analysis cost and stats bounded without paying a
        # materialization per step
        state = (
            fresh_checkpoint(nxt)
            if (step % 4 == 3 and step < walk_length - 1)
            else nxt
        )
        out = out.unionByName(
            state.select(
                "walk_id",
                F.lit(step + 1).alias("step"),
                F.col("cur").alias("vtx"),
            )
        )
    return out.select(
        F.col("walk_id").cast("long").alias("walk_id"),
        F.col("step").cast("int").alias("step"),
        F.col("vtx").cast("long").alias("vtx"),
    )


def walk_sentences(walks: DataFrame) -> DataFrame:
    """``DataFrame[walk_id: long, sentence: array<long>]`` — step-ordered
    vertex sequences, the corpus-line shape embedding trainers consume."""
    return walks.groupBy("walk_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("step", "vtx"))),
            lambda s: s["vtx"],
        ).alias("sentence")
    )


def neighbor_sample(
    edges: DataFrame,
    fanouts: list[int],
    seeds: DataFrame | None = None,
    seed: int = 0,
    salt_buckets: int = 32,
) -> DataFrame:
    """GraphSAGE-style deterministic k-hop neighbor sampling.

    ``DataFrame[hop: int, src: long, dst: long]`` — one sampled adjacency
    block per hop: at hop ``i`` (1-based) every frontier vertex keeps at
    most ``fanouts[i-1]`` of its neighbors in the simple undirected graph
    (self-loops dropped), and the sampled neighbors become hop ``i+1``'s
    frontier.  ``seeds``: one-column DataFrame of starting vertex ids
    (the training minibatch); default = every non-isolated vertex.

    The "sample" is the ``fanouts[i]`` neighbors with the SMALLEST
    ``(H(src, hop, dst, seed), dst)`` key — H the seed-multiplicative
    :func:`_rank_hash` (the seed must permute each vertex's neighbor
    ORDER, not just shift it) — so runs are bit-reproducible given
    (graph, seeds, seed) and a SQL twin replays them with one
    ROW_NUMBER per hop (gate row ``neighbor_sample_f2``).

    Skew: a hub's candidate rows never hit one window group whole — the
    top-k by a TOTAL order is selection-associative, so Spark runs it in
    two phases (partial top-k inside ``salt_buckets`` hash buckets of the
    neighbor id, then final top-k over ≤ salt_buckets·fanout survivors),
    which bounds any single window partition at ~degree/salt_buckets
    rows while computing EXACTLY the single-phase answer.  State is
    O(frontier · fanout) per hop; the frontier is deduped (an expanded
    vertex is re-sampled identically anyway, so duplicates only waste
    work).
    """
    from pyspark.sql import Window

    if not fanouts or any(f < 1 for f in fanouts):
        raise ValueError("neighbor_sample requires fanouts >= 1")
    if salt_buckets < 1:
        raise ValueError("neighbor_sample requires salt_buckets >= 1")
    sym = _simple_undirected(edges)
    row = sym.agg(
        F.max(F.greatest("src", "dst")).alias("mx"),
        F.min(F.least("src", "dst")).alias("mn"),
    ).first()
    if row["mn"] is not None and row["mn"] < 0:
        raise ValueError(
            f"neighbor_sample requires non-negative vertex ids (min id "
            f"{row['mn']}); renumber with graph.dense_ids first"
        )
    if row["mx"] is not None and row["mx"] >= (1 << 31):
        raise ValueError(
            "neighbor_sample: vertex ids must stay below 2^31 for the "
            f"overflow-free choice hash (max id {row['mx']}); renumber "
            "with graph.dense_ids first"
        )
    sym = fresh_checkpoint(sym)
    if seeds is None:
        frontier = sym.select(F.col("src").alias("v")).distinct()
    else:
        c = seeds.columns[0]
        frontier = seeds.select(F.col(c).cast("long").alias("v")).distinct()
    out: DataFrame | None = None
    for i, fanout in enumerate(fanouts, start=1):
        cand = (
            frontier.join(sym, frontier.v == sym.src)
            .select("src", "dst")
            .withColumn(
                "h", _rank_hash(F.col("src"), i, F.col("dst"), seed)
            )
        )
        # two-phase exact top-k by the (h, dst) total order (see skew
        # note): partial inside neighbor-id hash buckets, final on the
        # survivors
        part = Window.partitionBy(
            "src", F.pmod(F.col("dst"), F.lit(salt_buckets))
        ).orderBy("h", "dst")
        survivors = cand.withColumn(
            "r", F.row_number().over(part)
        ).filter(F.col("r") <= fanout)
        final = Window.partitionBy("src").orderBy("h", "dst")
        block = (
            survivors.withColumn("r2", F.row_number().over(final))
            .filter(F.col("r2") <= fanout)
            .select(
                F.lit(i).cast("int").alias("hop"),
                F.col("src").cast("long").alias("src"),
                F.col("dst").cast("long").alias("dst"),
            )
        )
        block = fresh_checkpoint(block)
        out = block if out is None else out.unionByName(block)
        if i < len(fanouts):
            frontier = block.select(F.col("dst").alias("v")).distinct()
    return out


def node2vec_walks(
    edges: DataFrame,
    walk_length: int,
    w_return: int = 1,
    w_stay: int = 1,
    w_explore: int = 1,
    walks_per_vertex: int = 1,
    seed: int = 0,
) -> DataFrame:
    """Deterministic node2vec walks (Grover & Leskovec 2016) — the
    second-order biased successor of :func:`random_walks`.

    At each step beyond the first, the unnormalized probability of
    moving ``cur → next`` depends on the PREVIOUS vertex: ``α = 1/p`` if
    ``next == prev`` (return), ``1`` if ``next`` is adjacent to ``prev``
    (stay at distance 1), ``1/q`` otherwise (explore to distance 2).
    This generator takes the three weights as non-negative INTEGERS
    ``(w_return, w_stay, w_explore)`` — any rational (p, q) maps onto
    them by clearing denominators — so the weighted choice is pure
    integer arithmetic: candidates sorted by id, integer prefix sums,
    pick the candidate whose [cum, cum+w) range contains
    ``H(walk_id, step, cur) mod W``.  No transcendental appears anywhere
    (a Gumbel/exponential trick would hinge on ``ln`` agreeing to the
    last ulp across engines — a discrete argmin flip waiting to happen),
    so re-runs, resumes and the DuckDB twin reproduce walks
    bit-for-bit.  With ``w_return == w_stay == w_explore`` every
    candidate range has unit width and the pick reduces to
    ``H mod degree`` over the id-sorted adjacency — EXACTLY
    :func:`random_walks` (pinned by test).

    Step 0 is the same uniform first move as :func:`random_walks` (no
    prev exists).  A walk whose candidate weights all vanish (e.g.
    ``w_return=0`` at a pendant vertex whose only neighbor is prev)
    terminates early — its rows simply stop.

    Returns ``DataFrame[walk_id, step, vtx]`` like :func:`random_walks`.

    Scale note: second-order bias inherently materializes ``deg(cur)``
    candidate rows per live walk per step (the stay/explore split needs
    the (prev, next) membership probe) where the first-order walk pays
    O(1) via its indexed-adjacency join — the per-(walk, step) window is
    bounded by one vertex's adjacency list.  On hub-heavy graphs cap
    degrees first (:func:`..graph.ego_subgraph` / top-k sparsifier) or
    fall back to ``random_walks``; the membership probe itself is an
    equi-join on (prev, next), never a fan-out.
    """
    from pyspark.sql import Window

    for name, w in (
        ("w_return", w_return), ("w_stay", w_stay), ("w_explore", w_explore)
    ):
        if not isinstance(w, int) or w < 0:
            raise ValueError(f"node2vec_walks requires integer {name} >= 0")
    if w_return + w_stay + w_explore <= 0:
        raise ValueError("node2vec_walks requires a positive weight sum")
    if walk_length < 1 or walks_per_vertex < 1:
        raise ValueError(
            "node2vec_walks requires walk_length >= 1 and "
            "walks_per_vertex >= 1"
        )
    # weight sum bounds the modulus: W <= deg * max_w must stay inside
    # the hash's int64 headroom alongside the id checks below
    max_w = max(w_return, w_stay, w_explore)
    if max_w >= (1 << 20):
        raise ValueError("node2vec_walks: weights must stay below 2^20")

    sym = _simple_undirected(edges)
    row = sym.agg(
        F.max(F.greatest("src", "dst")).alias("mx"),
        F.min(F.least("src", "dst")).alias("mn"),
    ).first()
    mx, mn = row["mx"], row["mn"]
    if mn is not None and mn < 0:
        raise ValueError(
            f"node2vec_walks requires non-negative vertex ids (min {mn});"
            " renumber with graph.dense_ids first"
        )
    if mx is not None and (
        mx * walks_per_vertex + walks_per_vertex - 1 >= (1 << 31)
    ):
        raise ValueError(
            "node2vec_walks: max_vertex_id * walks_per_vertex must stay "
            f"below 2^31 for the overflow-free choice hash (max id {mx})"
        )

    sym = fresh_checkpoint(sym)
    adj = fresh_checkpoint(
        sym.withColumn(
            "idx",
            F.row_number().over(
                Window.partitionBy("src").orderBy("dst")
            ) - 1,
        ).select("src", "dst", "idx")
    )
    deg = fresh_checkpoint(
        sym.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("deg"))
    )

    starts = deg.select(
        "v",
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_vertex - 1))
        ).alias("rep"),
    )
    state = starts.select(
        (F.col("v") * walks_per_vertex + F.col("rep")).alias("walk_id"),
        F.col("v").alias("cur"),
    )
    out = state.select(
        "walk_id", F.lit(0).alias("step"), F.col("cur").alias("vtx")
    )
    # step 0: uniform, identical to random_walks
    state = (
        state.join(deg.withColumnRenamed("v", "cur"), "cur")
        .withColumn(
            "idx",
            F.pmod(
                _choice_hash(F.col("walk_id"), 0, F.col("cur"), seed),
                F.col("deg"),
            ),
        )
        .join(adj.withColumnRenamed("src", "cur"), ["cur", "idx"])
        .select(
            "walk_id", F.col("cur").alias("prev"), F.col("dst").alias("cur")
        )
    )
    out = out.unionByName(
        state.select("walk_id", F.lit(1).alias("step"), F.col("cur").alias("vtx"))
    )
    probe = sym.select(
        F.col("src").alias("prev"), F.col("dst").alias("nxt"),
        F.lit(1).alias("is_stay"),
    )
    wwin = Window.partitionBy("walk_id").orderBy("nxt")
    for step in range(1, walk_length):
        cand = (
            state.join(
                adj.select(F.col("src").alias("cur"), F.col("dst").alias("nxt")),
                "cur",
            )
            .join(probe, ["prev", "nxt"], "left")
            .withColumn(
                "w",
                F.when(F.col("nxt") == F.col("prev"), F.lit(w_return))
                .when(F.col("is_stay").isNotNull(), F.lit(w_stay))
                .otherwise(F.lit(w_explore)),
            )
            .filter(F.col("w") > 0)
        )
        cand = cand.withColumn(
            "cum", F.sum("w").over(wwin) - F.col("w")
        ).withColumn("tot", F.sum("w").over(wwin.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )))
        r = F.pmod(
            _choice_hash(F.col("walk_id"), step, F.col("cur"), seed),
            F.col("tot"),
        )
        nxt_state = cand.filter(
            (F.col("cum") <= r) & (r < F.col("cum") + F.col("w"))
        ).select(
            "walk_id", F.col("cur").alias("prev"), F.col("nxt").alias("cur")
        )
        state = (
            fresh_checkpoint(nxt_state)
            if (step % 4 == 3 and step < walk_length - 1)
            else nxt_state
        )
        out = out.unionByName(
            state.select(
                "walk_id",
                F.lit(step + 1).alias("step"),
                F.col("cur").alias("vtx"),
            )
        )
    return out.select(
        F.col("walk_id").cast("long").alias("walk_id"),
        F.col("step").cast("int").alias("step"),
        F.col("vtx").cast("long").alias("vtx"),
    )
