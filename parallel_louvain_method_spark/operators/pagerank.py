"""PageRank over the canonical edge table (SURVEY.md A10, [NR] north rule).

Pure DataFrame loop — no Python row code.  Each iteration is one shuffle
join (ranks onto edges by src) + one aggregation (sum contributions by dst);
the rank table is localCheckpoint'ed per iteration to keep the logical plan
flat (iterative-lineage rule, see operators/louvain.py).

Scale notes:
- the edge table is persisted once, partitioned by the join key, so only
  the (tiny) rank table moves per iteration;
- dangling mass (vertices with no out-edges) is redistributed uniformly —
  on a symmetrized graph danglings are only isolated vertices, but the
  operator also accepts directed input;
- convergence check ``max|Δ|`` is one extra small aggregation per
  iteration; pass ``tol=None`` to run exactly ``max_iter`` rounds (needed
  for fixed-k SQL-oracle comparison).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from parallel_louvain_method_spark.operators.graph import vertex_ids


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float | None = 1e-6,
    weighted: bool = True,
    broadcast_vertex_threshold: int = 5_000_000,
) -> DataFrame:
    """Returns ``DataFrame[vtx: long, rank: double]``; Σ rank = 1.

    ``edges`` is interpreted as DIRECTED (src -> dst).  For the undirected
    semantics of the link graph, pass the symmetric table.

    While the vertex set is below ``broadcast_vertex_threshold`` the rank
    table gets an explicit broadcast hint in the per-iteration join:
    ``localCheckpoint`` erases its statistics, so the planner would
    otherwise assume it is huge and sort-merge-join — re-sorting the big
    cached edge side EVERY iteration.  Past the threshold the hint is
    withheld and the pre-partitioned edge cache carries the join.
    """
    verts = vertex_ids(edges).withColumnRenamed("v", "vtx").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(0.0))

    hint = (lambda df: F.broadcast(df)) if n <= broadcast_vertex_threshold else (lambda df: df)

    wcol = F.col("weight") if weighted else F.lit(1.0)
    out_w = edges.groupBy(F.col("src").alias("vtx")).agg(
        F.sum(wcol).alias("out_w")
    )
    # transition fraction per edge: w / out_w(src); pre-partitioned by the
    # per-iteration join key so the cached big side never re-shuffles
    n_parts = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    trans = (
        edges.join(hint(out_w.withColumnRenamed("vtx", "src")), "src")
        .select("src", "dst", (wcol / F.col("out_w")).alias("frac"))
        .repartition(n_parts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    trans.count()

    ranks = verts.select("vtx", F.lit(1.0 / n).alias("rank")).localCheckpoint(
        eager=True
    )
    base = (1.0 - damping) / n
    # dangling set is static — skip the per-iteration aggregation entirely
    # when it's empty (always true for symmetrized graphs)
    danglings = verts.join(out_w, "vtx", "left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    has_danglings = danglings.count() > 0

    for _ in range(max_iter):
        contrib = (
            trans.join(hint(ranks.withColumnRenamed("vtx", "src")), "src")
            .groupBy(F.col("dst").alias("vtx"))
            .agg(F.sum(F.col("frac") * F.col("rank")).alias("in_sum"))
        )
        # dangling mass: rank held by vertices with no out-edges
        dangling = (
            (
                ranks.join(danglings.select("vtx"), "vtx")
                .agg(F.sum("rank"))
                .first()[0]
                or 0.0
            )
            if has_danglings
            else 0.0
        )
        redistribute = damping * dangling / n
        new_ranks = verts.join(hint(contrib), "vtx", "left").na.fill(
            {"in_sum": 0.0}
        ).select(
            "vtx",
            (
                F.lit(base)
                + F.lit(damping) * F.col("in_sum")
                + F.lit(redistribute)
            ).alias("rank"),
        )
        # truncate lineage every iteration (iterative-lineage rule); the
        # broadcast exchange of `contrib` forces a materialization per
        # iteration regardless, so deferring the checkpoint only re-runs
        # the previous join inside the next one (measured slower)
        new_ranks = new_ranks.localCheckpoint(eager=True)
        if tol is not None:
            delta = (
                new_ranks.withColumnRenamed("rank", "new_rank")
                .join(ranks, "vtx")
                .agg(F.max(F.abs(F.col("new_rank") - F.col("rank"))))
                .first()[0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks

    trans.unpersist()
    verts.unpersist()
    danglings.unpersist()
    return ranks
