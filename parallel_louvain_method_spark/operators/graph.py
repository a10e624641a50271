"""Edge-table operators — the engine's relational core.

The canonical table is ``(src: long, dst: long, weight: double)``
(reference ``struct Edge``, /root/reference/src/graph.h:15-18).  Every
operator here is a pure DataFrame transform so Catalyst can push filters,
prune columns and pick join strategies; nothing touches Python rows.

Scale notes (100 TB / 10^12-edge design points):
- symmetrize is a union, not a shuffle;
- dedup/degree/ecount are hash aggregations with map-side partials;
- dense renumbering uses sort + ``zipWithIndex`` — a total order is required
  by the reference semantics (renumber.py:33 sorts the global vertex set),
  and zipWithIndex does it with one extra pass over partition counts instead
  of a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

EDGE_SCHEMA = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
        StructField("weight", DoubleType(), False),
    ]
)


def normalize_edges(df: DataFrame) -> DataFrame:
    """Cast an arbitrary 2/3-column frame to the canonical edge schema.

    Two-column input gets unit weight (reference renumber.py:14-16 treats
    raw 2-col files as unit-weight)."""
    cols = df.columns
    out = df.select(
        F.col(cols[0]).cast("long").alias("src"),
        F.col(cols[1]).cast("long").alias("dst"),
        (F.col(cols[2]).cast("double") if len(cols) > 2 else F.lit(1.0)).alias("weight"),
    )
    return out


def symmetrize(edges: DataFrame) -> DataFrame:
    """Emit both directions of every edge (src/graph.cpp:80-83).

    A self-loop yields two identical rows; pair with :func:`dedup` to get
    the reference's set semantics (one CSR entry per self-loop)."""
    return edges.select("src", "dst", "weight").union(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("weight")
        )
    )


def dedup(edges: DataFrame) -> DataFrame:
    """Collapse exact (src, dst, weight) duplicates — ``std::set`` semantics
    (src/graph.h:25); parallel edges with different weights survive."""
    return edges.dropDuplicates(["src", "dst", "weight"])


def symmetric_edges(edges: DataFrame) -> DataFrame:
    """symmetrize + dedup: the engine's working representation."""
    return dedup(symmetrize(edges))


def canonical_edges(edges: DataFrame) -> DataFrame:
    """One row per undirected edge: keep ``src <= dst``
    (write-path predicate, src/graph.cpp:332)."""
    return edges.filter(F.col("src") <= F.col("dst"))


def exclude_self_loops(edges: DataFrame) -> DataFrame:
    """The gain-aggregation predicate (src/community.cpp:134)."""
    return edges.filter(F.col("src") != F.col("dst"))


def degrees(sym_edges: DataFrame) -> DataFrame:
    """Weighted degree per vertex over the SYMMETRIC table
    (src/graph.cpp:238-247 — self-loops count once, since a self-loop is a
    single row of the deduped symmetric table)."""
    return sym_edges.groupBy(F.col("src").alias("vtx")).agg(
        F.sum("weight").alias("degree")
    )


def max_vertex_id(edges: DataFrame) -> int:
    """Global ``max(src, dst)`` (src/graph.cpp:111-118); +1 = vcount."""
    row = edges.agg(F.max(F.greatest("src", "dst")).alias("mx")).first()
    return int(row["mx"]) if row["mx"] is not None else -1


def ecount(edges: DataFrame) -> int:
    """Undirected edge count = symmetric entries // 2 (src/graph.cpp:51-63)."""
    return symmetric_edges(edges).count() // 2


def vertex_ids(edges: DataFrame) -> DataFrame:
    """Distinct vertex set as ``DataFrame[v: long]``."""
    return (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
    )


def dense_ids(ids: DataFrame, col: str = "v") -> DataFrame:
    """Map distinct ids -> dense 0..N-1 by SORTED order
    (renumber.py:19-34 gathers + sorts the global vertex set).

    Distributed: sort, then ``zipWithIndex`` (two jobs: per-partition counts,
    then the indexed pass) — no single-partition window at scale."""
    sorted_ids = ids.select(col).distinct().sort(col)
    spark = ids.sparkSession
    indexed = sorted_ids.rdd.map(lambda r: r[0]).zipWithIndex()
    schema = StructType(
        [
            StructField(col, ids.schema[col].dataType, False),
            StructField("new_id", LongType(), False),
        ]
    )
    return spark.createDataFrame(indexed, schema=schema)


def renumber_edges(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Rewrite (src, dst) to dense sorted ids; returns (edges', mapping).

    Two equi-joins against the mapping; at scale the mapping is usually far
    smaller than the edge table and AQE converts these to broadcast joins."""
    mapping = dense_ids(vertex_ids(edges))
    out = (
        edges.join(mapping.withColumnRenamed("v", "src"), "src")
        .drop("src")
        .withColumnRenamed("new_id", "src")
        .join(
            mapping.withColumnRenamed("v", "dst").withColumnRenamed("new_id", "dst_new"),
            "dst",
        )
        .drop("dst")
        .withColumnRenamed("dst_new", "dst")
        .select("src", "dst", "weight")
    )
    return out, mapping
