"""Per-level resumable checkpoints (SURVEY.md S7).

The reference intended but never implemented this
(/root/reference/src/distcommunity.cpp:899 "TODO ... Checkpoint edgelist
here").  Layout, one directory per completed level::

    <dir>/level=<k>/edges/        coarse symmetric edge table (parquet)
    <dir>/level=<k>/assignment/   flat vtx -> community (parquet)
    <dir>/level=<k>/metrics.json  modularity, sweeps, moves, wall time,
                                  per-partition row counts (lineage)

Parquet gives partition-parallel write/read; the metrics sidecar is tiny
JSON written via the driver.  ``_SUCCESS`` marker files (Hadoop committer)
make partially-written levels invisible to ``latest_level``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def _level_dir(base: str, level: int) -> str:
    return os.path.join(base, f"level={level}")


def save_level(
    spark: SparkSession,
    base: str,
    level: int,
    coarse_edges: DataFrame,
    flat_assign: DataFrame,
    metrics: dict,
) -> None:
    d = _level_dir(base, level)
    coarse_edges.write.mode("overwrite").parquet(os.path.join(d, "edges"))
    flat_assign.write.mode("overwrite").parquet(os.path.join(d, "assignment"))
    # per-partition lineage: row counts per shuffle partition of the state
    part_counts = (
        flat_assign.groupBy(F.spark_partition_id().alias("partition"))
        .count()
        .collect()
    )
    metrics = dict(metrics)
    metrics["assignment_partitions"] = {
        int(r["partition"]): int(r["count"]) for r in part_counts
    }
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)


def latest_level(spark: SparkSession, base: str) -> int | None:
    """Highest level with a complete (metrics.json present) checkpoint."""
    if not os.path.isdir(base):
        return None
    done = []
    for name in os.listdir(base):
        if name.startswith("level=") and os.path.exists(
            os.path.join(base, name, "metrics.json")
        ):
            done.append(int(name.split("=", 1)[1]))
    return max(done) if done else None


def load_level(
    spark: SparkSession, base: str, level: int
) -> tuple[DataFrame, DataFrame, dict]:
    d = _level_dir(base, level)
    edges = spark.read.parquet(os.path.join(d, "edges"))
    assign = spark.read.parquet(os.path.join(d, "assignment"))
    with open(os.path.join(d, "metrics.json")) as f:
        metrics = json.load(f)
    return edges, assign, metrics
