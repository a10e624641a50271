"""Continuous edge-table maintenance over a streaming corpus source.

The batch operator ``incremental_shared_content_edges`` (sources/corpus.py)
turns "new corpus rows" into an exact edge-table update at
O(batch + postings-of-touched-hashes) cost.  This module lifts it into
Structured Streaming: a ``foreachBatch`` sink where every micro-batch of
``(repo, path, commit, lang, content)`` rows merges into a persistent
versioned edge state — the daily/continuous-ingest shape of the north
rule's 10^12-file corpus, where a full rebuild per arrival is off the
table and the edge graph must stay queryable while it grows.

State layout (one directory per applied micro-batch)::

    <state_dir>/v=<epoch>/edges/      (node_a, node_b, weight) parquet
    <state_dir>/v=<epoch>/postings/   (node, h) parquet — the sufficient
                                      statistic for the next merge
    <state_dir>/v=<epoch>/applied.json  marker, written LAST

Exactly-once: Structured Streaming may re-run a failed epoch; the marker
protocol (same as sources/checkpoint.py — applied.json strictly after
both parquet commits, so its presence implies a complete version) plus
the ``epoch <= latest applied`` skip makes the merge idempotent.  All
filesystem access goes through the Hadoop FileSystem API, so
``state_dir`` may be local, ``hdfs://`` or ``s3a://`` alike.

Readers never block writers: ``edges_from_state`` reads the latest
COMPLETE version while the next micro-batch writes a new directory.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from parallel_louvain_method_spark.sources.checkpoint import _fs
from parallel_louvain_method_spark.sources.corpus import (
    CORPUS_COLUMNS,
    incremental_shared_content_edges,
    shared_content_edges,
    shared_content_postings,
)

_CORPUS_SCHEMA = ", ".join(f"{c} string" for c in CORPUS_COLUMNS)


def read_corpus_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of corpus rows (parquet dir; new files = new
    micro-batches)."""
    return spark.readStream.schema(_CORPUS_SCHEMA).parquet(path)


def _ver_dir(base: str, version: int) -> str:
    return f"{base.rstrip('/')}/v={version}"


def latest_version(spark: SparkSession, base: str) -> int | None:
    """Highest version with a complete ``applied.json`` marker, or None."""
    fs, jpath = _fs(spark, base)
    if not fs.exists(jpath):
        return None
    best = None
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if not name.startswith("v="):
            continue
        try:
            v = int(name[2:])
        except ValueError:
            continue
        marker = _fs(spark, f"{_ver_dir(base, v)}/applied.json")[1]
        if fs.exists(marker) and (best is None or v > best):
            best = v
    return best


def edges_from_state(
    spark: SparkSession, base: str, version: int | None = None
) -> DataFrame:
    """The edge table of the latest (or a pinned) complete version."""
    v = latest_version(spark, base) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no applied version under {base}")
    return spark.read.parquet(f"{_ver_dir(base, v)}/edges")


def postings_from_state(
    spark: SparkSession, base: str, version: int | None = None
) -> DataFrame:
    v = latest_version(spark, base) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no applied version under {base}")
    return spark.read.parquet(f"{_ver_dir(base, v)}/postings")


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    base: str,
    epoch_id: int,
    node_col: str = "repo",
    max_group: int = 1000,
    content_col: str = "content",
) -> dict:
    """Apply one micro-batch to the versioned state (idempotent).

    Bootstrap (no prior version): full build of the batch.  Otherwise:
    incremental merge against the previous version's postings+edges.
    Returns a small report dict (also persisted in applied.json).
    """
    prev = latest_version(spark, base)
    if prev is not None and prev >= epoch_id:
        return {"epoch": epoch_id, "skipped": True, "latest": prev}
    if not batch.take(1):
        return {"epoch": epoch_id, "skipped": True, "empty": True}
    if prev is None:
        edges, dropped = shared_content_edges(
            batch, node_col=node_col, max_group=max_group,
            content_col=content_col,
        )
        postings = shared_content_postings(batch, node_col, content_col)
    else:
        edges, postings, dropped = incremental_shared_content_edges(
            postings_from_state(spark, base, prev),
            edges_from_state(spark, base, prev),
            batch,
            node_col=node_col,
            max_group=max_group,
            content_col=content_col,
        )
    vdir = _ver_dir(base, epoch_id)
    edges.write.mode("overwrite").parquet(f"{vdir}/edges")
    postings.write.mode("overwrite").parquet(f"{vdir}/postings")
    report = {
        "epoch": epoch_id,
        "prev": prev,
        "edges": spark.read.parquet(f"{vdir}/edges").count(),
        "postings": spark.read.parquet(f"{vdir}/postings").count(),
        "dropped_groups": dropped.count(),
    }
    # marker LAST: its presence implies both parquet writes committed
    fs, marker = _fs(spark, f"{vdir}/applied.json")
    out = fs.create(marker, True)
    out.write(bytearray(json.dumps(report).encode()))
    out.close()
    return report


def start_incremental_edge_ingest(
    corpus_stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    node_col: str = "repo",
    max_group: int = 1000,
    content_col: str = "content",
):
    """foreachBatch sink: every micro-batch merges into the edge state.

    The stream's own checkpoint gives source-offset exactly-once; the
    version-marker protocol makes the merge side idempotent under epoch
    replay — together, end-to-end exactly-once edge maintenance.

    ``state_dir`` and ``checkpoint`` form ONE unit of state (epoch ids are
    compared against applied versions): restart with the same pair to
    resume; never point a fresh checkpoint at an existing state_dir, or
    its restarted epoch counter would be skipped as already-applied.
    """

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        ingest_batch(
            batch.sparkSession,
            batch,
            state_dir,
            int(epoch_id),
            node_col=node_col,
            max_group=max_group,
            content_col=content_col,
        )

    return (
        corpus_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def prune_state(
    spark: SparkSession, base: str, keep: int = 2
) -> list[int]:
    """Delete all but the newest ``keep`` COMPLETE versions (and any
    incomplete leftovers older than them).  Returns the versions removed.

    The ingest loop writes one directory per micro-batch; without pruning
    the state grows by one full edge-table copy per epoch.  Keeping >= 2
    complete versions means a reader holding the previous latest never
    has its files deleted mid-scan by the next prune.
    """
    if keep < 1:
        raise ValueError("prune_state requires keep >= 1")
    fs, jpath = _fs(spark, base)
    if not fs.exists(jpath):
        return []
    complete, incomplete = [], []
    for status in fs.listStatus(jpath):
        vpath = status.getPath()
        name = vpath.getName()
        if not name.startswith("v="):
            continue
        try:
            v = int(name[2:])
        except ValueError:
            continue
        # delete by the LISTED path, never a name rebuilt from the parsed
        # int (a stray "v=05" parses to 5 but is not "v=5")
        jvm = spark.sparkContext._jvm
        marker = jvm.org.apache.hadoop.fs.Path(vpath, "applied.json")
        (complete if fs.exists(marker) else incomplete).append((v, vpath))
    complete.sort(key=lambda t: t[0])
    kept = {v for v, _ in complete[-keep:]}
    removed = []
    for v, vpath in complete:
        if v not in kept:
            fs.delete(vpath, True)
            removed.append(v)
    # incomplete dirs: remove only stale leftovers strictly older than the
    # newest kept version — an in-flight write (newer, or the only state)
    # is never touched
    for v, vpath in incomplete:
        if kept and v < max(kept):
            fs.delete(vpath, True)
            removed.append(v)
    return sorted(removed)


def state_diff(
    spark: SparkSession, base: str, v_old: int, v_new: int
) -> DataFrame:
    """Edge-level diff between two applied state versions — what a
    micro-batch (or a span of them) actually changed in the graph."""
    from parallel_louvain_method_spark.operators.graph import edge_diff

    return edge_diff(
        edges_from_state(spark, base, v_old),
        edges_from_state(spark, base, v_new),
    )
