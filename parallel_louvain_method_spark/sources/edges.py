"""Edge-list file sources and sinks (SURVEY.md S1/S2/S4/S5).

The reference reads whitespace ``int int double`` lines, skipping (with a
warning) lines that fail the parse (/root/reference/src/graph.cpp:24-49),
with one file per MPI rank (main_distributed_community.cpp:32-41).  Spark's
CSV reader with DROPMALFORMED reproduces skip-and-warn; a directory of
per-rank shards is just a multi-file read — Spark's input splits replace
manual sharding (data/split.py is obsolete).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from parallel_louvain_method_spark.operators.graph import normalize_edges


def read_edge_text(spark: SparkSession, path: str, weighted: bool = True) -> DataFrame:
    """S1/S2: parse ``src dst [weight]`` lines; malformed lines dropped
    (src/graph.cpp:41-43's skip-and-warn).  ``path`` may be a file, glob, or
    a directory of per-rank shards."""
    schema = "src LONG, dst LONG, weight DOUBLE" if weighted else "src LONG, dst LONG"
    # reference format is whitespace-separated; normalize runs of spaces/tabs
    lines = spark.read.text(path)
    parts = F.split(F.trim(F.regexp_replace(F.col("value"), r"\s+", " ")), " ")
    # try_cast, not cast: under ANSI mode (Spark 4 default) a plain cast
    # RAISES on malformed tokens; the reference skips bad lines
    # F.get (not getItem): ANSI mode raises on out-of-bounds indices; a
    # 2-token line on the weighted path must parse to NULL and be dropped
    df = lines.select(
        F.get(parts, 0).try_cast("long").alias("src"),
        F.get(parts, 1).try_cast("long").alias("dst"),
        (
            F.get(parts, 2).try_cast("double") if weighted else F.lit(1.0)
        ).alias("weight"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull() & F.col("weight").isNotNull())
    return normalize_edges(df)


def read_edge_parquet(spark: SparkSession, path: str) -> DataFrame:
    return normalize_edges(spark.read.parquet(path))


def write_edges(edges: DataFrame, path: str) -> None:
    """S5: one row per undirected edge (``src <= dst``, src/graph.cpp:332);
    Spark's committer replaces the reference's MPI_Exscan offset dance."""
    edges.filter(F.col("src") <= F.col("dst")).write.mode("overwrite").parquet(path)


def write_communities(assign: DataFrame, path: str) -> None:
    """S4 sink: community membership, partitioned for parallel readback
    (reference gathers everything to write per-community text files,
    src/distcommunity.cpp:637-709 — unnecessary under a parallel writer)."""
    assign.write.mode("overwrite").parquet(path)


def community_membership(assign: DataFrame, member_cap: int = 1000) -> DataFrame:
    """Human-readable S4 variant: one row per community with member list.

    ``size`` is the EXACT community size; ``members`` lists at most
    ``member_cap`` lowest vertex ids — a mega-community at corpus scale
    would otherwise put millions of ids into one aggregation buffer /
    output row (the ranked-collect cap from operators/dedup.py
    exact_duplicates; window and groupBy share the key, still ONE
    shuffle).  Raise ``member_cap`` explicitly for full small-graph dumps.
    """
    from pyspark.sql import Window

    rn = F.row_number().over(Window.partitionBy("comm").orderBy("vtx"))
    return (
        assign.withColumn("_rn", rn)
        .groupBy("comm")
        .agg(
            # collect_list skips nulls -> only the first member_cap ids
            # ever enter the buffer
            F.sort_array(
                F.collect_list(F.when(F.col("_rn") <= member_cap, F.col("vtx")))
            ).alias("members"),
            F.count("*").alias("size"),
        )
    )


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    path: str,
    n_buckets: int = 32,
    bucket_col: str = "src",
) -> None:
    """Bucketed edge sink: hash-bucket + sort the edge table by ``src`` at
    write time so every downstream src-keyed join/aggregation reads
    pre-shuffled data.

    Iterative graph algorithms re-join the edge table against per-vertex
    state every superstep; on an unbucketed table each superstep pays the
    full E-sized exchange.  Persisting the edges bucketed (the DataFrame
    analog of the reference's one-time owner-routing shuffle,
    src/graph.cpp:141-215) moves that exchange to write time ONCE: two
    tables bucketed on the same key with the same bucket count sort-merge
    join with ZERO Exchange on either side (pinned by
    tests/test_sources_sinks.py::test_bucketed_join_has_no_shuffle).
    At 100 TB this is the difference between E bytes shuffled per
    iteration and zero.
    """
    (
        edges.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )
