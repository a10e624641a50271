"""Streaming edge ingest: events → windowed co-occurrence edges.

``readStream`` over a parquet/file source with the ``events`` schema
(event_id, ts, user_id, event_type, value, props), watermarked on ``ts``.
Two streaming surfaces:

- :func:`windowed_activity` — per (window, event_type) count/value
  aggregates with late-data handling;
- :func:`cocommit_pair_stream` — the streaming twin of
  ``sources/corpus.cocommit_edges``: distinct users co-occurring in the
  same (event_type, window) bucket become PAIR rows, emitted exactly once
  per bucket when the watermark closes its window (append mode).  Buckets
  larger than ``max_users_per_bucket`` are dropped — the same explicit
  k²/2 pair-bomb cap as the batch builders.  The parquet sink is consumed
  by :func:`pair_edges_from_sink`, which aggregates pair rows into the
  canonical weighted edge table for batch Louvain/PageRank/CC.

Batch operators consume the sink's parquet output; the engine stays
batch-first (the reference has no streaming surface, SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 10
) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_activity(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per (window, event_type) activity aggregate with late-data handling."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide or window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users"),
            F.sum("value").alias("total_value"),
        )
    )


def cocommit_pair_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    max_users_per_bucket: int = 1000,
) -> DataFrame:
    """User pairs co-occurring in the same (event_type, time-window) bucket
    — the streaming twin of ``sources/corpus.cocommit_edges``.

    Stage 1 is the only STATEFUL operator: a watermarked windowed
    aggregation collecting the distinct user set per bucket; append mode
    finalizes each bucket exactly once when the watermark passes its
    window end, so a pair is never double-emitted.  NOTE on state size:
    the cap below bounds EMISSION, not in-flight state — while a bucket's
    window is open, ``collect_set`` accumulates every distinct user seen,
    so a pathological hot bucket holds its full distinct-user set until
    the watermark closes it (bounded in TIME by the watermark horizon,
    not in cardinality).  Deployments expecting adversarial buckets
    should pre-aggregate with a per-(bucket, user-id-hash-prefix) salt or
    an ``applyInPandasWithState`` cap upstream; the default cap keeps the
    DOWNSTREAM pair-bomb bounded either way.

    Stage 2 is stateless projection on the finalized rows: buckets larger
    than ``max_users_per_bucket`` are DROPPED (the explicit k²/2 pair-bomb
    cap, same rule as the batch builders — a capped bucket would emit up
    to 500k pairs at the default), then the user set explodes into ordered
    pairs ``user_a < user_b`` with the bucket key kept for audit.

    Output: ``[window, event_type, user_a, user_b]`` — one row per
    co-occurring pair per bucket; :func:`pair_edges_from_sink` sums rows
    into edge weights downstream.
    """
    buckets = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.collect_set("user_id").alias("users"))
    )
    kept = buckets.filter(F.size("users") <= max_users_per_bucket).select(
        "window", "event_type", F.sort_array("users").alias("users")
    )
    pairs = (
        kept.select(
            "window", "event_type", "users",
            F.explode("users").alias("user_a"),
        )
        .select(
            "window", "event_type", "user_a",
            F.explode("users").alias("user_b"),
        )
        .filter(F.col("user_a") < F.col("user_b"))
    )
    return pairs


def start_pair_edge_sink(
    pairs: DataFrame, out_path: str, checkpoint: str
):
    """Append-mode parquet sink for :func:`cocommit_pair_stream` (each
    bucket's pairs land exactly once per file epoch)."""
    return (
        pairs.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def pair_edges_from_sink(spark: SparkSession, path: str) -> DataFrame:
    """Batch consumption of the pair sink: aggregate pair rows into the
    canonical ``(src, dst, weight)`` edge table (weight = number of
    buckets where the pair co-occurred), ready for Louvain/PageRank/CC."""
    return (
        spark.read.parquet(path)
        .groupBy(
            F.col("user_a").alias("src"), F.col("user_b").alias("dst")
        )
        .agg(F.count("*").cast("double").alias("weight"))
    )


def start_activity_sink(
    activity: DataFrame, out_path: str, checkpoint: str, mode: str = "append"
):
    """File sink with its own checkpoint (exactly-once per file epoch)."""
    return (
        activity.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .start()
    )
