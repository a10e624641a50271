"""Structured Streaming surface: events file-stream → windowed aggregates."""

from __future__ import annotations

from parallel_louvain_method_spark.streaming.events import (
    read_event_stream,
    start_activity_sink,
    windowed_activity,
)


def test_windowed_activity_stream(spark, tmp_path):
    # stage the driver's events table as the file-stream source
    src = str(tmp_path / "events_src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(src)

    stream = read_event_stream(spark, src)
    assert stream.isStreaming
    activity = windowed_activity(stream, window="1 hour", watermark="2 hours")
    q = start_activity_sink(activity, out, ck)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out)
    assert got.count() > 0
    # batch oracle: same aggregation over the static table
    from pyspark.sql import functions as F

    static = spark.read.parquet(src)
    want = static.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n_events")
    )
    got_n = {
        (r["window"]["start"], r["event_type"]): r["n_events"]
        for r in got.collect()
    }
    for r in want.collect():
        key = (r["window"]["start"], r["event_type"])
        # append-mode emits only watermark-closed windows; every emitted
        # window must match the batch oracle exactly
        if key in got_n:
            assert got_n[key] == r["n_events"]
