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


def test_cocommit_pair_stream_matches_batch(spark, tmp_path):
    """The streaming pair emission must agree with the batch twin: same
    bucketing (event_type x window), same distinct-user pair semantics,
    exactly-once per bucket — and the sink must feed batch Louvain."""
    from pyspark.sql import functions as F

    from parallel_louvain_method_spark.operators.louvain import louvain
    from parallel_louvain_method_spark.streaming.events import (
        cocommit_pair_stream,
        pair_edges_from_sink,
        read_event_stream,
        start_pair_edge_sink,
    )

    src = str(tmp_path / "events_src")
    out = str(tmp_path / "pairs_out")
    ck = str(tmp_path / "pairs_ck")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(src)

    stream = read_event_stream(spark, src)
    pairs = cocommit_pair_stream(stream, window="1 hour", watermark="2 hours")
    q = start_pair_edge_sink(pairs, out, ck)
    q.processAllAvailable()
    q.stop()

    got = spark.read.parquet(out)
    # batch twin over the same static table
    static = spark.read.parquet(src)
    bucketed = static.select(
        F.window("ts", "1 hour").alias("window"), "event_type", "user_id"
    ).distinct()
    want_pairs = (
        bucketed.alias("a")
        .join(bucketed.alias("b"), ["window", "event_type"])
        .filter(F.col("a.user_id") < F.col("b.user_id"))
        .select(
            "window", "event_type",
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
        )
    )
    got_set = {
        (r["window"]["start"], r["event_type"], r["user_a"], r["user_b"])
        for r in got.collect()
    }
    want_set = {
        (r["window"]["start"], r["event_type"], r["user_a"], r["user_b"])
        for r in want_pairs.collect()
    }
    # append mode emits only watermark-closed windows: everything emitted
    # must be correct, and emitted windows must be complete
    assert got_set, "stream emitted nothing"
    assert got_set <= want_set
    emitted_buckets = {(w, e) for (w, e, _, _) in got_set}
    want_in_emitted = {
        t for t in want_set if (t[0], t[1]) in emitted_buckets
    }
    assert got_set == want_in_emitted  # exactly-once AND complete per bucket

    # the sink feeds the batch engine end-to-end
    edges = pair_edges_from_sink(spark, out)
    assert edges.filter(F.col("src") >= F.col("dst")).count() == 0
    res = louvain(spark, edges)
    assert res.assignment.count() == edges.selectExpr(
        "src AS v"
    ).union(edges.selectExpr("dst AS v")).distinct().count()
