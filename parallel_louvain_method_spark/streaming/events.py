"""Streaming edge ingest: events → windowed co-occurrence edges.

``readStream`` over a parquet/file source with the ``events`` schema
(event_id, ts, user_id, event_type, value, props), watermarked on ``ts``.
Three streaming surfaces:

- :func:`windowed_activity` — per (window, event_type) count/value
  aggregates with late-data handling;
- :func:`user_sessions_stream` — per-user session windows as a CUSTOM
  STATEFUL operator (``applyInPandasWithState`` + event-time timeouts),
  parity-tested against the native ``session_window`` batch twin;
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


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
_SESSION_STATE_SCHEMA = "start long, last long, n long, total double"


def user_sessions_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch twin of :func:`user_sessions_stream` via the native
    ``session_window`` — the parity ORACLE for the custom stateful
    operator (same output schema, one row per session)."""
    return (
        events.groupBy(
            F.session_window("ts", f"{gap_seconds} seconds").alias("w"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            # session_window's end is last_ts + gap; report the LAST EVENT
            # time as the session end (the stateful twin's natural output)
            (
                F.col("w.end") - F.expr(f"INTERVAL {gap_seconds} SECONDS")
            ).alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def user_sessions_stream(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "30 minutes"
) -> DataFrame:
    """Per-user SESSION WINDOWS as a custom stateful operator —
    ``applyInPandasWithState`` with event-time timeouts (the
    arbitrary-stateful-processing surface; the windowed aggregates above
    only cover the declarative one).

    One state row per user: ``(start, last, n, total)`` of the currently
    OPEN session (timestamps as epoch-µs longs — Arrow-stable).  A batch
    for a user is sorted by ``ts`` and split at gaps > ``gap_seconds``
    VECTORIZED (numpy diff, no per-event Python loop); every closed
    session emits immediately, the open tail persists in state with an
    event-time timeout at ``last + gap`` — when the watermark passes it,
    the timeout path emits the session and clears the state.  Output is
    append-mode exactly-once, like the pair stream.

    State is O(1) per ACTIVE user (four scalars) — bounded by user
    cardinality within the watermark horizon, not by event volume; this
    is the state bound the windowed ``collect_set`` aggregation above
    explicitly cannot give.
    """
    import pandas as pd  # local: keep the module import-light

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return
        import numpy as np

        parts = [pdf for pdf in pdf_iter]
        pdf = pd.concat(parts).sort_values("ts") if parts else pd.DataFrame()
        if len(pdf) == 0:
            return
        ts = pdf["ts"].astype("int64").to_numpy() // 1000  # ns -> us
        val = pdf["value"].fillna(0.0).to_numpy()
        if state.exists:
            start0, last0, n0, total0 = state.get
        else:
            start0, last0, n0, total0 = ts[0], ts[0] - 1, 0, 0.0
        # session boundary BEFORE event i when the gap from the previous
        # event (or the open tail's last ts) exceeds the budget
        prev = np.concatenate(([last0], ts[:-1])) if state.exists else np.concatenate(([ts[0]], ts[:-1]))
        newsess = (ts - prev) > gap_us
        seg = np.cumsum(newsess)  # 0 = continuation of the open session
        out = []
        for s in range(int(seg.max()) + 1 if len(seg) else 0):
            m = seg == s
            if not m.any():
                continue
            seg_ts, seg_val = ts[m], val[m]
            if s == 0 and state.exists:
                cur = (start0, int(seg_ts[-1]), n0 + int(m.sum()), total0 + float(seg_val.sum()))
            else:
                cur = (int(seg_ts[0]), int(seg_ts[-1]), int(m.sum()), float(seg_val.sum()))
            out.append(cur)
        if state.exists and len(seg) and seg.max() >= 1 and not (seg == 0).any():
            # the whole batch started a new session: the open tail closes
            out.insert(0, (start0, last0, n0, total0))
        closed, open_tail = out[:-1], out[-1]
        state.update(open_tail)
        state.setTimeoutTimestamp((open_tail[1] + gap_us) // 1000)  # ms
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "total_value": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
