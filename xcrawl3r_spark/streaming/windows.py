"""Event-time windowed aggregates with watermarks (SURVEY §2.8): the A6
crawl-metrics shape on an unbounded stream.

The batch engine computes per-iteration metrics (plans/crawl.py A6); on a
stream the idiomatic Spark form is a tumbling event-time window with a
watermark bounding how long state waits for late data. ``windowed_metrics``
works on BOTH streaming and batch frames — the batch application of the
same plan is the oracle twin (registered as the ``stream_windowed_metrics``
driver query with a DuckDB time_bucket oracle), so the streaming operator's
semantics are pinned by the correctness gate, and the watermark's
late-row-drop behavior is pinned by tests/test_streaming.py.

Scale posture: the aggregation state is (window x key) — bounded by the
watermark horizon, not the stream length; partial aggregation happens
map-side per micro-batch, and the shuffle key (window, key) spreads load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_metrics(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    value_scale: int = 2,
) -> DataFrame:
    """Tumbling event-time windows of counts + value sums per key.

    Streaming input: ``withWatermark`` bounds state and drops rows later
    than the watermark (append-mode windows finalize once the watermark
    passes their end). Batch input: the identical plan minus the
    watermark — Spark evaluates F.window on static frames too, which is
    what makes this operator oracle-checkable.

    ``value_scale``: decimal places of the fixed-point value quantum.
    Sums run in integer fixed point (each row quantized to
    10^value_scale units before summing) because a raw float sum is
    shuffle-order-dependent in the last ulps and can round differently
    across engines/runs (the cross-engine float-sum rule) — the
    determinism trade-off is that digits beyond ``value_scale`` are
    rounded away per row. The default (2, i.e. cents) fits
    currency-like metrics; callers with finer-grained values opt into a
    finer quantum (int64 headroom: sum of |value|*10^scale must stay
    below 2^63).
    """
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win = F.window(ts_col, window)
    quantum = 10 ** value_scale
    fixed = F.round(F.col("value") * quantum).cast("long")
    return (
        df.groupBy(win.alias("win"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(fixed) / F.lit(float(quantum))).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key: str = "user_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based sessionization: per ``key``, events closer than ``gap``
    merge into one session (Spark ``session_window`` — the idiomatic
    streaming-stateful form; on batch frames the identical plan is
    oracle-checkable). Session end is last-event + gap; an event exactly
    ``gap`` after the last one MERGES into the running session (Spark
    breaks only on diff > gap — pytest-pinned; the lag/cumsum SQL twin
    mirrors this with > gap).

    Scale posture: state per (key, open session), bounded by the
    watermark horizon on streams; one shuffle on the session key.
    Output: (key, session_start, session_end, n_events, duration_sec).
    """
    df = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    sw = F.session_window(ts_col, gap)
    return (
        df.groupBy(sw.alias("sess"), key)
        .agg(F.count("*").alias("n_events"))
        .select(
            key,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            (F.unix_timestamp(F.col("sess.end"))
             - F.unix_timestamp(F.col("sess.start"))).alias("duration_sec"),
        )
    )
