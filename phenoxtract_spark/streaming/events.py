"""Time-windowed operators over the events stream (SURVEY §2.5 note +
§7.2 step 9; the reference is batch-only — SURVEY §2 "operators the
reference does NOT implement").

The same expression layer serves batch DataFrames and Structured Streaming:
``tumbling``/``sliding``/``session`` build window aggregations that work on
a static events table and, unchanged, on ``readStream`` input with a
watermark.  Batch mode is the oracle-checkable path; streaming mode is
exercised with the rate/memory sources in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling(events: DataFrame, duration: str = "1 hour", ts: str = "ts") -> DataFrame:
    """Tumbling-window counts/sums per event type."""
    return (
        events.groupBy(F.window(ts, duration).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding(events: DataFrame, duration: str = "1 hour", slide: str = "30 minutes",
            ts: str = "ts") -> DataFrame:
    return (
        events.groupBy(F.window(ts, duration, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "n_events")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", ts: str = "ts",
                    key: str = "user_id") -> DataFrame:
    """Session windows per user (batch mode uses ``F.session_window``, which
    Spark evaluates with the same state machinery as streaming).  Returns
    per-session start/end/count."""
    return (
        events.groupBy(F.session_window(ts, gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_tumbling(spark, source: DataFrame, duration: str = "1 hour",
                       watermark: str = "2 hours", ts: str = "ts") -> DataFrame:
    """Structured Streaming variant: same aggregation with a watermark for
    late data.  ``source`` is a streaming DataFrame (readStream)."""
    return (
        source.withWatermark(ts, watermark)
        .groupBy(F.window(ts, duration).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def stream_stream_join(impressions: DataFrame, clicks: DataFrame,
                       key: str = "user_id",
                       impression_watermark: str = "2 hours",
                       click_watermark: str = "3 hours",
                       max_delay: str = "1 hour") -> DataFrame:
    """Stream-stream inner join with event-time bounds: each click joins the
    impression it followed within ``max_delay``.  Watermarks bound the join
    state on both sides — without them Spark would buffer both streams
    forever.  Works identically on batch DataFrames (the time-bound becomes
    a plain range predicate)."""
    imp = impressions.select(
        F.col(key).alias("i_key"),
        F.col("ts").alias("imp_ts"),
        F.col("event_id").alias("impression_id"),
    )
    clk = clicks.select(
        F.col(key).alias("c_key"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    if imp.isStreaming:
        imp = imp.withWatermark("imp_ts", impression_watermark)
        clk = clk.withWatermark("click_ts", click_watermark)
    return imp.join(
        clk,
        (F.col("i_key") == F.col("c_key"))
        & (F.col("click_ts") >= F.col("imp_ts"))
        & (F.col("click_ts") <= F.col("imp_ts") + F.expr(f"INTERVAL {max_delay}")),
    ).select(
        F.col("i_key").alias(key), "impression_id", "click_id", "imp_ts", "click_ts"
    )


def streaming_dedup(source: DataFrame, keys: tuple[str, ...] = ("event_id",),
                    ts: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """At-least-once → effectively-once event dedup on a stream: drop
    events whose key reappears within the watermark horizon
    (``dropDuplicatesWithinWatermark``).  State is BOUNDED by the
    watermark — expired keys are evicted — unlike ``dropDuplicates`` on a
    stream, which accumulates every key forever and OOMs a 100 TB/day
    ingest.  On a batch DataFrame the same call degrades to a plain
    key-dedup (the watermark is irrelevant when all data is present)."""
    if source.isStreaming:
        return source.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return source.dropDuplicates(list(keys))


def gapfill_hourly(events: DataFrame, ts: str = "ts",
                   key: str = "event_type") -> DataFrame:
    """Hypertable-style gap fill: one row per (key, hour bucket) across the
    stream's full time range, with empty buckets materialized at count 0 —
    the `time_bucket_gapfill` shape for downstream charting/training that
    needs a dense series.

    Scale: the bucket spine is a DIMENSION (global min/max hour × distinct
    keys — years of hours × a small key set, ~10⁵-10⁶ rows regardless of
    corpus size), built from two single-row aggregates and broadcast; the
    fact side is the normal tumbling aggregate.  The corpus never joins
    against itself and the only full-data pass is the windowed count."""
    agg = (
        events.groupBy(
            F.date_trunc("hour", F.col(ts)).alias("bucket"), F.col(key)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    bounds = events.agg(
        F.date_trunc("hour", F.min(ts)).alias("_lo"),
        F.date_trunc("hour", F.max(ts)).alias("_hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket")
    )
    keys = events.select(F.col(key)).distinct()
    spine = F.broadcast(hours.crossJoin(keys))
    return (
        spine.join(agg, ["bucket", key], "left")
        .select(
            "bucket",
            key,
            F.coalesce(F.col("n_events"), F.lit(0).cast("bigint")).alias("n_events"),
        )
    )


def locf_resample(events: DataFrame, every: str = "1 hour", ts: str = "ts",
                  key: str = "user_id", value: str = "value",
                  tiebreak: str | None = None) -> DataFrame:
    """Last-observation-carried-forward resampling: one row per (key,
    bucket) from the key's first observation onward, carrying the most
    recent value across empty buckets (sensor/feature resampling for
    training pipelines).

    Plan: per-key last-in-bucket (one shuffle), densify each key's own
    range via sequence-explode (rows ∝ Σ per-key span — the output size
    itself), then a window `last(ignorenulls)` carry per key: O(1) running
    state, no self-join, same shape streaming sessionization uses."""
    from pyspark.sql.window import Window

    bucket = F.window(ts, every)["start"]
    order = [F.col(ts).desc()]
    if tiebreak is not None:
        # same-timestamp observations need a total order or the carried
        # value is partition-layout-dependent (and oracle-divergent)
        order.append(F.col(tiebreak).desc())
    wlast = Window.partitionBy(key, "bucket").orderBy(*order)
    last_in_bucket = (
        events.withColumn("bucket", bucket)
        .withColumn("_rn", F.row_number().over(wlast))
        .filter(F.col("_rn") == 1)
        .select(key, "bucket", F.col(value).alias("_obs"))
    )
    spans = last_in_bucket.groupBy(key).agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    dense = spans.select(
        key,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {every}"))
        ).alias("bucket"),
    )
    joined = dense.join(last_in_bucket, [key, "bucket"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key,
        "bucket",
        F.last("_obs", ignorenulls=True).over(w).alias("value"),
    )


def stream_static_enrich(stream: DataFrame, dim: DataFrame,
                         key: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: a streaming fact source joined to a
    bounded dimension table on ``key``.

    The static side is re-read per micro-batch by Structured Streaming (so
    slowly-changing dims pick up updates between batches) and broadcast —
    the canonical 100 TB enrichment shape: the unbounded stream never
    shuffles for the lookup, no state store is involved, and the same code
    runs in batch (where it degrades to a plain broadcast join)."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), key, "left")
