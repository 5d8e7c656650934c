"""Structured Streaming forms of the event aggregations.

The reference's "streaming" is incremental single-pass IO, not event-time
streaming (SURVEY.md §2.8); these operators are the forward-looking ingest
path: watermarked tumbling windows and session windows over an event stream.
Tests drive them with a file source + memory sink and
``processAllAvailable`` for synchronous completion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(
    spark, path: str, glob: str | None = None, max_files: int = 4
) -> DataFrame:
    """File-source event stream. ``path`` must be a directory (Spark's file
    source requires a basePath); pass ``glob`` to select one table's file(s)
    inside a directory of many (e.g. ``events.parquet`` in an sf dir).
    ``max_files=1`` gives one micro-batch per file in modification-time
    order — the replay knob the watermark-closed operators (e.g. the capped
    interval join's sentinel flush) rely on."""
    reader = spark.readStream.schema(EVENT_SCHEMA).option(
        "maxFilesPerTrigger", max_files
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.parquet(path)


def windowed_counts_stream(events: DataFrame, minutes: int = 60,
                           watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts; late rows beyond the watermark
    are dropped instead of growing state forever."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total_value")
    )


def session_windows_stream(events: DataFrame, gap_minutes: int = 30,
                           watermark: str = "2 hours") -> DataFrame:
    """Gap-based session windows (built-in session_window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "complete"):
    """Drive a streaming query to completion against currently-available
    files; returns the query (caller reads `SELECT * FROM <name>`).
    Default mode is ``complete``: with a static file source the watermark
    never advances past the last window, so ``append`` would emit nothing."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q
