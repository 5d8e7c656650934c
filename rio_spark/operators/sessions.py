"""Sessionization and event-stream aggregations over the events table.

Batch form: gap-based sessionization with ``lag`` + conditional cumsum —
the standard Spark window composition; one shuffle on user_id. The streaming
form (rio_spark.streaming.windows) uses session_window/watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """-> events + session_id (user-scoped counter) via lag/gap/cumsum."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet may carry TIMESTAMP_NTZ; go via TIMESTAMP (session tz = UTC)
    # because ANSI mode forbids a direct NTZ -> BIGINT cast
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return events.withColumn(
        "session_id", F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, 0))
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """-> (user_id, session_id, n_events, t_start, t_end, total_value)."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def tumbling_counts(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling-window event counts (batch analogue of the streaming agg)."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
