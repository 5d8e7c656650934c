"""Sessionization and event-stream aggregations over the events table.

Batch form: gap-based sessionization with ``lag`` + conditional cumsum —
the standard Spark window composition; one shuffle on user_id. The streaming
form (rio_spark.streaming.windows) uses session_window/watermarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def ntz_epoch(col):
    """Wall-clock (TIMESTAMP_NTZ) -> epoch seconds, independent of the
    session timezone (a plain NTZ->TIMESTAMP->LONG cast would shift by the
    session offset and break oracle comparisons on non-UTC sessions)."""
    return (
        F.unix_date(col.cast("date")) * 86400
        + F.hour(col) * 3600
        + F.minute(col) * 60
        + F.second(col)
    ).cast("long")


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """-> events + session_id (user-scoped counter) via lag/gap/cumsum."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = ntz_epoch(F.col("ts"))
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
