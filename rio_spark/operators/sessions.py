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


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion: for step k, the users who completed steps
    1..k with strictly increasing timestamps (each step strictly after the
    user's earliest qualifying completion of the previous step).

    -> (step, event_type, users), one row per step.

    Per step: one filtered aggregation (min ts per user, map-side
    combinable) joined to the previous step's frontier on the user key.
    The frontier is one row per surviving user — it SHRINKS monotonically,
    so at 100 TB the per-step join gets cheaper as the funnel deepens, and
    the per-user state is a single timestamp (never an event list)."""
    frontier = None
    rows = []
    for idx, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t")
        )
        if frontier is None:
            cur = ev.groupBy("u").agg(F.min("t").alias("ft"))
        else:
            cur = (
                ev.join(frontier, "u")
                .filter(F.col("t") > F.col("ft"))
                .groupBy("u")
                .agg(F.min("t").alias("ft"))
            )
        frontier = cur
        rows.append(
            cur.groupBy().agg(F.count("*").alias("users")).select(
                F.lit(idx + 1).alias("step"),
                F.lit(step).alias("event_type"),
                "users",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def cohort_retention(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Weekly cohort retention: users grouped by their first active week,
    counted in each subsequent week — the standard engagement matrix, and at
    corpus scale the shape of "contributor freshness" reporting.

    -> (cohort_week, week_offset, n_users). Three map-side-combinable hash
    aggregations and one equi-join on user_id: (user, week) dedup, per-user
    min week, then count per (cohort, offset) — count(*) suffices because
    the dedup already made (user, week) unique, so no expensive
    count-distinct state. Weeks are integer epoch-week numbers (epoch div
    604800), timezone-free and engine-exact — never date_trunc, whose week
    anchoring is a classic cross-engine trap."""
    week = F.floor(ntz_epoch(F.col(ts_col)) / F.lit(604800)).cast("long")
    d = (
        events.select(F.col(user_col).alias("user_id"), week.alias("w"))
        .distinct()
    )
    first = d.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    return (
        d.join(first, "user_id")
        .groupBy("cohort_week", (F.col("w") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count("*").alias("n_users"))
    )


def trailing_user_stats(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
    value_col: str = "value", frame: int = 3,
) -> DataFrame:
    """Per-user daily totals with a trailing-window baseline — the anomaly
    /ramp-detection shape (is today's volume out of line with the user's
    recent days?).

    -> (user_id, day, total, trailing_avg): day totals (one hash aggregate)
    then avg over the previous ``frame`` days' rows via a bounded ROWS frame
    window partitioned by user — parallelizes across users, state bounded by
    the frame, first rows get NULL (empty frame) in both engines. Days are
    integer epoch-days (engine-exact); the frame sums in row order, so even
    float accumulation is deterministic across engines."""
    day = F.floor(ntz_epoch(F.col(ts_col)) / F.lit(86400)).cast("long")
    daily = (
        events.select(F.col(user_col).alias("user_id"), day.alias("day"),
                      F.col(value_col).alias("v"))
        .groupBy("user_id", "day")
        .agg(F.sum("v").alias("total"))
    )
    w = W.partitionBy("user_id").orderBy("day").rowsBetween(-frame, -1)
    return daily.select(
        "user_id", "day",
        F.round("total", 4).alias("total"),
        F.round(F.avg("total").over(w), 4).alias("trailing_avg"),
    )
