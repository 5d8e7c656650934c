"""Distribution statistics for pipeline telemetry (quality gates, drift
monitoring over training-data streams)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact per-group quantiles via SQL-standard PERCENTILE_DISC.

    percentile_disc picks an ACTUAL data value (type-1 / discrete quantile),
    so results are bit-identical across engines — no interpolation
    arithmetic to diverge (verified: Spark percentile_disc == DuckDB
    quantile_disc on the events table).  Exactness costs a per-group sort
    of the values; at 100 TB switch the caller to approx_percentile
    (t-digest, mergeable sketches) and accept the documented error bound —
    the exact version stays as the oracle for the sketch."""
    aggs = [
        F.expr(
            f"percentile_disc({p}) WITHIN GROUP (ORDER BY {value_col})"
        ).alias(f"p{int(round(p * 100))}")
        for p in probs
    ]
    return df.groupBy(group_col).agg(*aggs).orderBy(group_col)
