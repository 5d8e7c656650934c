"""Stream-static enrichment: the most common production streaming pattern —
an unbounded fact stream joined against a bounded (slowly-changing)
dimension.

Spark executes a stream-static INNER join statelessly: each micro-batch
joins against the current dimension snapshot, no watermark and no state
store involved (state only appears for stream-stream joins).  Broadcasting
the dimension keeps the stream side shuffle-free — at 100 TB/day of events
the dimension (customers, feeds, models) is the small side by orders of
magnitude, and re-broadcasting per batch is what picks up dimension
updates."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def enrich_stream(stream: DataFrame, dim: DataFrame, cond: Column) -> DataFrame:
    """Inner stream-static join with the dimension broadcast."""
    return stream.join(F.broadcast(dim), cond)
