"""Watermarked stream-stream interval join.

The missing piece of the streaming surface next to stream-static enrich
(enrich.py): joining two UNBOUNDED sides. Spark buffers both sides in the
state store; the join is only feasible at scale because the two watermarks
plus a time-range predicate bound how long a row can wait for a match, so
state is evicted instead of growing with the stream. This is the standard
attribution shape (click -> purchase within an hour) a training-data event
pipeline needs.

Plan shape: both sides shuffle on the join key per micro-batch
(state-store partitioned by key), state size = key cardinality x the
interval span x arrival rate — independent of total stream length. At
10^12 events the knobs are the interval (``within``) and the watermark
delay; the join itself never rescans history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner stream-stream join: rows match when they share ``key`` and the
    right event lands in ``[left_ts, left_ts + within]``.

    Both sides MUST carry distinct column names apart from ``key`` (rename
    before calling); both get the same ``watermark`` so Spark can compute
    the state eviction bound from the time-range condition.

    Skew hazard, by construction: output is |L_w x R_w| per key per
    interval window, so a hot key (a bot clicking AND purchasing thousands
    of times an hour) emits quadratically. When one match per right row is
    the real semantics (attribution), prefer the as-of join
    (operators/asof.py) on the batch path — output bounded at |R| — or
    pre-aggregate/cap the hot side before this join; the same bounded-cap
    pattern as dedup.minhash_lsh_pairs(bucket_cap=) applies.
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").drop(r[key])
