"""As-of (point-in-time) join — a training-pipeline staple Spark lacks as a
built-in: for every left row, attach the most recent right row with
``right.ts <= left.ts`` for the same key.

Spark-first design: NOT a range theta-join (that's a cartesian scale-killer)
and NOT a per-key loop. Both sides are union-tagged onto one stream, shuffled
ONCE on the key, and the right row's payload is forward-filled with
``last(..., ignorenulls=True)`` over (key, ts, side) ordering — the classic
merge-asof as a single window pass. Cost: one shuffle + one sort, same as any
windowed aggregation; skewed keys behave exactly like any hot window key
(pre-filter or salt upstream if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    payload: list[str] | None = None,
    prefix: str = "asof_",
    strict: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """left rows + the latest right row at-or-before (``strict``: strictly
    before) the left row's timestamp, per ``on`` key.

    ``payload``: right columns to carry (default: all but key/ts). Carried
    columns are prefixed. Ties on equal timestamps resolve right-before-left
    (a right row AT the left timestamp is visible unless ``strict``);
    ``tiebreak`` (a right column, e.g. an event id) makes the winner among
    same-timestamp right rows deterministic (max wins).
    """
    if payload is None:
        payload = [c for c in right.columns if c not in (on, ts)]
    # the left fallback must carry the RIGHT side's tiebreak dtype: a bare
    # int literal would make the union's _tb column mismatch (analysis error)
    # whenever the tiebreak column is e.g. a string event id. NULL sorts
    # first under asc, so left rows stay tie-neutral.
    if tiebreak:
        tb_r = F.col(tiebreak)
        tb_l = (
            F.col(tiebreak)
            if tiebreak in left.columns
            else F.lit(None).cast(right.schema[tiebreak].dataType)
        )
    else:
        tb_l = tb_r = F.lit(0)
    # the right payload travels as ONE struct (null for left rows) and the
    # window fills THE STRUCT, never per-column: per-column fills would mix
    # fields from different right rows whenever a payload column is null
    r_struct = F.struct(*[F.col(c) for c in payload])
    l_tag = left.select(
        F.col(on), F.col(ts),
        F.lit(1).alias("_side"),
        tb_l.alias("_tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(right.select(r_struct).schema[0].dataType).alias("_r"),
    )
    r_tag = right.select(
        F.col(on), F.col(ts),
        F.lit(0).alias("_side"),
        tb_r.alias("_tb"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    # side order makes the tie policy: right(0) sorts before left(1) at equal
    # ts, so a same-instant right row is already "seen" by the fill — unless
    # strict, where left sorts first and cannot see it.
    side = F.col("_side") if not strict else (1 - F.col("_side"))
    w = (
        W.partitionBy(on)
        .orderBy(F.col(ts).asc(), side.asc(), F.col("_tb").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = l_tag.unionByName(r_tag).select(
        "*", F.last(F.col("_r"), ignorenulls=True).over(w).alias("_r_fill")
    )
    out_cols = [F.col("_l")[c].alias(c) for c in left.columns]
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *out_cols,
            *[F.col("_r_fill")[c].alias(f"{prefix}{c}") for c in payload],
        )
    )
