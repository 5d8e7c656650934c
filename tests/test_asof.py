"""As-of join semantics: at-or-before vs strict, tie-break determinism,
no-match nulls, and the plan shape (one window pass, never a range
theta-join)."""

import datetime as dt

from pyspark.sql import functions as F

from rio_spark.operators.asof import asof_join


def ts(s):
    return dt.datetime.fromisoformat(s)


def frames(spark):
    left = spark.createDataFrame(
        [("u1", ts("2024-01-01T10:00:00"), "l1"),
         ("u1", ts("2024-01-01T12:00:00"), "l2"),
         ("u2", ts("2024-01-01T09:00:00"), "l3")],
        "k string, ts timestamp, lid string",
    )
    right = spark.createDataFrame(
        [("u1", ts("2024-01-01T09:30:00"), 1, "a"),
         ("u1", ts("2024-01-01T10:00:00"), 2, "b"),
         ("u1", ts("2024-01-01T10:00:00"), 3, "c"),  # tie on ts with id 2
         ("u1", ts("2024-01-01T11:00:00"), 4, "d")],
        "k string, ts timestamp, rid int, val string",
    )
    return left, right


def test_at_or_before_with_tiebreak(spark):
    left, right = frames(spark)
    out = asof_join(left, right, on="k", ts="ts", payload=["rid", "val"],
                    tiebreak="rid")
    rows = {r["lid"]: (r["asof_rid"], r["asof_val"]) for r in out.collect()}
    # l1 at 10:00 sees the 10:00 rows; max rid among the tie wins
    assert rows["l1"] == (3, "c")
    assert rows["l2"] == (4, "d")
    assert rows["l3"] == (None, None)  # u2 has no right rows


def test_strict_excludes_same_instant(spark):
    left, right = frames(spark)
    out = asof_join(left, right, on="k", ts="ts", payload=["rid"],
                    tiebreak="rid", strict=True)
    rows = {r["lid"]: r["asof_rid"] for r in out.collect()}
    assert rows["l1"] == 1  # 10:00 rows invisible; 09:30 wins
    assert rows["l2"] == 4


def test_left_columns_preserved(spark):
    left, right = frames(spark)
    out = asof_join(left, right, on="k", ts="ts", payload=["rid"], tiebreak="rid")
    assert set(out.columns) == {"k", "ts", "lid", "asof_rid"}
    assert out.count() == 3


def test_null_payload_fields_do_not_mix_rows(spark):
    """The fill must be whole-row: a null payload field in the latest right
    row must NOT be backfilled from an older right row."""
    left = spark.createDataFrame(
        [("u1", ts("2024-01-01T12:00:00"), "l1")], "k string, ts timestamp, lid string"
    )
    right = spark.createDataFrame(
        [("u1", ts("2024-01-01T10:00:00"), 1, "old"),
         ("u1", ts("2024-01-01T11:00:00"), 2, None)],
        "k string, ts timestamp, rid int, val string",
    )
    out = asof_join(left, right, on="k", ts="ts", payload=["rid", "val"],
                    tiebreak="rid").collect()
    assert (out[0]["asof_rid"], out[0]["asof_val"]) == (2, None)


def test_plan_is_single_window_no_join(spark):
    left, right = frames(spark)
    out = asof_join(left, right, on="k", ts="ts", payload=["rid"], tiebreak="rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for join in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct",
                 "BroadcastHashJoin"):
        assert join not in plan
    assert "Window" in plan
