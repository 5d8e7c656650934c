"""Bucketed co-located join: same-key, same-count bucketed tables join with
NO Exchange in the physical plan (the 100 TB join strategy the graph store's
subject bucketing is designed for)."""

import pytest

from pyspark.sql import functions as F

from rio_spark.operators.bucketing import bucketed_join, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    write_bucketed(li, "li_b", "l_orderkey", 8, path=str(tmp_path / "li"))
    write_bucketed(o, "o_b", "l_orderkey", 8, path=str(tmp_path / "o"))
    # sf0.001 tables fit under the broadcast threshold, which would win the
    # plan and bypass bucketed scans; the scenario bucketing exists for is
    # large x large, so pin the sort-merge path for the plan assertions
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield "li_b", "o_b"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_b, o_b = bucketed_tables
    joined = bucketed_join(spark, li_b, o_b, "l_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan

    # and it computes the same thing as the shuffled join
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    want = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert joined.count() == want


def test_bucketed_agg_skips_shuffle(spark, bucketed_tables):
    li_b, _ = bucketed_tables
    agg = spark.table(li_b).groupBy("l_orderkey").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # grouping on the bucket key reuses the bucketing — no Exchange
    assert "Exchange" not in plan, plan
