"""The SQL surface reaches the same data/plans as the DataFrame API."""

from pyspark.sql import functions as F

from rio_spark.plans.views import register_tables, register_triples
from rio_spark.plans.catalog import q_kg_extract_turtle

SF_DIR = "/root/testdata/sf0.001"


def test_sql_over_tables(spark):
    register_tables(spark, SF_DIR)
    got = spark.sql(
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1"
    ).collect()
    want = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy("l_returnflag").agg(F.count("*").alias("n"))
        .orderBy("l_returnflag").collect()
    )
    assert got == want


def test_sql_over_triples(spark):
    register_triples(spark, q_kg_extract_turtle(spark, SF_DIR))
    rows = spark.sql(
        "SELECT predicate, count(*) AS n FROM triples GROUP BY 1 ORDER BY 1"
    ).collect()
    assert [r["predicate"] for r in rows] == [
        "<http://ex.org/p/lang>", "<http://ex.org/p/nchars>"
    ]
    assert all(r["n"] == 500 for r in rows)
