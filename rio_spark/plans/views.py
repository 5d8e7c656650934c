"""SQL surface: register the test-data tables and engine outputs as temp
views so everything the catalog does via the DataFrame API is equally
reachable through ``spark.sql(...)`` — same Catalyst plans either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rio_spark.testing.parity import TABLES


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """One temp view per test-data parquet table (mirrors the DuckDB oracle
    environment, so oracle SQL strings run on Spark too — modulo dialect)."""
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def register_triples(spark: SparkSession, triples: DataFrame,
                     name: str = "triples") -> None:
    """Expose an extracted triple frame to SQL:
    ``spark.sql("SELECT predicate, count(*) FROM triples GROUP BY 1")``."""
    triples.createOrReplaceTempView(name)
