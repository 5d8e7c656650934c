"""Bucketed-table layout for co-located (shuffle-free) joins.

At 100 TB the dominant cost of a large x large equi-join is the shuffle of
both sides. Writing both tables bucketed AND sorted by the join key makes
Spark's bucketed-scan path line partitions up at read time: the join plan
has NO Exchange on either side (and with sorted buckets, no Sort) — the
parquet analogue of the Iceberg `bucket(N, key)` layout the graph store
uses for its subject key (operators/materialize.py).

Rules that make this work (pinned by tests/test_bucketed_join.py):
* both sides bucketed by the SAME key into the SAME bucket count;
* `spark.sql.sources.bucketing.enabled` on (default);
* tables written via ``saveAsTable`` (bucket metadata lives in the catalog —
  a bare ``parquet(path)`` write loses it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8,
    path: str | None = None, sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and sorted) by ``key`` as a catalog table.
    ``path`` makes it an external table (keeps test warehouses in tmp)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left: str, right: str, key: str) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key — planned
    without a shuffle on either side."""
    return spark.table(left).join(spark.table(right), key)
