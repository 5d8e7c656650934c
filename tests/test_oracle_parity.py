"""Local replica of the driver's correctness gate: run every catalog query on
Spark AND its DuckDB oracle at sf0.001, compare row count, column names, and
order-insensitive values (floats rounded in the queries themselves)."""

import math

import duckdb
import pandas as pd
import pytest

from rio_spark.plans.catalog import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        out = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                out.append(None)
            elif isinstance(v, float):
                out.append(round(v, 9))
            else:
                out.append(v)
        rows.append(tuple(out))
    return sorted(rows, key=repr)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    want = duck.execute(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows vs {len(want)}"
    cg, cw = canon(got), canon(want)
    mismatches = [(a, b) for a, b in zip(cg, cw) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_all_queries_have_callables():
    for name in ORACLES:
        assert name in QUERIES
    # round 2: every query has an oracle (multimodal included)
    assert set(QUERIES) == set(ORACLES)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "subject", "predicate", "object"}
