"""r7 optimization gate for the vectorized LSH pair scorer: the grouped
numpy kernel must be BIT-identical to the join formulation it replaced —
same pair set, same rounded cosine doubles — and the Python HALF_UP
rounding helper must match Spark's Round expression exactly, or the
driver's hash comparison against the DuckDB oracle would flake at the
rounding grid."""

import random

import pytest
from pyspark.sql import functions as F

from rio_spark.operators.similarity import (
    _bucket_expr,
    _dot,
    _norm,
    _round_half_up,
    collect_planes,
    cosine_pairs_lsh,
)


def _join_pairs(embeddings, threshold, n_planes=4, round_to=4):
    """The pre-r7 join formulation, kept verbatim as the differential twin
    of the vectorized scorer (interpreted ArrayAggregate dot per pair)."""
    planes = collect_planes(embeddings, n_planes)
    v = F.col("embedding").cast("array<double>")
    e = embeddings.select(
        F.col("vec_id"), v.alias("v"),
        _bucket_expr("embedding", planes).alias("bucket"),
        _norm(v).alias("n"),
    )
    a, b = e.alias("a"), e.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.n") * F.col("b.n"))
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, round_to).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


@pytest.mark.parametrize("sf", ["0.001", "0.01"])
def test_vectorized_pairs_match_join_formulation(spark, sf):
    emb = spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")
    got = {(r["vec_a"], r["vec_b"]): r["cosine"]
           for r in cosine_pairs_lsh(emb, threshold=0.3, n_planes=4).collect()}
    want = {(r["vec_a"], r["vec_b"]): r["cosine"]
            for r in _join_pairs(emb, threshold=0.3).collect()}
    assert got == want  # pair sets AND bit-identical rounded cosines


def test_vectorized_pairs_zero_norm_raises_like_ansi_division(spark):
    """A zero-norm vector meeting a bucket partner divides by zero in the
    join formulation's pair cosine — ANSI Spark (the session default)
    raises there; the vectorized scorer must raise too, not silently emit
    NaN pairs the join would never return."""
    rows = [(i, [0.0, 0.0, 0.0, 0.0]) for i in range(4)] + [
        (4, [1.0, 0.0, 0.0, 0.0]), (5, [1.0, 0.0, 0.0, 0.0]),
        (6, [-1.0, 0.5, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        _join_pairs(emb, threshold=0.3, n_planes=2).collect()
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        cosine_pairs_lsh(emb, threshold=0.3, n_planes=2).collect()


def test_round_half_up_matches_spark_round(spark):
    rnd = random.Random(7)
    vals = [rnd.uniform(-1.0, 1.0) for _ in range(2000)]
    # adversarial: values at/near the 4-decimal HALF_UP midpoints, where
    # shortest-repr rounding and binary-value rounding can disagree
    vals += [rnd.randint(0, 10**8) / 10**4 + 5e-5 for _ in range(300)]
    vals += [-v for v in vals[-300:]]
    vals += [0.29995, 0.30004999999, -0.29995, 0.12345, 0.1234500000001,
             1e-5, -1e-5, 0.0, -0.0, 123.456789, -0.99995]
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = [r["r"] for r in df.select(F.round("x", 4).alias("r")).collect()]
    want = [_round_half_up(float(v), 4) for v in vals]
    assert got == want
