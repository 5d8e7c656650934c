"""Distributed precision/recall of an emitted triple set vs a golden set.

The small-graph per-document oracle (rio_spark.testing.isomorphism) is exact
under blank-node renaming but driver-side; this is its cluster-scale
companion for the BASELINE P/R >= 0.95 gate over the whole corpus: set
intersection via anti-joins (SURVEY.md §2.7), with blank nodes wildcarded to
a positional marker so label choices don't count as mismatches (a sound
over-approximation of isomorphic credit; per-doc exactness stays with the
driver-side oracle on sampled documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_BNODE_WILDCARD = r"_:[^ ]+"


def _normalized(df: DataFrame, per_doc: bool) -> DataFrame:
    cols = [
        F.regexp_replace(F.col(c), _BNODE_WILDCARD, "_:•").alias(c)
        for c in ("subject", "predicate", "object")
    ]
    if "graph" in df.columns:
        cols.append(
            F.regexp_replace(F.coalesce(F.col("graph"), F.lit("")), _BNODE_WILDCARD, "_:•").alias("graph")
        )
    else:
        cols.append(F.lit("").alias("graph"))
    key = ([F.col("doc_id")] if per_doc and "doc_id" in df.columns else [])
    return df.select(*key, *cols).distinct()


def precision_recall(
    emitted: DataFrame, golden: DataFrame, per_doc: bool = True
) -> dict:
    """-> {tp, fp, fn, precision, recall}; one pair of anti-joins, fully
    distributed (no driver materialization of the triple sets)."""
    e = _normalized(emitted, per_doc)
    g = _normalized(golden, per_doc)
    on = [c for c in e.columns]
    fp = e.join(g, on, "left_anti").count()
    fn = g.join(e, on, "left_anti").count()
    n_e = e.count()
    n_g = g.count()
    tp = n_e - fp
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "precision": tp / n_e if n_e else 1.0,
        "recall": tp / n_g if n_g else 1.0,
    }
