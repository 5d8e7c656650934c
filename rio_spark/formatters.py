"""Formatters (sinks): canonical triple columns -> serialized RDF text.

Spark re-expression of SURVEY.md §2.2:

* K1 N-Triples  — one ``concat_ws`` per row; the term columns are already
  canonical N-Triples strings (escaping happened once at extraction), so the
  formatter is a pure column expression with no UDF.
* K2 N-Quads    — same plus the optional graph term.
* K3 Turtle     — same-subject (``;``) / same-predicate (``,``) grouping via
  two groupBys with sorted ``collect_list`` — the stateful consecutive-
  grouping of the reference becomes order-insensitive grouping, which is the
  natural (and parallel) Spark form and round-trips to the same graph.

Round-trip property (reference turtle/tests/roundtrip.rs): parse(format(G))
is isomorphic to G — pinned in tests/test_formatters.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def format_ntriples(triples: DataFrame) -> DataFrame:
    """-> one `line` column of N-Triples statements."""
    return triples.select(
        F.concat_ws(" ", "subject", "predicate", "object", F.lit(".")).alias("line")
    )


def format_nquads(quads: DataFrame) -> DataFrame:
    return quads.select(
        F.when(
            F.col("graph").isNull(),
            F.concat_ws(" ", "subject", "predicate", "object", F.lit(".")),
        )
        .otherwise(
            F.concat_ws(" ", "subject", "predicate", "object", "graph", F.lit("."))
        )
        .alias("line")
    )


def format_turtle(triples: DataFrame) -> DataFrame:
    """-> one `block` column per subject:
    ``s p1 o1 , o2 ;\\n  p2 o3 .`` — deterministic (sorted) order."""
    po = (
        triples.groupBy("subject", "predicate")
        .agg(F.array_sort(F.collect_set("object")).alias("objects"))
        .select(
            "subject",
            "predicate",
            F.concat(F.col("predicate"), F.lit(" "), F.array_join("objects", " , ")).alias("po"),
        )
    )
    return (
        po.groupBy("subject")
        .agg(F.array_sort(F.collect_list("po")).alias("pos"))
        .select(
            F.concat(
                F.col("subject"), F.lit(" "), F.array_join("pos", " ;\n  "), F.lit(" .")
            ).alias("block")
        )
    )


def format_trig(quads: DataFrame) -> DataFrame:
    """Graph-level grouping: ``g { <turtle blocks> }``; default graph bare."""
    po = (
        quads.groupBy("graph", "subject", "predicate")
        .agg(F.array_sort(F.collect_set("object")).alias("objects"))
        .select(
            "graph",
            "subject",
            F.concat(F.col("predicate"), F.lit(" "), F.array_join("objects", " , ")).alias("po"),
        )
    )
    blocks = (
        po.groupBy("graph", "subject")
        .agg(F.array_sort(F.collect_list("po")).alias("pos"))
        .select(
            "graph",
            F.concat(
                F.col("subject"), F.lit(" "), F.array_join("pos", " ;\n  "), F.lit(" .")
            ).alias("block"),
        )
    )
    return (
        blocks.groupBy("graph")
        .agg(F.array_sort(F.collect_list("block")).alias("blocks"))
        .select(
            F.when(
                F.col("graph").isNull(), F.array_join("blocks", "\n")
            )
            .otherwise(
                F.concat(
                    F.col("graph"), F.lit(" {\n"), F.array_join("blocks", "\n"), F.lit("\n}")
                )
            )
            .alias("block")
        )
    )
