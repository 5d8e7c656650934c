"""Pure-Python grammar kernels (no Spark imports).

These re-express the reference's grammar micro-operators (SURVEY.md §2.3,
/root/reference/turtle/src/shared.rs, turtle.rs, ntriples.rs) as plain
functions that run *inside* vectorized ``mapInPandas`` batches — one document
per call, batches of documents per Arrow chunk. They are unit-testable
without a SparkSession.
"""

from rio_spark.kernels.errors import ParseError
from rio_spark.kernels.ntriples import (
    parse_generalized_nquads,
    parse_ntriples,
    parse_nquads,
)
from rio_spark.kernels.rdfxml import parse_rdfxml
from rio_spark.kernels.turtle import parse_gtrig, parse_turtle, parse_trig

__all__ = [
    "ParseError",
    "parse_generalized_nquads",
    "parse_gtrig",
    "parse_ntriples",
    "parse_nquads",
    "parse_rdfxml",
    "parse_turtle",
    "parse_trig",
]
