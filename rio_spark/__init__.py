"""rio_spark — a PySpark-native knowledge-graph construction engine.

From-scratch re-expression of the reference's (oxigraph/rio) streaming RDF
parsing semantics as vectorized Arrow/pandas kernels over Spark DataFrames,
plus the relational stages the north rule adds: conversation-document
assembly, entity linking, connected-components canonicalization, and
merge-with-lineage materialization. See SURVEY.md for the full blueprint.
"""

__version__ = "0.1.0"
