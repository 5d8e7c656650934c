"""Vectorized triple extraction: assembled documents -> triples + error rows.

The Spark re-expression of the reference's streaming callback parsers
(SURVEY.md §3.1): one ``mapInPandas`` over Arrow batches of documents; each
batch row is a whole conversation document, parsed by the pure-Python grammar
kernels; the UDF *flat-maps* one document row into N triple rows plus M error
rows (errors are rows, never job failures — SURVEY.md §2.5 F1/F2). No
per-row Python UDFs anywhere; Python cost is amortized over Arrow batches and
the downstream pipeline is 100% JVM column ops over canonical strings.

Blank nodes are relabelled deterministically per document:
``_:{doc}_b{k}`` in first-occurrence order (G22 — blank-node scope is one
conversation document).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from rio_spark.kernels import parse_nquads, parse_ntriples, parse_trig, parse_turtle
from rio_spark.model import serialize_triples

EXTRACT_SCHEMA = (
    "doc_id string, subject string, predicate string, object string, graph string, "
    "error_kind string, error_line int, error_byte int, error_msg string"
)

_PARSERS = {
    "nt": lambda text, base: parse_ntriples(text),
    "nq": lambda text, base: parse_nquads(text),
    "ttl": parse_turtle,
    "trig": parse_trig,
}

_SCOPE_SANITIZE = re.compile(r"[^A-Za-z0-9]")


def parse_document(doc_id: str, fmt: str, text: str, base_iri: str | None):
    """Parse one document -> (triple rows, error rows) with canonical strings
    and doc-scoped deterministic blank-node ids. Pure function (unit-testable
    without Spark)."""
    parser = _PARSERS.get(fmt)
    if parser is None:
        return [], [(doc_id, "UnsupportedFormat", 0, 0, f"unknown format {fmt!r}")]
    triples, errors = parser(text, base_iri)
    scope = _SCOPE_SANITIZE.sub("_", doc_id) + "_"
    rows = []
    for row in serialize_triples(triples, scope=scope):
        s, p, o = row[0], row[1], row[2]
        g = row[3] if len(row) == 4 else None
        rows.append((doc_id, s, p, o, g))
    err_rows = [
        (doc_id, e["kind"], int(e["line"]), int(e["byte"]), e["msg"]) for e in errors
    ]
    return rows, err_rows


def extract_triples(
    docs: DataFrame,
    fmt: str | None = None,
    id_col: str = "conv_id",
    text_col: str = "text",
    format_col: str = "format",
    base_col: str = "base_iri",
) -> DataFrame:
    """Documents DF -> unified triples/errors DF (EXTRACT_SCHEMA).

    ``fmt`` fixes the format for the whole frame; otherwise it is read from
    ``format_col``. ``base_col`` is optional (null base = absolute IRIs only).
    Split the result with :func:`triples_of` / :func:`errors_of`.
    """
    cols = set(docs.columns)
    has_format = fmt is None and format_col in cols
    has_base = base_col in cols

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            t_rows: list[tuple] = []
            e_rows: list[tuple] = []
            ids = pdf[id_col].astype(str)
            texts = pdf[text_col]
            fmts = pdf[format_col] if has_format else None
            bases = pdf[base_col] if has_base else None
            for k in range(len(pdf)):
                doc_fmt = fmts.iloc[k] if fmts is not None else fmt
                base = bases.iloc[k] if bases is not None else None
                if base is not None and not isinstance(base, str):
                    base = None
                tr, er = parse_document(ids.iloc[k], doc_fmt, texts.iloc[k], base)
                t_rows.extend(tr)
                e_rows.extend(er)
            out = pd.DataFrame(
                [(d, s, p, o, g, None, None, None, None) for d, s, p, o, g in t_rows]
                + [(d, None, None, None, None, k, l, b, m) for d, k, l, b, m in e_rows],
                columns=[
                    "doc_id", "subject", "predicate", "object", "graph",
                    "error_kind", "error_line", "error_byte", "error_msg",
                ],
            )
            out["error_line"] = out["error_line"].astype("Int32")
            out["error_byte"] = out["error_byte"].astype("Int32")
            yield out

    return docs.mapInPandas(fn, schema=EXTRACT_SCHEMA)


def triples_of(extracted: DataFrame) -> DataFrame:
    """Good rows only, error columns dropped."""
    return extracted.filter(F.col("error_kind").isNull()).select(
        "doc_id", "subject", "predicate", "object", "graph"
    )


def errors_of(extracted: DataFrame) -> DataFrame:
    return extracted.filter(F.col("error_kind").isNotNull()).select(
        "doc_id", "error_kind", "error_line", "error_byte", "error_msg"
    )


def strict_triples(extracted: DataFrame) -> DataFrame:
    """Conformance-mode filter: drop ALL triples from documents that produced
    any error row (the reference's parse_all returns Err for the whole doc —
    salvaged triples are never collected). Production pipelines keep salvage;
    eval suites use this."""
    bad_docs = extracted.filter(F.col("error_kind").isNotNull()).select("doc_id").distinct()
    return triples_of(extracted).join(bad_docs, "doc_id", "left_anti")


def dedup_triples(triples: DataFrame) -> DataFrame:
    """Dataset set semantics (a dataset is a deduplicated set of quads —
    SURVEY.md §1.1): global distinct over the quad key."""
    return triples.dropDuplicates(["subject", "predicate", "object", "graph"])
