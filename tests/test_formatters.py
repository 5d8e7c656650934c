"""Formatter round-trips (reference turtle/tests/roundtrip.rs semantics):
parse(format(G)) is isomorphic to G, for NT, NQ, and grouped Turtle/TriG."""

import pandas as pd
import pytest

from rio_spark.formatters import format_nquads, format_ntriples, format_trig, format_turtle
from rio_spark.kernels import parse_nquads, parse_ntriples, parse_trig, parse_turtle
from rio_spark.model import serialize_triples
from rio_spark.testing.isomorphism import are_isomorphic

ROWS = [
    ("d", "<http://e/s>", "<http://e/p>", "<http://e/o>", None),
    ("d", "<http://e/s>", "<http://e/p>", '"lit with \\"quotes\\" and \\n newline"', None),
    ("d", "<http://e/s>", "<http://e/q>", '"v"@en', None),
    ("d", "<http://e/s2>", "<http://e/p>", '"42"^^<http://www.w3.org/2001/XMLSchema#integer>', None),
    ("d", "_:b0", "<http://e/p>", "_:b1", None),
    ("d", "<http://e/s3>", "<http://e/p>", "<http://e/o>", "<http://e/g>"),
    ("d", "<http://e/s3>", "<http://e/r>", '"x"', "<http://e/g>"),
]


@pytest.fixture(scope="module")
def quads_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(ROWS, columns=["doc_id", "subject", "predicate", "object", "graph"])
    )


def _triple_rows(include_graph=False):
    if include_graph:
        return [(s, p, o, g) for _, s, p, o, g in ROWS]
    return [(s, p, o) for _, s, p, o, g in ROWS if g is None]


def test_ntriples_roundtrip(spark, quads_df):
    lines = format_ntriples(quads_df.filter("graph IS NULL")).toPandas()["line"]
    doc = "\n".join(lines)
    t, errs = parse_ntriples(doc)
    assert not errs
    assert are_isomorphic(serialize_triples(t), _triple_rows())


def test_nquads_roundtrip(spark, quads_df):
    lines = format_nquads(quads_df).toPandas()["line"]
    t, errs = parse_nquads("\n".join(lines))
    assert not errs
    assert are_isomorphic(serialize_triples(t), _triple_rows(include_graph=True))


def test_turtle_roundtrip_and_grouping(spark, quads_df):
    df = quads_df.filter("graph IS NULL")
    blocks = format_turtle(df).toPandas()["block"]
    # same-subject grouping: one block per subject
    assert len(blocks) == df.select("subject").distinct().count()
    s_block = next(b for b in blocks if b.startswith("<http://e/s>"))
    assert " ;\n  " in s_block and " , " in s_block
    t, errs = parse_turtle("\n".join(blocks))
    assert not errs
    assert are_isomorphic(serialize_triples(t), _triple_rows())


def test_trig_roundtrip(spark, quads_df):
    blocks = format_trig(quads_df).toPandas()["block"]
    t, errs = parse_trig("\n".join(blocks))
    assert not errs
    assert are_isomorphic(serialize_triples(t), _triple_rows(include_graph=True))


def test_rdfxml_roundtrip(spark, quads_df):
    from rio_spark.formatters import format_rdfxml
    from rio_spark.kernels import parse_rdfxml

    df = quads_df.filter("graph IS NULL")
    blocks = format_rdfxml(df).toPandas()["block"]
    doc = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">\n'
        + "\n".join(blocks)
        + "\n</rdf:RDF>"
    )
    t, errs = parse_rdfxml(doc)
    assert not errs, (errs, doc)
    assert are_isomorphic(serialize_triples(t), _triple_rows())


def test_qualify_and_prefixed_turtle_roundtrip(spark):
    """serd qualify behavior: IRIs compressed to pnames under declared
    prefixes, then grouped-Turtle output re-parses to the same graph."""
    from rio_spark.formatters import qualify_iris, turtle_prefix_header

    rows = [
        ("d", "<http://example.org/s>", "<http://example.org/p>", "<http://example.org/o>", None),
        ("d", "<http://example.org/s>", "<http://other.org/q>", '"lit"', None),
        ("d", "<http://example.org/ns#x>", "<http://example.org/ns#y>", "<http://example.org/bad/path>", None),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "subject", "predicate", "object", "graph"])
    )
    prefixes = {"eg": "http://example.org/", "ns": "http://example.org/ns#"}
    q = qualify_iris(df, prefixes)
    got = {r["subject"] for r in q.collect()}
    assert "eg:s" in got and "ns:x" in got
    objs = {r["object"] for r in q.collect()}
    assert "<http://example.org/bad/path>" in objs  # '/' in local -> stays an IRI
    doc = turtle_prefix_header(prefixes) + "\n" + "\n".join(
        format_turtle(q).toPandas()["block"]
    )
    t, errs = parse_turtle(doc)
    assert not errs
    assert are_isomorphic(
        serialize_triples(t), [(s, p, o) for _, s, p, o, g in rows]
    )


def test_formatters_are_pure_column_ops(spark, quads_df):
    from rio_spark.formatters import format_rdfxml

    for fmt in (format_ntriples, format_nquads, format_turtle, format_trig, format_rdfxml):
        plan = fmt(quads_df)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "MapInPandas" not in plan


def test_w3c_style_suite_roundtrips(spark):
    """Every eval graph of the in-repo W3C-style suite (tests/w3c_style —
    RDF-star annotations, nested collections, ECHAR/UCHAR content, BCP-47
    tags, XML-literal datatypes) survives format->reparse: the suite's
    corner graphs are exactly where a formatter's escaping/grouping breaks
    first. Triple formats round-trip through NT and grouped Turtle; quad
    formats through NQ and TriG. (RDF/XML's formatter is excluded: RDF-star
    terms are not expressible in RDF/XML.)"""
    from pathlib import Path

    from rio_spark.testing.manifest import PARSERS, url_mapper, walk_manifest

    url = "http://rio-spark.test/w3c-style"
    to_path = url_mapper(url, Path(__file__).parent / "w3c_style")
    triples, quads = [], []
    for i, t in enumerate(walk_manifest(f"{url}/manifest.ttl", to_path)):
        if t.kind != "eval":
            continue
        body = to_path(t.action).read_text()
        parsed, errors = PARSERS[t.format](body, t.action)
        assert not errors, (t.name, errors[:2])
        rows = serialize_triples(parsed, scope=f"d{i}_")
        (quads if t.format in ("nq", "trig") else triples).extend(rows)
    assert triples and quads

    tdf = spark.createDataFrame(
        pd.DataFrame(triples, columns=["subject", "predicate", "object"])
    )
    qdf = spark.createDataFrame(
        pd.DataFrame(quads, columns=["subject", "predicate", "object", "graph"])
    )
    for fmt, df, parse, col in (
        (format_ntriples, tdf, parse_ntriples, "line"),
        (format_turtle, tdf, parse_turtle, "block"),
        (format_nquads, qdf, parse_nquads, "line"),
        (format_trig, qdf, parse_trig, "block"),
    ):
        doc = "\n".join(r[col] for r in fmt(df).collect())
        reparsed, errs = parse(doc)
        assert not errs, (fmt.__name__, errs[:2])
        assert are_isomorphic(
            serialize_triples(reparsed), [tuple(r) for r in df.collect()]
        ), fmt.__name__
