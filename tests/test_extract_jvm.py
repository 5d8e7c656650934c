"""Differential tests: the JVM fast-line pre-pass (operators/extract_jvm.py)
must produce row-for-row identical output to the pure-Python kernel path on
every line category — fast, slow, error, blank, mixed formats.  The pre-pass
may only change WHERE a line is parsed, never the result."""

import pytest

from pyspark.sql import functions as F

from rio_spark.operators.extract import extract_triples

TRICKY_NT = (
    '<http://a/s> <http://a/p> <http://a/o> .\n'
    '<http://a/s> <http://a/p> "lit with space" .\n'
    '<http://a/s> <http://a/p> "typed"^^<http://www.w3.org/2001/XMLSchema#int> .\n'
    '<http://a/s> <http://a/p> "lang"@EN-gb .\n'          # mixed-case tag -> lowered
    '  # comment line\n'
    '\n'
    '<http://a/s> <http://a/p> "esc\\nline" .\n'          # backslash -> slow path
    '_:b1 <http://a/p> _:b2 .\n'                          # bnodes -> slow, doc-scoped ids
    '<http://a/s> <http://a/p> "tab\there" .\n'           # raw TAB -> canonical \\t
    '<rel/iri> <http://a/p> <http://a/o> .\n'             # relative IRI -> error row
    'garbage line\n'                                      # error row, correct lineno
    '<http://a/s> <http://a/p> "bad lang"@123 .\n'        # invalid tag -> error row
    '<http://a/s> <http://a/p> <http://a/o> . # trail\n'  # trailing comment
    '<http://a/s2> <http://a/p> "" .\n'                   # empty literal
    '<http://a/s> <http://a/p> "irr"@I-KLINGON .\n'       # irregular BCP-47, any case
    '<< <http://a/s> <http://a/p> <http://a/o> >> <http://a/q> "star" .'  # RDF-star
)
TRICKY_NQ = (
    '<http://a/s> <http://a/p> <http://a/o> <http://g/1> .\n'
    '<http://a/s> <http://a/p> "v" .\n'                   # default graph
    '<http://a/s> <http://a/p> "v"@fr <http://g/2> .\n'
    '_:g <http://a/p> <http://a/o> _:gg .\n'              # bnode graph -> slow
    '<http://a/s> <http://a/p> <http://a/o> <> .'         # empty graph IRI -> error
)

DOCS = [
    ("d1", "nt", TRICKY_NT),
    ("d2", "nq", TRICKY_NQ),
    ("d3", "ttl", "@prefix ex: <http://e/> .\nex:a ex:b ex:c , ex:d ."),
    ("d4", "nt", ""),                                     # empty document
    ("d5", "nt", '<http://a/s> <http://a/p> "x"^^<> .'),  # empty datatype -> error
    ("d6", "zzz", "whatever"),                            # UnsupportedFormat error
]


def _rows(df):
    return sorted(
        tuple("" if v is None else str(v) for v in r) for r in df.collect()
    )


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "conv_id string, format string, text string")


def test_mixed_format_differential(docs_df):
    jvm = _rows(extract_triples(docs_df, jvm_fast=True))
    py = _rows(extract_triples(docs_df, jvm_fast=False))
    assert jvm == py
    assert len(jvm) > 20  # triples AND error rows present


def test_fixed_fmt_differential(docs_df):
    nt = docs_df.filter("format = 'nt'")
    jvm = _rows(extract_triples(nt, fmt="nt", jvm_fast=True))
    py = _rows(extract_triples(nt, fmt="nt", jvm_fast=False))
    assert jvm == py


def test_fast_branch_is_shuffle_free(docs_df):
    """The fast branch must be scan -> explode -> filter -> project: no
    exchange, no Python.  (The slow residue's groupBy is the only shuffle in
    the pre-pass plan.)"""
    from rio_spark.operators.extract_jvm import nt_line_split

    fast, _slow, _other = nt_line_split(
        docs_df.filter("format='nt'"), "nt", "conv_id", "text", "format", "base_iri"
    )
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_error_line_numbers_preserved(docs_df):
    """Sparse-doc reconstruction must keep 1-based line numbers identical to
    the whole-document parse (the padding logic)."""
    jvm = extract_triples(docs_df, jvm_fast=True).filter(F.col("error_kind").isNotNull())
    py = extract_triples(docs_df, jvm_fast=False).filter(F.col("error_kind").isNotNull())
    assert _rows(jvm.select("doc_id", "error_kind", "error_line")) == _rows(
        py.select("doc_id", "error_kind", "error_line")
    )
    lines = {
        (r.doc_id, r.error_line)
        for r in jvm.select("doc_id", "error_line").collect()
    }
    assert ("d1", 10) in lines and ("d1", 11) in lines and ("d1", 12) in lines


def test_fuzz_differential(spark):
    """Seeded random NT/NQ corpus over every line-shape class: the two paths
    must agree row-for-row.  One Spark job for the whole corpus (per-example
    Spark jobs would make hypothesis-style fuzzing minutes-slow)."""
    import random

    rng = random.Random(0xC0FFEE)
    iris = ["http://a/x", "http://b/y#z", "urn:uuid:1", "rel/ative", "", "http://ü.example/p"]
    lits = ["plain", "with space", "", "tab\there", "esc\\n", "q\\\"uote", "\x01ctl"]
    langs = ["en", "EN-GB", "x-priv", "123", "i-klingon", "toolonglanglabel-ok"]

    def term(kind):
        if kind == "iri":
            return f"<{rng.choice(iris)}>"
        if kind == "bnode":
            return f"_:b{rng.randrange(4)}"
        lit = f'"{rng.choice(lits)}"'
        tail = rng.randrange(3)
        if tail == 1:
            return lit + "@" + rng.choice(langs)
        if tail == 2:
            return lit + f"^^<{rng.choice(iris)}>"
        return lit

    def line():
        shape = rng.randrange(10)
        if shape == 0:
            return ""
        if shape == 1:
            return "  # comment"
        if shape == 2:
            return "garbage " + str(rng.randrange(100))
        s = term(rng.choice(["iri", "bnode"]))
        p = term("iri")
        o = term(rng.choice(["iri", "bnode", "lit", "lit"]))
        g = " " + term("iri") if shape == 3 else ""
        end = " . # trail" if shape == 4 else " ."
        sep = "\t" if shape == 5 else " "
        return sep.join([s, p, o]) + g + end

    docs = []
    for i in range(300):
        fmt = "nt" if i % 2 else "nq"
        n = rng.randrange(0, 12)
        body = "\n".join(line() for _ in range(n))
        if i % 7 == 0:
            body = body.replace("\n", "\r\n")
        docs.append((f"f{i}", fmt, body))
    df = spark.createDataFrame(docs, "conv_id string, format string, text string")
    jvm = _rows(extract_triples(df, jvm_fast=True))
    py = _rows(extract_triples(df, jvm_fast=False))
    assert jvm == py
    assert len(jvm) > 300  # corpus actually produced triples and error rows
