"""Unit tests for the pure-Python grammar kernels (SURVEY.md §2.3 G-table)."""

import pytest

from rio_spark.kernels import parse_ntriples, parse_nquads, parse_trig, parse_turtle
from rio_spark.kernels.errors import ParseError
from rio_spark.kernels.shared import (
    normalize_langtag,
    resolve_iri,
    scan_iriref,
    validate_absolute_iri,
)
from rio_spark.kernels.turtle import turtle_prefixes
from rio_spark.model import decode_literal, serialize_triples


def nt(text, **kw):
    t, e = parse_ntriples(text, **kw)
    return serialize_triples(t), e


def ttl(text, base="http://example.org/doc.ttl"):
    t, e = parse_turtle(text, base_iri=base)
    return serialize_triples(t), e


# --- G3: RFC 3986 reference resolution -------------------------------------

@pytest.mark.parametrize(
    "base,ref,expected",
    [
        # RFC 3986 §5.4.1 normal examples
        ("http://a/b/c/d;p?q", "g", "http://a/b/c/g"),
        ("http://a/b/c/d;p?q", "./g", "http://a/b/c/g"),
        ("http://a/b/c/d;p?q", "g/", "http://a/b/c/g/"),
        ("http://a/b/c/d;p?q", "/g", "http://a/g"),
        ("http://a/b/c/d;p?q", "//g", "http://g"),
        ("http://a/b/c/d;p?q", "?y", "http://a/b/c/d;p?y"),
        ("http://a/b/c/d;p?q", "g?y", "http://a/b/c/g?y"),
        ("http://a/b/c/d;p?q", "#s", "http://a/b/c/d;p?q#s"),
        ("http://a/b/c/d;p?q", "g#s", "http://a/b/c/g#s"),
        ("http://a/b/c/d;p?q", ";x", "http://a/b/c/;x"),
        ("http://a/b/c/d;p?q", "", "http://a/b/c/d;p?q"),
        ("http://a/b/c/d;p?q", ".", "http://a/b/c/"),
        ("http://a/b/c/d;p?q", "..", "http://a/b/"),
        ("http://a/b/c/d;p?q", "../g", "http://a/b/g"),
        ("http://a/b/c/d;p?q", "../..", "http://a/"),
        ("http://a/b/c/d;p?q", "../../g", "http://a/g"),
        # §5.4.2 abnormal
        ("http://a/b/c/d;p?q", "../../../g", "http://a/g"),
        ("http://a/b/c/d;p?q", "/./g", "http://a/g"),
        ("http://a/b/c/d;p?q", "g.", "http://a/b/c/g."),
        ("http://a/b/c/d;p?q", "..g", "http://a/b/c/..g"),
        ("http://a/b/c/d;p?q", "g;x=1/../y", "http://a/b/c/y"),
        ("http://a/b/c/d;p?q", "http:g", "http:g"),
        # empty-path base
        ("http://example.org", "x", "http://example.org/x"),
    ],
)
def test_resolve_iri(base, ref, expected):
    assert resolve_iri(base, ref) == expected


def test_absolute_validation():
    validate_absolute_iri("urn:isbn:123")
    with pytest.raises(ParseError):
        validate_absolute_iri("foo/bar")
    with pytest.raises(ParseError):
        validate_absolute_iri("1http://x")


# --- G5: language tags ------------------------------------------------------

def test_langtag_lowercased_and_validated():
    assert normalize_langtag("EN-Latn-US") == "en-latn-us"
    assert normalize_langtag("zh-hans") == "zh-hans"
    with pytest.raises(ParseError):
        normalize_langtag("badlanguagetag")  # primary subtag > 8 chars
    with pytest.raises(ParseError):
        normalize_langtag("en-")


# --- G1/G7/G8: IRI + escapes -------------------------------------------------

def test_iriref_uchar_decode():
    iri, i = scan_iriref("<http://ex.org/\\u00e9\\U0001F600>", 0, 1)
    assert iri == "http://ex.org/é😀"


def test_iriref_rejects_raw_space_and_bad_escape():
    with pytest.raises(ParseError):
        scan_iriref("<http://e x>", 0, 1)
    with pytest.raises(ParseError):
        scan_iriref("<http://ex/\\n>", 0, 1)
    with pytest.raises(ParseError):
        scan_iriref("<http://ex/\\uD800>", 0, 1)  # surrogate


# --- S1/S2: N-Triples / N-Quads ----------------------------------------------

def test_ntriples_basic_and_fast_path():
    t, e = nt(
        '<http://a> <http://b> <http://c> .\n'
        '<http://a> <http://b> "lit"@EN .\n'
        '<http://a> <http://b> "x"^^<http://dt> . # comment\n'
        '_:b1 <http://b> "esc\\n\\"q\\"" .\n'
    )
    assert not e
    assert ("<http://a>", "<http://b>", "<http://c>") in t
    assert ("<http://a>", "<http://b>", '"lit"@en') in t  # lang lowercased
    assert ("<http://a>", "<http://b>", '"x"^^<http://dt>') in t
    assert any(s.startswith("_:") and decode_literal(o)[0] == 'esc\n"q"' for s, p, o in t)


def test_ntriples_error_recovery_counts():
    # mirrors the reference's recovery semantics: 3 good, 2 error lines
    data = (
        "<http://foo.com> <http://bar.com> <http://baz.com> .\n"
        "<http://foo.com> <http://bar.com> < .\n"
        "<http://foo.com> <http://bar.com> <http://bat.com> .\n"
        "<http://foo.com> <http://bar.com> <bat> .\n"
        "<http://foo.com> <http://bar.com> <http://bat.com> ."
    )
    t, e = nt(data)
    assert len(t) == 3 and len(e) == 2
    assert e[0]["line"] == 2 and e[1]["line"] == 4


def test_nquads_graph_and_recovery():
    data = (
        "<http://s> <http://p> <http://o> <http://g> .\n"
        "<http://s> <http://p> <http://o> .\n"
        "<http://s> <http://p> <http://o> <bad .\n"
    )
    t, e = parse_nquads(data)
    rows = serialize_triples(t)
    assert rows[0] == ("<http://s>", "<http://p>", "<http://o>", "<http://g>")
    assert rows[1][3] is None
    assert len(e) == 1


def test_nquads_fast_line_matches_slow_path():
    """The NQ fast line regex must agree with the cursor walk: graph IRI,
    no graph, bnode graph (slow path), datatype + langtag objects, and a
    relative graph IRI rejected identically."""
    data = (
        "<http://s> <http://p> \"v\"@en-US <http://g> .\n"
        "<http://s> <http://p> \"1\"^^<http://www.w3.org/2001/XMLSchema#int> <http://g> .\n"
        "<http://s> <http://p> <http://o> _:bg .\n"
        "<http://s> <http://p> <http://o> <relative> .\n"
    )
    t, e = parse_nquads(data)
    rows = serialize_triples(t)
    assert rows[0] == ("<http://s>", "<http://p>", '"v"@en-us', "<http://g>")
    assert rows[1][2].endswith("XMLSchema#int>")
    assert rows[2][3].startswith("_:")
    assert len(e) == 1 and e[0]["line"] == 4  # relative graph IRI rejected


def test_turtle_fast_object_mixtures():
    """Object lists mixing every fast-path atom with fallback-only forms
    (escapes, datatyped literals, trailing-dot locals) must parse exactly as
    the slow path would."""
    t, e = parse_turtle(
        "@prefix : <http://e/> .\n"
        ':s :p :o1, 1.5, true, "x"@EN, <http://a/b>, _:b1, "esc\\n", '
        '"d"^^:dt, :c9. :s2 :p2 :o2, :o3 .\n',
        None,
    )
    assert not e
    rows = serialize_triples(t)
    objs = [r[2] for r in rows if r[0] == "<http://e/s>"]
    assert objs == [
        "<http://e/o1>",
        '"1.5"^^<http://www.w3.org/2001/XMLSchema#decimal>',
        '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>',
        '"x"@en',
        "<http://a/b>",
        rows[5][2],  # the blank node, relabelled deterministically
        '"esc\\n"',
        '"d"^^<http://e/dt>',
        "<http://e/c9>",
    ]
    assert rows[5][2].startswith("_:")
    assert [r[2] for r in rows if r[0] == "<http://e/s2>"] == [
        "<http://e/o2>", "<http://e/o3>"
    ]


def test_ntriples_star():
    t, e = nt("<< <http://s> <http://p> <http://o> >> <http://q> << <http://a> <http://b> <http://c> >> .")
    assert not e
    assert t[0][0] == "<< <http://s> <http://p> <http://o> >>"
    assert t[0][2] == "<< <http://a> <http://b> <http://c> >>"


def test_nquads_star_graph_name_rejected():
    t, e = parse_nquads("<http://s> <http://p> <http://o> << <http://a> <http://b> <http://c> >> .")
    assert len(e) == 1 and not t


# --- S3: Turtle ----------------------------------------------------------------

def test_turtle_directive_shadowing():
    t, e = ttl(
        "@prefix p: <http://one.example/> .\n"
        "p:x p:y p:z .\n"
        "@prefix p: <http://two.example/> .\n"
        "p:x p:y p:z .\n"
    )
    assert not e
    assert t[0][0] == "<http://one.example/x>"
    assert t[1][0] == "<http://two.example/x>"


def test_turtle_sparql_style_directives_case_insensitive():
    t, e = ttl("PrEfIx ex: <http://ex.org/>\nBaSe <http://base.org/>\nex:s ex:p <rel> .")
    assert not e
    assert t[0][2] == "<http://base.org/rel>"


def test_keyword_vs_prefix_name():
    # `prefix:` / `base:` / `graph:` as actual prefix names must not be
    # mistaken for keywords (rio-tests keyword_vs_prefix)
    t, e = ttl(
        "@prefix prefix: <http://p.org/> .\n"
        "@prefix base: <http://b.org/> .\n"
        "prefix:s base:p prefix:o .\n"
    )
    assert not e and t[0] == ("<http://p.org/s>", "<http://b.org/p>", "<http://p.org/o>")


def test_turtle_numeric_and_boolean_literals():
    t, e = ttl("@prefix ex: <http://e/> .\nex:s ex:p 42, -7, 3.14, .5, 1e3, -2.5E-2, true, false .")
    assert not e
    objs = [o for _, _, o in t]
    assert '"42"^^<http://www.w3.org/2001/XMLSchema#integer>' in objs
    assert '"-7"^^<http://www.w3.org/2001/XMLSchema#integer>' in objs
    assert '"3.14"^^<http://www.w3.org/2001/XMLSchema#decimal>' in objs
    assert '".5"^^<http://www.w3.org/2001/XMLSchema#decimal>' in objs
    assert '"1e3"^^<http://www.w3.org/2001/XMLSchema#double>' in objs
    assert '"-2.5E-2"^^<http://www.w3.org/2001/XMLSchema#double>' in objs
    assert '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>' in objs
    assert '"false"^^<http://www.w3.org/2001/XMLSchema#boolean>' in objs


def test_turtle_long_strings_and_quotes():
    t, e = ttl('@prefix ex: <http://e/> .\nex:s ex:p """multi\nline ""quotes"" ok""", \'\'\'single\'\'\' .')
    assert not e
    vals = sorted(decode_literal(o)[0] for _, _, o in t)
    assert vals == ['multi\nline ""quotes"" ok', "single"]


def test_turtle_collection_structure():
    t, e = ttl("@prefix ex: <http://e/> .\nex:s ex:p (ex:a ex:b) .")
    assert not e and len(t) == 5
    first = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#first>"
    rest = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#rest>"
    nil = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil>"
    by_p = {}
    for s, p, o in t:
        by_p.setdefault(p, []).append((s, o))
    assert len(by_p[first]) == 2 and len(by_p[rest]) == 2
    assert any(o == nil for _, o in by_p[rest])


def test_turtle_empty_collection_is_nil():
    t, e = ttl("@prefix ex: <http://e/> .\nex:s ex:p () .")
    assert not e
    assert t[0][2] == "<http://www.w3.org/1999/02/22-rdf-syntax-ns#nil>"


def test_turtle_a_keyword_and_anon():
    t, e = ttl("@prefix ex: <http://e/> .\n[] a ex:T .")
    assert not e
    assert t[0][1] == "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    assert t[0][0].startswith("_:")


def test_turtle_pn_local_escapes_and_percent():
    t, e = ttl("@prefix ex: <http://e/> .\nex:s ex:p ex:with\\~tilde , ex:pct%41 , ex:a.b.c .")
    assert not e
    objs = [o for _, _, o in t]
    assert "<http://e/with~tilde>" in objs
    assert "<http://e/pct%41>" in objs
    assert "<http://e/a.b.c>" in objs


def test_turtle_unknown_prefix_is_error():
    t, e = ttl("nope:s nope:p nope:o .")
    assert e and e[0]["kind"] == "UnknownPrefix" and not t


def test_turtle_error_poisons_rest_of_doc_but_keeps_prefix_triples():
    t, e = ttl("@prefix ex: <http://e/> .\nex:a ex:b ex:c .\nex:bad@ ex:p ex:o .\nex:d ex:e ex:f .")
    assert len(e) == 1
    assert len(t) == 1  # only the statement before the error


def test_turtle_nesting_guard():
    deep = "@prefix ex: <http://e/> .\nex:s ex:p " + "(" * 200 + ")" * 200 + " .\n"
    t, e = ttl(deep)
    assert e and e[0]["kind"] == "StackOverflow"


def test_turtle_star_annotation():
    t, e = ttl(
        "@prefix ex: <http://e/> .\n"
        'ex:s ex:p ex:o {| ex:certainty 0.9 |} .\n'
    )
    assert not e and len(t) == 2
    assert ("<http://e/s>", "<http://e/p>", "<http://e/o>") in t
    meta = [x for x in t if x[0].startswith("<<")]
    assert meta and meta[0][0] == "<< <http://e/s> <http://e/p> <http://e/o> >>"


def test_turtle_prefix_env_exposed():
    p = turtle_prefixes("@prefix ex: <http://e/> .\n@prefix ex: <http://e2/> .\n")
    assert p == {"ex": "http://e2/"}


def test_turtle_prefix_redeclaration_invalidates_cached_pnames():
    # the fast-path term cache must be cleared on @prefix redeclaration:
    # the same pname token expands against whichever namespace is current
    t, e = ttl(
        "@prefix ex: <http://a/> .\nex:s ex:p ex:o .\n"
        "@prefix ex: <http://b/> .\nex:s ex:p ex:o ."
    )
    assert not e
    assert t == [
        ("<http://a/s>", "<http://a/p>", "<http://a/o>"),
        ("<http://b/s>", "<http://b/p>", "<http://b/o>"),
    ]


def test_turtle_cached_tokens_stay_position_gated():
    # booleans/bnodes enter the shared term cache via object position;
    # a later hit in subject/predicate position must still be rejected
    # (literal subjects and non-IRI predicates are grammar errors)
    t, e = ttl("@prefix : <http://x/> .\n:s :p true .\ntrue :p :o .")
    assert len(t) == 1 and len(e) == 1
    t, e = ttl("@prefix : <http://x/> .\n:s :p true .\n:s true :o .")
    assert len(t) == 1 and len(e) == 1
    t, e = ttl("@prefix : <http://x/> .\n_:b :p _:b .\n:s _:b :o .")
    assert len(t) == 1 and len(e) == 1


# --- S6: generalized N-Quads -----------------------------------------------------

def test_generalized_nquads_variables_anywhere():
    from rio_spark.kernels import parse_generalized_nquads

    t, e = parse_generalized_nquads(
        '?s <http://p> "lit" ?g .\n'
        '"literal subject" ?p <http://o> .\n'
        "<< ?a <http://b> \"c\" >> <http://meta> ?v .\n"
    )
    assert not e
    rows = serialize_triples(t)
    assert rows[0] == ("?s", "<http://p>", '"lit"', "?g")
    assert rows[1][0] == '"literal subject"'
    assert rows[2][0] == '<< ?a <http://b> "c" >>'


def test_generalized_nquads_recovery():
    from rio_spark.kernels import parse_generalized_nquads

    t, e = parse_generalized_nquads("?x <http://p> ?y .\nnot a term .\n")
    assert len(t) == 1 and len(e) == 1


# --- S4: TriG --------------------------------------------------------------------

def test_trig_blocks_and_default_graph():
    t, e = parse_trig(
        "@prefix ex: <http://e/> .\n"
        "ex:g1 { ex:s ex:p ex:o . ex:s2 ex:p2 ex:o2 }\n"
        "{ ex:s3 ex:p3 ex:o3 }\n"
        "ex:s4 ex:p4 ex:o4 .\n"
        "GRAPH _:bg { ex:s5 ex:p5 ex:o5 }\n",
    )
    rows = serialize_triples(t)
    assert not e
    graphs = {r[3] for r in rows}
    assert "<http://e/g1>" in graphs and None in graphs
    assert sum(1 for r in rows if r[3] == "<http://e/g1>") == 2
    assert any(g and g.startswith("_:") for g in graphs)


def test_trig_graph_label_cannot_be_property_list():
    t, e = parse_trig("PREFIX : <http://example/>\nGRAPH [ :p :o ] { :s :p :o }")
    assert e


def test_trig_anon_graph_label():
    t, e = parse_trig("PREFIX : <http://example/>\n[] { :s :p :o }")
    rows = serialize_triples(t)
    assert not e and rows[0][3].startswith("_:")
