"""S7 generalized TriG kernel tests, mirroring the reference's own cases
(/root/reference/turtle/src/gtrig.rs:769-969): relative IRIs without a base,
relative prefixes, variables / literals / quoted triples in every position
(including predicates and graph labels), composite (bnode-property-list)
predicates. No Spark needed — pure kernel."""

from rio_spark.kernels import parse_generalized_nquads, parse_gtrig
from rio_spark.model import serialize_triples


def quads(text, base=None):
    t, e = parse_gtrig(text, base)
    assert e == [], e
    return set(serialize_triples(t, scope="t_"))


def gnq_quads(text):
    t, e = parse_generalized_nquads(text)
    assert e == [], e
    return set(serialize_triples(t, scope="t_"))


def test_relative_iri_references():
    got = quads(
        """
      <../s1> <#p1> </o1>.
      { <../s2> <#p2> </o2> }
      <//g3> { <../s3> <#p3> </o3> }
      GRAPH <//g4> { <../s4> <#p4> </o4> }
    """
    )
    assert got == {
        ("<../s1>", "<#p1>", "</o1>", None),
        ("<../s2>", "<#p2>", "</o2>", None),
        ("<../s3>", "<#p3>", "</o3>", "<//g3>"),
        ("<../s4>", "<#p4>", "</o4>", "<//g4>"),
    }


def test_relative_prefixes():
    got = quads(
        """
      @prefix s: <../>.
      PREFIX p: <#>
      PREFIX o: </>
      PREFIX g: <//>

      s:s1 p:p1 o:o1.
      { s:s2 p:p2 o:o2 }
      g:g3 { s:s3 p:p3 o:o3 }
      GRAPH g:g4 { s:s4 p:p4 o:o4 }
    """
    )
    assert got == {
        ("<../s1>", "<#p1>", "</o1>", None),
        ("<../s2>", "<#p2>", "</o2>", None),
        ("<../s3>", "<#p3>", "</o3>", "<//g3>"),
        ("<../s4>", "<#p4>", "</o4>", "<//g4>"),
    }


def test_all_variables():
    got = quads(
        """
      ?s1 ?p1 ?o1.
      { ?s2 ?p2 ?o2 }
      ?g3 { ?s3 ?p3 ?o3 }
      GRAPH ?g4 { ?s4 ?p4 ?o4 }
    """
    )
    assert got == {
        ("?s1", "?p1", "?o1", None),
        ("?s2", "?p2", "?o2", None),
        ("?s3", "?p3", "?o3", "?g3"),
        ("?s4", "?p4", "?o4", "?g4"),
    }


def test_all_literals():
    got = quads(
        """
      "s1" "p1" "o1".
      { "s2" "p2" "o2" }
      "g3" { "s3" "p3" "o3" }
      GRAPH "g4" { "s4" "p4" "o4" }
    """
    )
    assert got == {
        ('"s1"', '"p1"', '"o1"', None),
        ('"s2"', '"p2"', '"o2"', None),
        ('"s3"', '"p3"', '"o3"', '"g3"'),
        ('"s4"', '"p4"', '"o4"', '"g4"'),
    }


def test_all_quoted_triples_match_gnq():
    got = quads(
        """@prefix : <#>.
      << :ss1 _:ps1 "os1" >> << _:sp1 "pp1" ?op1 >> << "so1" ?po1 :oo1 >>.
      { << ?ss2 :ps2  _:os2 >> << :sp2 "pp2" _:op2 >> << "so2" _:po2 ?oo2 >> }
      << _:sg3 ?pg3  :og3 >> { << ?ss3 :ps3 ?os3 >> << :sp3 ?pp3 _:op3 >> << ?so3 _:po3 "oo3" >> }
      GRAPH << _:sg4 "pg4" :og4 >> { << "ss4" :ps4 _:os4 >> << :sp4 _:pp4 ?op4 >> << _:so4 ?po4 "oo4" >> }
    """
    )
    want = gnq_quads(
        """
      << <#ss1> _:ps1 "os1" >> << _:sp1 "pp1" ?op1 >> << "so1" ?po1 <#oo1> >>.
      << ?ss2 <#ps2> _:os2 >> << <#sp2> "pp2" _:op2 >> << "so2" _:po2 ?oo2 >>.
      << ?ss3 <#ps3> ?os3 >> << <#sp3> ?pp3 _:op3 >> << ?so3 _:po3 "oo3" >> << _:sg3 ?pg3  <#og3> >>.
      << "ss4" <#ps4> _:os4 >> << <#sp4> _:pp4 ?op4 >> << _:so4 ?po4 "oo4" >> << _:sg4 "pg4" <#og4> >>.
    """
    )
    assert got == want


def test_deeply_nested_triple():
    got = quads(
        """@prefix : <#>.
      << << :a :b :c >> << :d :e :f >> << :g :h :i >> >> {
        << << :j :k :l >> << :m :n :o >> << :p :q :r >> >>
        << << :s :t :u >> << :v :w :x >> << :y :z :A >> >>
        << << :B :C :D >> << :E :F :G >> << :H :I :J >> >>
    }"""
    )
    want = gnq_quads(
        """
        << << <#j> <#k> <#l> >> << <#m> <#n> <#o> >> << <#p> <#q> <#r> >> >>    << << <#s> <#t> <#u> >> << <#v> <#w> <#x> >> << <#y> <#z> <#A> >> >>    << << <#B> <#C> <#D> >> << <#E> <#F> <#G> >> << <#H> <#I> <#J> >> >>    << << <#a> <#b> <#c> >> << <#d> <#e> <#f> >> << <#g> <#h> <#i> >> >>.
    """
    )
    assert got == want


def test_composite_predicate():
    # ?s [ ?p ?o1 ] ?o2 . — the bnode property list acts as the predicate
    t, e = parse_gtrig("?s [ ?p ?o1 ] ?o2 .", "http://example.org/base/")
    assert e == []
    rows = serialize_triples(t, scope="t_")
    assert len(rows) == 2
    inner, outer = rows[0], rows[1]
    assert inner[1] == "?p" and inner[2] == "?o1"
    assert outer[0] == "?s" and outer[2] == "?o2"
    assert inner[0] == outer[1]  # the bnode is both inner subject and predicate


def test_dollar_variables_and_mixed():
    got = quads('$s <p:x> "o" .')
    assert got == {("?s", "<p:x>", '"o"', None)}


def test_base_resolution_still_applies():
    got = quads("<s> <p> <o> .", base="http://ex.org/dir/")
    assert got == {
        ("<http://ex.org/dir/s>", "<http://ex.org/dir/p>", "<http://ex.org/dir/o>", None)
    }


def test_strict_trig_still_rejects_generalized():
    from rio_spark.kernels import parse_trig

    t, e = parse_trig('"s" <http://e/p> "o" .')
    assert t == [] and len(e) == 1

    t, e = parse_trig("?s <http://e/p> ?o .")
    assert t == [] and len(e) == 1


def test_numbers_and_booleans_generalized():
    got = quads("12.5 true ?x . <http://e/s> <http://e/p> false .")
    assert got == {
        ('"12.5"^^<http://www.w3.org/2001/XMLSchema#decimal>',
         '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>', "?x", None),
        ("<http://e/s>", "<http://e/p>",
         '"false"^^<http://www.w3.org/2001/XMLSchema#boolean>', None),
    }
