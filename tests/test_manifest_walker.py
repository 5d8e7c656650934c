"""The manifest walker runs the reference's vendored suites directly from
their manifest.ttl files (the reference's TestManifest does the same,
testsuite/src/manifest.rs:48-189); a synthetic manifest tree checks
mf:include recursion. Skips cleanly when /root/reference is absent so the
repo stays standalone."""

from pathlib import Path

import pytest

from rio_spark.testing.manifest import (
    KNOWN_DIVERGENCES as SKIP,
    run_manifest,
    url_mapper,
    walk_manifest,
)

TESTSUITE = Path("/root/reference/testsuite")
SERD_URL = "http://drobilla.net/sw/serd/test"

needs_reference = pytest.mark.skipif(
    not TESTSUITE.exists(), reason="reference testsuite not vendored"
)


@needs_reference
def test_serd_good_manifest():
    to_path = url_mapper(SERD_URL, TESTSUITE / "serd-tests")
    outcomes = run_manifest(f"{SERD_URL}/good/manifest.ttl", to_path)
    assert len(outcomes) > 30
    failures = [o for o in outcomes if not o.passed and o.test.id not in SKIP]
    assert not failures, [(o.test.name, o.detail) for o in failures[:5]]


@needs_reference
def test_serd_bad_manifest():
    to_path = url_mapper(SERD_URL, TESTSUITE / "serd-tests")
    outcomes = run_manifest(f"{SERD_URL}/bad/manifest.ttl", to_path)
    assert len(outcomes) > 40
    failures = [o for o in outcomes if not o.passed and o.test.id not in SKIP]
    assert not failures, [(o.test.name, o.detail) for o in failures[:5]]


@needs_reference
def test_rio_manifest():
    url = "http://rio.test"
    to_path = url_mapper(url, TESTSUITE / "rio-tests")
    outcomes = run_manifest(f"{url}/manifest.ttl", to_path)
    assert len(outcomes) >= 10
    failures = [o for o in outcomes if not o.passed and o.test.id not in SKIP]
    assert not failures, [(o.test.name, o.detail) for o in failures[:5]]


def test_include_recursion(tmp_path):
    """mf:include trees are followed (how the W3C rdf-tests root manifest is
    shaped), and entries surface typed + ordered."""
    (tmp_path / "sub").mkdir()
    (tmp_path / "manifest.ttl").write_text(
        """@prefix mf: <http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#> .
<> a mf:Manifest ; mf:include ( <sub/manifest.ttl> ) ; mf:entries ( <#t1> ) .
<#t1> a <http://www.w3.org/ns/rdftest#TestTurtlePositiveSyntax> ;
  mf:name "top" ; mf:action <ok.ttl> .
"""
    )
    (tmp_path / "sub" / "manifest.ttl").write_text(
        """@prefix mf: <http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#> .
<> a mf:Manifest ; mf:entries ( <#n1> ) .
<#n1> a <http://www.w3.org/ns/rdftest#TestNTriplesNegativeSyntax> ;
  mf:name "nested" ; mf:action <bad.nt> .
"""
    )
    (tmp_path / "ok.ttl").write_text("<http://e/s> <http://e/p> <http://e/o> .")
    (tmp_path / "sub" / "bad.nt").write_text("<http://e/s> <http://e/p> .")
    url = "http://example.org/suite"
    to_path = url_mapper(url, tmp_path)
    tests = list(walk_manifest(f"{url}/manifest.ttl", to_path))
    assert [t.name for t in tests] == ["nested", "top"]
    outcomes = run_manifest(f"{url}/manifest.ttl", to_path)
    assert all(o.passed for o in outcomes), [(o.test.name, o.detail) for o in outcomes]


def test_in_repo_w3c_style_suite():
    """The in-repo W3C-style suite (tests/w3c_style, authored from the
    public Turtle/TriG/N-Triples/N-Quads grammars and the RDF-star CG
    report) runs through the walker STANDALONE — no /root/reference needed
    — covering the grammar corners the absent rdf-tests submodules would:
    numeric classification, nested collections, local-name escapes,
    ECHAR/UCHAR (in literals and IRIREFs), non-ASCII identifiers, comment
    positions, long strings, BCP-47 normalization, RFC 3986 resolution,
    SPARQL directives, RDF-star, TriG graph forms (incl. blank-node
    labels), NQ graph labels, xml:base / parseType=Resource, and ten
    negative-syntax cases incl. MAX_STACK nesting and a missing final
    dot."""
    root = Path(__file__).parent / "w3c_style"
    url = "http://rio-spark.test/w3c-style"
    to_path = url_mapper(url, root)
    outcomes = run_manifest(f"{url}/manifest.ttl", to_path)
    assert len(outcomes) == 44
    kinds = {o.test.kind for o in outcomes}
    assert kinds == {"eval", "negative_syntax"}
    # the ntnq and xml sub-manifests arrive via mf:include
    assert any("/ntnq/" in o.test.action for o in outcomes)
    assert any("/xml/" in o.test.action for o in outcomes)
    assert {o.test.format for o in outcomes} == {"ttl", "trig", "nt", "nq", "rdf"}
    failures = [(o.test.name, o.detail) for o in outcomes if not o.passed]
    assert not failures, failures
