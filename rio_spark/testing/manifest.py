"""W3C test-manifest walker, built on the repo's own Turtle kernel.

Re-expresses the reference harness's manifest machinery
(/root/reference/testsuite/src/manifest.rs:48-189 TestManifest iterator,
:228-266 RdfListIterator) in Python over canonical triple rows: a
``manifest.ttl`` is parsed with :func:`parse_turtle` against its CANONICAL
URL (the W3C/serd base the golden files were authored against), the
``mf:entries`` rdf:first/rdf:rest list is walked, nested manifests are
followed through ``mf:include``, and every entry yields a
:class:`ManifestTest` with its rdft test type, action and (optional) result
file. A URL→path mapper (the reference's ``file_reader`` closure) turns
canonical URLs into local files.

This makes the W3C rdf-tests / rdf-star suites run automatically whenever a
``manifest.ttl`` tree is present (the reference vendors them as git
submodules; this snapshot ships only serd-tests + rio-tests, which the walker
covers today — see tests/test_manifest_walker.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterator

from rio_spark.kernels import (
    parse_nquads,
    parse_ntriples,
    parse_rdfxml,
    parse_trig,
    parse_turtle,
)
from rio_spark.model import serialize_triples
from rio_spark.testing.isomorphism import are_isomorphic

MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDFT = "http://www.w3.org/ns/rdftest#"

RDF_TYPE = f"<{RDF}type>"
RDF_FIRST = f"<{RDF}first>"
RDF_REST = f"<{RDF}rest>"
RDF_NIL = f"<{RDF}nil>"
MF_ENTRIES = f"<{MF}entries>"
MF_INCLUDE = f"<{MF}include>"
MF_NAME = f"<{MF}name>"
MF_ACTION = f"<{MF}action>"
MF_RESULT = f"<{MF}result>"
RDFS_COMMENT = f"<{RDFS}comment>"

# rdft test-type IRI -> (format, kind); kind in
# {positive_syntax, negative_syntax, eval, negative_eval}
TEST_TYPES: dict[str, tuple[str, str]] = {}
for _fmt_name, _fmt in (("Turtle", "ttl"), ("Trig", "trig"), ("TriG", "trig"),
                        ("NTriples", "nt"), ("NQuads", "nq"), ("XML", "rdf")):
    TEST_TYPES[f"<{RDFT}Test{_fmt_name}PositiveSyntax>"] = (_fmt, "positive_syntax")
    TEST_TYPES[f"<{RDFT}Test{_fmt_name}NegativeSyntax>"] = (_fmt, "negative_syntax")
    TEST_TYPES[f"<{RDFT}Test{_fmt_name}Eval>"] = (_fmt, "eval")
    TEST_TYPES[f"<{RDFT}Test{_fmt_name}NegativeEval>"] = (_fmt, "negative_eval")

PARSERS = {
    "nt": lambda body, base: parse_ntriples(body),
    "nq": lambda body, base: parse_nquads(body),
    "ttl": parse_turtle,
    "trig": parse_trig,
    "rdf": parse_rdfxml,
}

UrlToPath = Callable[[str], Path]

# intentional, documented divergences from the reference on the vendored
# suites — shared by tests/test_manifest_walker.py and
# jobs/conformance_report.py so neither goes red on a known, accepted gap
KNOWN_DIVERGENCES: dict[str, str] = {
    # expat (XML Namespaces-conformant) rejects the QName `foo:` with an
    # empty local part that this test uses; the reference's XML reader is
    # lenient there. The behavior under test (langtag lowercasing) is still
    # covered by the .ttl variant in the same manifest. Same exclusion as
    # rio_spark/testing/corpus.py.
    "http://rio.test/manifest.ttl#language_normalization_xml":
        "empty-local-part QName rejected by expat",
}


def url_mapper(url_prefix: str, local_root: Path) -> UrlToPath:
    """The reference's file_reader closure: canonical URL -> local file."""
    root = Path(local_root)

    def to_path(url: str) -> Path:
        if not url.startswith(url_prefix):
            raise ValueError(f"{url!r} is outside {url_prefix!r}")
        return root / url[len(url_prefix):].lstrip("/").split("#")[0]

    return to_path


@dataclass(frozen=True)
class ManifestTest:
    id: str  # entry IRI (canonical URL + fragment)
    kind: str  # positive_syntax | negative_syntax | eval | negative_eval
    format: str  # nt | nq | ttl | trig | rdf
    name: str | None
    comment: str | None
    action: str  # action file URL
    result: str | None  # golden file URL


def _literal_value(term: str) -> str:
    if term.startswith('"'):
        body = term[1:]
        q = body.find('"')
        return body[:q] if q >= 0 else body
    return term


def _index(triples: list[tuple]) -> dict[tuple[str, str], list[str]]:
    idx: dict[tuple[str, str], list[str]] = {}
    for s, p, o in triples:
        idx.setdefault((s, p), []).append(o)
    return idx


def _first(idx, s: str, p: str) -> str | None:
    v = idx.get((s, p))
    return v[0] if v else None


def _rdf_list(idx, head: str | None) -> Iterator[str]:
    """RdfListIterator (manifest.rs:228-266): follow first/rest to rdf:nil."""
    seen = set()
    while head and head != RDF_NIL:
        if head in seen:
            raise ValueError(f"cyclic rdf list at {head}")
        seen.add(head)
        item = _first(idx, head, RDF_FIRST)
        if item is not None:
            yield item
        head = _first(idx, head, RDF_REST)


def walk_manifest(manifest_url: str, to_path: UrlToPath) -> Iterator[ManifestTest]:
    """Yield every parser test reachable from ``manifest_url``
    (following mf:include), in manifest order."""
    path = to_path(manifest_url)
    triples, errors = parse_turtle(path.read_text(), manifest_url)
    if errors:
        raise ValueError(f"manifest {path} failed to parse: {errors[:2]}")
    idx = _index(serialize_triples(triples, scope="m_"))
    doc = f"<{manifest_url}>"
    # nested manifests first (mf:include holds an rdf list of manifest IRIs)
    for inc in _rdf_list(idx, _first(idx, doc, MF_INCLUDE)):
        yield from walk_manifest(inc[1:-1], to_path)
    for entry in _rdf_list(idx, _first(idx, doc, MF_ENTRIES)):
        ty = _first(idx, entry, RDF_TYPE)
        fmt_kind = TEST_TYPES.get(ty or "")
        if fmt_kind is None:
            continue  # non-parser test types (e.g. SPARQL, canonicalization)
        fmt, kind = fmt_kind
        action = _first(idx, entry, MF_ACTION)
        if action is None:
            continue
        name = _first(idx, entry, MF_NAME)
        comment = _first(idx, entry, RDFS_COMMENT)
        result = _first(idx, entry, MF_RESULT)
        yield ManifestTest(
            id=entry[1:-1],
            kind=kind,
            format=fmt,
            name=_literal_value(name) if name else None,
            comment=_literal_value(comment) if comment else None,
            action=action[1:-1],
            result=result[1:-1] if result else None,
        )


@dataclass
class TestOutcome:
    test: ManifestTest
    passed: bool
    detail: str = ""


def run_test(test: ManifestTest, to_path: UrlToPath) -> TestOutcome:
    """Evaluate one manifest test the way the reference harness does
    (testsuite/src/parser_evaluator.rs:16-82): syntax tests check the error
    set; eval tests compare canonical triple sets under blank-node
    isomorphism against the parsed golden file. The action document parses
    against its own canonical URL as base."""
    try:
        body = to_path(test.action).read_text()
    except UnicodeDecodeError:
        # non-UTF-8 input never reaches the kernels in Spark (Arrow strings
        # are UTF-8 by construction); treat as a syntax error
        return TestOutcome(test, test.kind == "negative_syntax",
                           "non-UTF-8 input")
    triples, errors = PARSERS[test.format](body, test.action)
    emitted = serialize_triples(triples)
    if test.kind == "negative_syntax":
        ok = bool(errors)
        return TestOutcome(test, ok, "" if ok else "bad input accepted")
    if test.kind == "positive_syntax":
        ok = not errors
        return TestOutcome(test, ok, "" if ok else f"errors: {errors[:2]}")
    # eval / negative_eval need the golden file
    golden_raw = to_path(test.result).read_text() if test.result else ""
    gparse = parse_nquads if test.format in ("nq", "trig") else parse_ntriples
    gt, gerrs = gparse(golden_raw)
    if gerrs:
        return TestOutcome(test, False, f"golden failed to parse: {gerrs[:2]}")
    golden = serialize_triples(gt)
    if errors:
        # BOTH eval kinds require the action document to PARSE — a
        # NegativeEval input is syntactically legal, its GRAPH must differ;
        # passing it on a parse error would mask parser regressions
        return TestOutcome(test, False, f"errors: {errors[:2]}")
    iso = are_isomorphic(emitted, golden)
    if test.kind == "negative_eval":
        return TestOutcome(test, not iso, "" if not iso else "graphs should differ")
    return TestOutcome(test, iso, "" if iso else "not isomorphic")


def run_manifest(manifest_url: str, to_path: UrlToPath) -> list[TestOutcome]:
    return [run_test(t, to_path) for t in walk_manifest(manifest_url, to_path)]
