"""Property-based tests (hypothesis) for the grammar kernels — the analogue
of the reference's fuzz targets (SURVEY.md §5.7): no crashes on arbitrary
input, encode/parse round-trips, fast-path/slow-path agreement."""

import string

from hypothesis import given, settings, strategies as st

from rio_spark.kernels import parse_ntriples, parse_trig, parse_turtle
from rio_spark.kernels.ntriples import _FAST_LINE
from rio_spark.model import decode_literal, encode_literal, serialize_triples

simple_text = st.text(
    alphabet=string.ascii_letters + string.digits + " .,;@#<>\"'\\{}()[]^^_:-+\n\t",
    max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(simple_text)
def test_parsers_never_crash(text):
    """Errors become rows; no exception may escape the kernel."""
    for parser in (parse_ntriples, parse_turtle):
        triples, errors = parser(text)
        serialize_triples(triples)  # and serialization never crashes either
    parse_trig(text)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=100))
def test_parsers_never_crash_unicode(text):
    parse_turtle(text, base_iri="http://e/")
    parse_ntriples(text)


@settings(max_examples=300, deadline=None)
@given(
    st.text(max_size=80),
    st.one_of(st.none(), st.sampled_from(["en", "en-us", "zh-hans"])),
)
def test_literal_encode_decode_roundtrip(value, lang):
    canon = encode_literal(value, lang)
    v, l, dt = decode_literal(canon)
    assert v == value and l == lang and dt is None


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_literal_through_ntriples_parser(value):
    canon = encode_literal(value)
    line = f"<http://s> <http://p> {canon} ."
    triples, errors = parse_ntriples(line)
    assert not errors, (value, errors)
    rows = serialize_triples(triples)
    assert decode_literal(rows[0][2])[0] == value


IRI_SAFE = string.ascii_letters + string.digits + "/._-~:#?&="


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet=IRI_SAFE, min_size=1, max_size=40).map(lambda s: "http://x/" + s),
    st.text(alphabet=IRI_SAFE, min_size=1, max_size=40).map(lambda s: "http://p/" + s),
    st.text(alphabet=string.ascii_letters + string.digits, min_size=1, max_size=30),
)
def test_fast_path_matches_slow_path(s_iri, p_iri, lit):
    """The regex fast line must produce exactly what the cursor parser does."""
    line = f'<{s_iri}> <{p_iri}> "{lit}" .'
    assert _FAST_LINE.match(line) is not None
    fast, e1 = parse_ntriples(line)
    # force the slow path by appending a line that contains a backslash
    slow, e2 = parse_ntriples(line + '\n<http://a> <http://b> "x\\n" .')
    assert not e1 and not e2
    assert serialize_triples(fast)[0] == serialize_triples(slow)[0]


# -- batched vs per-line document path (S1/S2) ------------------------------
# _parse_doc classifies every line of a CR-free document with one multiline
# findall; _parse_doc_lines is the per-line loop it replaced (still the CRLF
# path). The two must agree EXACTLY — triples, error rows, line numbers —
# on arbitrary input, or the dispatch on "\r" would make acceptance depend
# on a document's line-ending style.

nt_ish_text = st.text(
    alphabet=string.ascii_letters + string.digits
    + " .<>\"@^#_:\\-+\n\r\t{}|`\x00\x16",
    max_size=300,
)


@settings(max_examples=400, deadline=None)
@given(nt_ish_text)
def test_batched_doc_path_matches_per_line_path(text):
    from rio_spark.kernels.ntriples import _parse_doc, _parse_doc_lines

    for quads in (False, True):
        for star in (True, False):
            assert _parse_doc(text, quads, star) == _parse_doc_lines(
                text, quads, star
            ), (text, quads, star)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.sampled_from([
            '<http://e/s> <http://e/p> <http://e/o> .',
            '<http://e/s> <http://e/p> "v" .',
            '<http://e/s> <http://e/p> "v"@en-GB .',
            '<http://e/s> <http://e/p> "v"^^<http://w/int> .',
            '_:b0 <http://e/p> _:b1 .',
            '<rel/iri> <http://e/p> <http://e/o> .',  # relative: slow-path error
            '<http://e/s> <http://e/p> "a\\"b" .',    # escape: slow path
            '<http://e/s> <http://e/p> "a\tb" .',     # tab literal: slow path (r7)
            '<http://e/s> <http://e/p> "v"@zz-!! .',  # bad langtag shape
            '<http://e/s> <http://e/p> "v"@abcdefghij .',  # BCP-47 reject
            '<HTTP://E/s> <a+b-c.9://p> <http://e/o> .',   # exotic schemes
            '<:nochar> <http://e/p> <http://e/o> .',  # empty scheme: error
            '<http://e/s> <http://e/p> "v"^^<rel> .',  # relative datatype
            '  # comment', '', '\t',
            '<http://e/s> <http://e/p> "v" <http://e/g> .',  # quad line
            'garbage line .',
        ]),
        max_size=12,
    )
)
def test_batched_doc_path_matches_per_line_path_structured(lines):
    from rio_spark.kernels.ntriples import _parse_doc, _parse_doc_lines

    text = "\n".join(lines)
    for quads in (False, True):
        assert _parse_doc(text, quads, True) == _parse_doc_lines(text, quads, True)
