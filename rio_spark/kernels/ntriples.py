"""N-Triples / N-Quads (-star) parsers — line-oriented, per-line recovery.

Behavioral reference: /root/reference/turtle/src/ntriples.rs:44-176 (S1/S2 in
SURVEY.md §2.1) — errors skip to end-of-line and parsing continues
(ntriples.rs:79-83, :165-169; turtle/tests/recovery.rs). Written from the
public W3C N-Triples/N-Quads grammars, not translated.

Each document parse returns ``(triples, errors)`` where triples are kernel-term
tuples (see rio_spark.model) and errors are positioned dicts — rows, never
exceptions (SURVEY.md §2.5 F2).
"""

from __future__ import annotations

import re

from rio_spark.kernels.errors import ParseError
from rio_spark.kernels.shared import (
    normalize_langtag,
    scan_blank_node_label,
    scan_iriref,
    scan_string,
    validate_absolute_iri,
)
from rio_spark.model import BNode, QTriple, Term, encode_literal

_WS = " \t"

# fast path: plain-ASCII triple of IRIs / simple literal with no escapes —
# the overwhelming majority of real N-Triples lines. One compiled regex
# replaces the cursor walk (the reference's analogous trick is its ASCII
# fast path, shared.rs:69-73).
_FAST_LINE = re.compile(
    r"^[ \t]*<([^<>\"{}|^`\\\x00-\x20]*)>"
    r"[ \t]+<([^<>\"{}|^`\\\x00-\x20]*)>"
    r"[ \t]+(?:"
    r"<([^<>\"{}|^`\\\x00-\x20]*)>"
    r'|"([^"\\\n\r]*)"(?:@([A-Za-z]+(?:-[A-Za-z0-9]+)*)|\^\^<([^<>"{}|^`\\\x00-\x20]*)>)?'
    r")[ \t]*\.[ \t]*(?:#.*)?$"
)
# N-Quads variant: same line shape plus an OPTIONAL trailing graph IRI
# (bnode graph labels take the slow path — rare)
_FAST_LINE_NQ = re.compile(
    r"^[ \t]*<([^<>\"{}|^`\\\x00-\x20]*)>"
    r"[ \t]+<([^<>\"{}|^`\\\x00-\x20]*)>"
    r"[ \t]+(?:"
    r"<([^<>\"{}|^`\\\x00-\x20]*)>"
    r'|"([^"\\\n\r]*)"(?:@([A-Za-z]+(?:-[A-Za-z0-9]+)*)|\^\^<([^<>"{}|^`\\\x00-\x20]*)>)?'
    r")(?:[ \t]+<([^<>\"{}|^`\\\x00-\x20]*)>)?"
    r"[ \t]*\.[ \t]*(?:#.*)?$"
)
_SCHEME_PROBE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

# ---------------------------------------------------------------------------
# batched document fast path: ONE multiline findall classifies every line of
# a (CR-free) document in a single C-level pass — fast statement | blank or
# comment | anything-else. Alternative order matters: the fast shape first,
# the blank/comment shape second (zero-width on truly blank lines only), and
# the catch-all last, so every line yields exactly one tuple and enumerate()
# over the result IS the line numbering. Terms are captured WITH their
# delimiters ('<...>', '"..."') so an empty capture ('') unambiguously means
# "group did not participate" — findall cannot represent None — and the
# captured token IS the term's final canonical form: the IRI shape embeds
# the absolute-IRI scheme requirement ([A-Za-z][A-Za-z0-9+.-]*:) that the
# per-line path probes with _SCHEME_PROBE, and the literal body excludes
# every character the canonical encoder escapes (backslash, quote, newline,
# CR, tab), so NO per-term validation or re-encoding runs in the Python
# loop (r7: this replaced the per-distinct-IRI memo + probe — ~25% of
# batch-path time — with zero per-IRI work; a tab-bearing literal now
# takes the slow path, whose encode_literal escapes it identically).
# Group 1 captures the whole fast line so the one in-loop validation left
# (BCP-47 language tags, memoized per distinct tag) can re-parse a
# failing line through the positioned slow path. Lines the fast shape
# cannot express (escapes, bnodes, relative IRIs, quoted triples) fall to
# the catch-all: both fast regexes exclude backslash in every term body,
# so an escape-bearing line can never half-match — false negatives only,
# same contract as the per-line path.
# ---------------------------------------------------------------------------
_B_IRI = r"<[A-Za-z][A-Za-z0-9+.\-]*:[^<>\"{}|^`\\\x00-\x20]*>"
_B_STMT = (
    r"[ \t]*(" + _B_IRI + r")[ \t]+(" + _B_IRI + r")[ \t]+(?:("
    + _B_IRI + r')|("[^"\\\n\r\t]*")(?:@([A-Za-z]+(?:-[A-Za-z0-9]+)*)|\^\^('
    + _B_IRI + r"))?)"
)
_B_TAIL = r"[ \t]*\.[ \t]*(?:#[^\n]*)?"
_B_REST = r"|^[ \t]*(?:#[^\n]*)?$|^([^\n]+)$"
_BATCH_LINE = re.compile("(?m)^(" + _B_STMT + _B_TAIL + ")$" + _B_REST)
_BATCH_LINE_NQ = re.compile(
    "(?m)^(" + _B_STMT + r"(?:[ \t]+(" + _B_IRI + r"))?" + _B_TAIL + ")$" + _B_REST
)


def _skip_ws(s: str, i: int) -> int:
    n = len(s)
    while i < n and s[i] in _WS:
        i += 1
    return i


def _parse_subject(s: str, i: int, line: int, star: bool) -> tuple[Term, int]:
    if i >= len(s):  # reachable via a truncated quoted triple ('<<' at EOL):
        # error row, not IndexError (fuzz-found via the batch/per-line diff)
        raise ParseError("UnexpectedEof", "expected subject", line, i)
    c = s[i]
    if c == "<":
        if star and s.startswith("<<", i):
            return _parse_quoted_triple(s, i, line)
        iri, i = scan_iriref(s, i, line)
        return "<" + validate_absolute_iri(iri, line, i) + ">", i
    if c == "_":
        label, i = scan_blank_node_label(s, i, line)
        return BNode("u", label), i
    raise ParseError("UnexpectedChar", f"expected subject, got {c!r}", line, i)


def _parse_predicate(s: str, i: int, line: int) -> tuple[str, int]:
    if i >= len(s) or s[i] != "<":
        raise ParseError("UnexpectedChar", "expected predicate IRI", line, i)
    iri, i = scan_iriref(s, i, line)
    return "<" + validate_absolute_iri(iri, line, i) + ">", i


def _parse_object(s: str, i: int, line: int, star: bool) -> tuple[Term, int]:
    if i >= len(s):
        raise ParseError("UnexpectedEof", "expected object", line, i)
    c = s[i]
    if c == "<":
        if star and s.startswith("<<", i):
            return _parse_quoted_triple(s, i, line)
        iri, i = scan_iriref(s, i, line)
        return "<" + validate_absolute_iri(iri, line, i) + ">", i
    if c == "_":
        label, i = scan_blank_node_label(s, i, line)
        return BNode("u", label), i
    if c == '"':
        value, i = scan_string(s, i, '"', line)
        lang = dt = None
        if i < len(s) and s[i] == "@":
            j = i + 1
            n = len(s)
            start = j
            while j < n and (s[j].isalnum() and s[j].isascii() or s[j] == "-"):
                j += 1
            lang = normalize_langtag(s[start:j], line, start)
            i = j
        elif s.startswith("^^", i):
            i += 2
            if i >= len(s) or s[i] != "<":
                raise ParseError("UnexpectedChar", "expected datatype IRI", line, i)
            dt, i = scan_iriref(s, i, line)
            validate_absolute_iri(dt, line, i)
        return encode_literal(value, lang, dt), i
    raise ParseError("UnexpectedChar", f"expected object, got {c!r}", line, i)


def _parse_quoted_triple(s: str, i: int, line: int) -> tuple[QTriple, int]:
    """RDF-star ``<< s p o >>`` (N-Triples-star, ntriples.rs:302-321)."""
    i += 2  # consume <<
    i = _skip_ws(s, i)
    subj, i = _parse_subject(s, i, line, star=True)
    i = _skip_ws(s, i)
    pred, i = _parse_predicate(s, i, line)
    i = _skip_ws(s, i)
    obj, i = _parse_object(s, i, line, star=True)
    i = _skip_ws(s, i)
    if not s.startswith(">>", i):
        raise ParseError("UnexpectedChar", "expected '>>'", line, i)
    return QTriple(subj, pred, obj), i + 2


def _parse_line(s: str, line: int, quads: bool, star: bool):
    i = _skip_ws(s, 0)
    if i >= len(s) or s[i] == "#":
        return None
    subj, i = _parse_subject(s, i, line, star)
    i = _skip_ws(s, i)
    pred, i = _parse_predicate(s, i, line)
    i = _skip_ws(s, i)
    obj, i = _parse_object(s, i, line, star)
    i = _skip_ws(s, i)
    graph = None
    if quads and i < len(s) and s[i] in "<_":
        # graph label: IRI or bnode only (no literals, no quoted triples —
        # GraphName per model.rs:287-290)
        c = s[i]
        if c == "<":
            if s.startswith("<<", i):
                raise ParseError("UnexpectedChar", "quoted triple cannot be a graph name", line, i)
            iri, i = scan_iriref(s, i, line)
            graph = "<" + validate_absolute_iri(iri, line, i) + ">"
        else:
            label, i = scan_blank_node_label(s, i, line)
            graph = BNode("u", label)
        i = _skip_ws(s, i)
    if i >= len(s) or s[i] != ".":
        raise ParseError("UnexpectedChar", "expected '.' at end of statement", line, i)
    i = _skip_ws(s, i + 1)
    if i < len(s) and s[i] != "#":
        raise ParseError("UnexpectedChar", "trailing content after '.'", line, i)
    if quads:
        return (subj, pred, obj, graph)
    return (subj, pred, obj)


def _langtag_or_false(lmemo: dict, lang: str):
    """Normalized langtag or False, memoized per distinct tag (a document
    carries a handful of distinct tags; the BCP-47 regex runs once each)."""
    try:
        nl = normalize_langtag(lang, 0, 0)
    except ParseError:
        nl = False
    lmemo[lang] = nl
    return nl


def _parse_doc(text: str, quads: bool, star: bool):
    """Dispatch: batched single-findall classification for the common CR-free
    document, the per-line loop for CRLF docs ('$' under (?m) matches before
    '\\n' only, so any '\\r' would push every line to the catch-all)."""
    if "\r" in text:
        return _parse_doc_lines(text, quads, star)
    triples: list[tuple] = []
    errors: list[dict] = []
    lmemo: dict = {}
    lget = lmemo.get
    emit = triples.append
    # two specialized loops (triple / quad tuple shapes differ) so the hot
    # NT loop carries no per-line `if quads` branches or 9-field unpacking;
    # every captured term is already canonical (see the regex comment), so
    # the fast branches are pure tuple assembly — the only validation left
    # is the memoized BCP-47 check on language tags (memo values are the
    # lowercased tag or False, so `lget(...) or _langtag_or_false(...)`
    # recomputes only on a true miss)
    if not quads:
        for lineno, (whole, sub, pred, obj, lit, lang, dt, rest) in enumerate(
            _BATCH_LINE.findall(text), start=1
        ):
            if sub:
                if obj:
                    emit((sub, pred, obj))
                    continue
                if lang:
                    nl = lget(lang)
                    if nl is None:
                        nl = _langtag_or_false(lmemo, lang)
                    if nl is not False:
                        emit((sub, pred, lit + "@" + nl))
                        continue
                    rest = whole  # bad tag: positioned error via slow path
                elif dt:
                    emit((sub, pred, lit + "^^" + dt))
                    continue
                else:
                    emit((sub, pred, lit))
                    continue
            elif not rest:
                continue  # blank / comment line
            try:
                t = _parse_line(rest, lineno, quads, star)
                if t is not None:
                    emit(t)
            except ParseError as e:
                e.line = lineno
                errors.append(e.as_row())  # per-line recovery
        return triples, errors
    for lineno, (whole, sub, pred, obj, lit, lang, dt, graph, rest) in enumerate(
        _BATCH_LINE_NQ.findall(text), start=1
    ):
        if sub:
            g = graph if graph else None
            if obj:
                emit((sub, pred, obj, g))
                continue
            if lang:
                nl = lget(lang)
                if nl is None:
                    nl = _langtag_or_false(lmemo, lang)
                if nl is not False:
                    emit((sub, pred, lit + "@" + nl, g))
                    continue
                rest = whole  # bad tag: positioned error via slow path
            elif dt:
                emit((sub, pred, lit + "^^" + dt, g))
                continue
            else:
                emit((sub, pred, lit, g))
                continue
        elif not rest:
            continue  # blank / comment line
        try:
            t = _parse_line(rest, lineno, quads, star)
            if t is not None:
                emit(t)
        except ParseError as e:
            e.line = lineno
            errors.append(e.as_row())  # per-line recovery
    return triples, errors


def _parse_doc_lines(text: str, quads: bool, star: bool):
    triples: list[tuple] = []
    errors: list[dict] = []
    # per-document memo: raw IRI -> ONE bracketed str object. Subjects repeat
    # across adjacent lines and predicates across the whole document; reusing
    # the same object cuts small-string allocator churn (the measured scaling
    # bottleneck at high core counts, BENCH/BASELINE.md). Bounded by distinct
    # terms per document.
    iri_memo: dict[str, str] = {}

    def wrap(iri: str):
        """Memoized scheme-validate + bracket: subjects repeat across
        adjacent lines and predicates across the whole document, so the
        _SCHEME_PROBE runs once per DISTINCT IRI, not once per occurrence
        (it was 3-4 probe matches per fast line). None = probe failed ->
        caller falls through to the slow path's positioned error; only
        valid IRIs are ever cached."""
        w = iri_memo.get(iri)
        if w is None:
            if _SCHEME_PROBE.match(iri) is None:
                return None
            w = iri_memo[iri] = "<" + iri + ">"
        return w

    for lineno, raw in enumerate(text.split("\n"), start=1):
        s = raw[:-1] if raw.endswith("\r") else raw
        if not s or s.lstrip(_WS)[:1] in ("", "#"):
            continue
        m = None if "\\" in s else (_FAST_LINE_NQ if quads else _FAST_LINE).match(s)
        if m is not None:
            if quads:
                sub, pred, obj_iri, lit, lang, dt, graph_iri = m.groups()
            else:
                sub, pred, obj_iri, lit, lang, dt = m.groups()
                graph_iri = None
            # memo probes are inlined (hit skips the wrap call): memo values
            # are non-empty "<...>" strings, so `get(...) or wrap(...)` is
            # None/falsy exactly when the term is unvalidated-and-invalid
            ws = iri_memo.get(sub) or wrap(sub)
            if ws is not None:
                wp = iri_memo.get(pred) or wrap(pred)
            else:
                wp = None
            if wp is not None:
                wo = (iri_memo.get(obj_iri) or wrap(obj_iri)) if obj_iri is not None else True
            else:
                wo = None
            if (
                wo is not None
                and (dt is None or iri_memo.get(dt) or wrap(dt))
                and (graph_iri is None or iri_memo.get(graph_iri) or wrap(graph_iri))
            ):
                # BCP-47-validate the language tag here too so acceptance does
                # not depend on which path a line happens to take (the slow
                # path and the reference's LanguageTag::parse both reject bad
                # tags); on failure fall through to the slow path, which
                # raises the positioned error row.
                try:
                    norm_lang = normalize_langtag(lang, 0, 0) if lang else None
                except ParseError:
                    norm_lang = False
                if norm_lang is not False:
                    o: Term = wo if obj_iri is not None else encode_literal(lit, norm_lang, dt)
                    if quads:
                        # the guard above proved graph_iri valid, so it IS memoized
                        g = iri_memo[graph_iri] if graph_iri is not None else None
                        triples.append((ws, wp, o, g))
                    else:
                        triples.append((ws, wp, o))
                    continue
        try:
            t = _parse_line(s, lineno, quads, star)
            if t is not None:
                triples.append(t)
        except ParseError as e:
            e.line = lineno
            errors.append(e.as_row())  # skip to next line (per-line recovery)
    return triples, errors


def parse_ntriples(text: str, star: bool = True) -> tuple[list[tuple], list[dict]]:
    """S1: N-Triples(-star) document -> ([(s, p, o)], [error rows])."""
    return _parse_doc(text, quads=False, star=star)


def parse_nquads(text: str, star: bool = True) -> tuple[list[tuple], list[dict]]:
    """S2: N-Quads(-star) document -> ([(s, p, o, g)], [error rows])."""
    return _parse_doc(text, quads=True, star=star)


# ---------------------------------------------------------------------------
# Generalized N-Quads (S6): variables allowed, any term in any position
# (behavioral reference: /root/reference/turtle/src/gnquads.rs and the
# GeneralizedQuadsParser trait, api/src/generalized.rs:239-268). Variables
# are encoded canonically as ``?name``.
# ---------------------------------------------------------------------------

from rio_spark.kernels.shared import is_pn_chars, is_pn_chars_u


def _parse_generalized_term(s: str, i: int, line: int) -> tuple:
    if i >= len(s):  # truncated statement (fuzz-found): error row, not IndexError
        raise ParseError("UnexpectedChar", "unexpected end of line", line, i)
    c = s[i]
    if c in "?$":
        # variable name chars per the reference's OBSERVABLE parse_variable
        # behavior (gnquads.rs:187-222): PN_CHARS_U | digit first, then
        # PN_CHARS_U | digit ('-' does NOT continue a name; neither does
        # U+00B7 — the reference's 0xb7 arm is dead code under its ASCII
        # guard and its unicode class excludes it, so names stop there)
        j = i + 1
        n = len(s)
        if j >= n or not (is_pn_chars_u(s[j]) or (s[j].isdigit() and s[j].isascii())):
            raise ParseError("InvalidVariable", "bad variable name", line, i)
        start = j
        j += 1
        while j < n and (is_pn_chars_u(s[j]) or (s[j].isdigit() and s[j].isascii())):
            j += 1
        return "?" + s[start:j], j
    if c == "<":
        if s.startswith("<<", i):
            i += 2
            i = _skip_ws(s, i)
            a, i = _parse_generalized_term(s, i, line)
            i = _skip_ws(s, i)
            b, i = _parse_generalized_term(s, i, line)
            i = _skip_ws(s, i)
            cc, i = _parse_generalized_term(s, i, line)
            i = _skip_ws(s, i)
            if not s.startswith(">>", i):
                raise ParseError("UnexpectedChar", "expected '>>'", line, i)
            return QTriple(a, b, cc), i + 2
        # generalized IRIs are NOT absolutized/validated — relative IRIs stay
        # as written (reference parse_generalized_iriref, gtrig.rs:659-679)
        iri, i = scan_iriref(s, i, line)
        return "<" + iri + ">", i
    if c == "_":
        label, i = scan_blank_node_label(s, i, line)
        return BNode("u", label), i
    # literals: reuse the strict object parser's literal branch (but with a
    # generalized, non-validating datatype IRI)
    if c == '"':
        value, i = scan_string(s, i, '"', line)
        lang = dt = None
        if i < len(s) and s[i] == "@":
            j = i + 1
            n = len(s)
            start = j
            while j < n and (s[j].isalnum() and s[j].isascii() or s[j] == "-"):
                j += 1
            lang = normalize_langtag(s[start:j], line, start)
            i = j
        elif s.startswith("^^", i):
            i += 2
            if i >= len(s) or s[i] != "<":
                raise ParseError("UnexpectedChar", "expected datatype IRI", line, i)
            dt, i = scan_iriref(s, i, line)
        return encode_literal(value, lang, dt), i
    raise ParseError("UnexpectedChar", f"expected term, got {c!r}", line, i)


def parse_generalized_nquads(text: str) -> tuple[list[tuple], list[dict]]:
    """S6: generalized N-Quads — any of IRI / bnode / literal / variable /
    quoted-triple in any of the four positions; per-line recovery."""
    triples: list[tuple] = []
    errors: list[dict] = []
    for lineno, raw in enumerate(text.split("\n"), start=1):
        s = raw[:-1] if raw.endswith("\r") else raw
        if not s or s.lstrip(_WS)[:1] in ("", "#"):
            continue
        try:
            i = _skip_ws(s, 0)
            subj, i = _parse_generalized_term(s, i, lineno)
            i = _skip_ws(s, i)
            pred, i = _parse_generalized_term(s, i, lineno)
            i = _skip_ws(s, i)
            obj, i = _parse_generalized_term(s, i, lineno)
            i = _skip_ws(s, i)
            graph = None
            if i < len(s) and s[i] != ".":
                graph, i = _parse_generalized_term(s, i, lineno)
                i = _skip_ws(s, i)
            if i >= len(s) or s[i] != ".":
                raise ParseError("UnexpectedChar", "expected '.'", lineno, i)
            triples.append((subj, pred, obj, graph))
        except ParseError as e:
            e.line = lineno
            errors.append(e.as_row())
    return triples, errors
