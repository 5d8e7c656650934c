"""Turtle / TriG (-star) parser — stateful ``@prefix``/``@base`` environment,
syntax-sugar expansions, RDF-star quoted triples and annotations.

Behavioral reference: /root/reference/turtle/src/turtle.rs (S3/S4, G11-G21,
X1-X6 in SURVEY.md §2) — same observable semantics: later directives shadow
earlier ones (turtle.rs:79-113), language tags lowercased, ``a`` expands to
rdf:type, collections to rdf:first/rest/nil chains, nesting bounded by
MAX_STACK_SIZE=128 (lib.rs:74-78), keyword-vs-prefix lookahead
(turtle.rs:278-301). Implementation written from the public W3C Turtle 1.1 /
TriG grammars (https://www.w3.org/TR/turtle/ §6.5), not translated.

Parsing a document is an order-dependent left fold (SURVEY.md §1.4): the
document is the unit of parallelism; this function runs per document inside
``mapInPandas`` Arrow batches.
"""

from __future__ import annotations

import re

from rio_spark.kernels.errors import MAX_STACK_SIZE, ParseError
from rio_spark.kernels.shared import (
    PN_CHARS_CLASS,
    PN_CHARS_DOT_RUN_RE,
    PN_CHARS_U_CLASS,
    is_pn_chars,
    is_pn_chars_base,
    is_pn_chars_u,
    decode_uchar,
    normalize_langtag,
    resolve_or_validate,
    scan_blank_node_label,
    scan_iriref,
    scan_string,
)
from rio_spark.model import (
    BNode,
    QTriple,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    Term,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    encode_literal,
)

_DOUBLE_RE = re.compile(r"[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.\d+[eE][+-]?\d+|\d+[eE][+-]?\d+)")
_DECIMAL_RE = re.compile(r"[+-]?\d*\.\d+")
_INTEGER_RE = re.compile(r"[+-]?\d+")
_PN_LOCAL_ESC = set("_~.-!$&'()*+,;=/?#@%")
# escape-free PN_LOCAL run and its first-char constraint
_PN_LOCAL_RUN_RE = re.compile(f"[{PN_CHARS_CLASS}:.]*")
_PN_LOCAL_FIRST_RE = re.compile(f"[{PN_CHARS_U_CLASS}:0-9]")
# frozenset membership beats a regex call for the dominant ASCII first chars;
# every member provably matches _PN_LOCAL_FIRST_RE, so the probe is a pure
# fast-accept and the regex stays the single source of truth for the rest
_PN_LOCAL_FIRST_ASCII = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_:"
)

# ---------------------------------------------------------------------------
# statement fast path: one regex for the dominant `S P O .` shape with
# escape-free terms and no syntax sugar. Every term alternative munches
# maximally, so any statement that actually continues (`;`, `,`, `{|`,
# trailing-dot locals, escapes, collections, ...) simply fails the final
# `\s*\.` and falls back to the full grammar — false NEGATIVES only.
# ---------------------------------------------------------------------------
from rio_spark.kernels.shared import PN_CHARS_BASE_CLASS

_F_IRI = r"<[^<>\"{}|^`\\\x00-\x20]*>"
_F_PNAME = (
    f"(?:[{PN_CHARS_BASE_CLASS}][{PN_CHARS_CLASS}.]*(?<!\\.))?:[{PN_CHARS_CLASS}:.]*(?<!\\.)"
)  # first-char rules validated on expand; violations fall back. The
# trailing-dot exclusion lives IN the pattern (one-char backtrack) so
# `:s :p :o.` leaves the terminator unconsumed and fast-paths instead of
# maximal-munching "o." and falling back to the full grammar
_F_BNODE = f"_:(?:[{PN_CHARS_CLASS}.]*(?<!\\.))?"
_F_STRING = r'"[^"\\\n\r]*"(?:@[A-Za-z][A-Za-z0-9-]*)?'
_F_NUM = r"[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.\d+[eE][+-]?\d+|\d+[eE][+-]?\d+|\d*\.\d+|\d+)"
_FAST_STMT_RE = re.compile(
    rf"(?P<s>{_F_IRI}|{_F_BNODE}|{_F_PNAME})[ \t]+"
    rf"(?P<p>a(?=[ \t])|{_F_IRI}|{_F_PNAME})[ \t]+"
    rf"(?P<o>{_F_IRI}|{_F_BNODE}|{_F_STRING}|true|false|{_F_NUM}|{_F_PNAME})"
    rf"[ \t]*\.(?=[ \t\r\n#]|$)"
)
# whitespace-prefixed twin for the fused statement RUN (r7): after one fast
# statement succeeds, the next is matched directly — including its leading
# whitespace/newlines — without bouncing through the document loop's
# skip_ws/at_end/dispatch per statement. Comments are NOT consumed here, so
# a comment line simply ends the run and the outer loop's skip_ws handles
# it — false negatives only, same contract as every fast path.
_FAST_STMT_WS_RE = re.compile(rf"[ \t\r\n]*{_FAST_STMT_RE.pattern}")
# single-object fast path for the slow-path descent (object lists `o1, o2,
# ...` and pred-obj lists are where the statement fast path can't fire — a
# 10k-object list otherwise pays the full grammar per object). The lookahead
# pins the token boundary to a legal follower; anything else (annotations
# `{|`, escapes, datatypes, sugar) falls back to the full grammar — false
# negatives only, same contract as _FAST_STMT_RE. Trailing dots can't be
# munched into PNAME/bnode tokens (pattern-level exclusion above).
_FAST_OBJ_RE = re.compile(
    rf"(?P<o>{_F_IRI}|{_F_BNODE}|{_F_STRING}|true|false|{_F_NUM}|{_F_PNAME})"
    rf"(?=[ \t\r\n,;.\])}}#]|$)"
)
# fused comma-run for object lists: one match consumes ``ws object ws ,`` —
# replacing per-object skip_ws / annotation-probe / separator-peek calls in
# the `o1, o2, ..., oN` hot loop (10k-object lists in benchmark corpora).
# Anything irregular — annotation `{|`, comment, a comma on the next line —
# fails the match and falls back to the generic loop body for that object:
# false negatives only.  Newlines are safe to consume (error line numbers
# are derived from position on demand, _Parser.err).
_FAST_OBJCONT_RE = re.compile(
    rf"[ \t\r\n]*(?P<o>{_F_IRI}|{_F_BNODE}|{_F_STRING}|true|false|{_F_NUM}|{_F_PNAME})"
    rf"[ \t]*,"
)
_F_BNODE_FIRST_RE = re.compile(f"[{PN_CHARS_U_CLASS}0-9]")
# fused semicolon-run for predicate-object lists: one match consumes
# ``ws ; ws verb object`` up to (but not including) a SAME-LINE ';' or '.'
# terminator. The strict terminator lookahead is what makes it safe: an
# RDF-star annotation ``{| ... |}``, a comma-continued object list, a
# datatype, or a next-line separator all fail the match and fall back to
# the generic loop for that continuation — false negatives only. The
# ``s p1 o1 ; p2 o2 ; p3 o3 .`` shape this admits is the bulk of real
# pred-obj sugar (this corpus carries ~one ';' per statement).
_FAST_PREDCONT_RE = re.compile(
    rf"[ \t\r\n]*;[ \t\r\n]*(?P<p>a(?=[ \t])|{_F_IRI}|{_F_PNAME})[ \t]+"
    rf"(?P<o>{_F_IRI}|{_F_BNODE}|{_F_STRING}|true|false|{_F_NUM}|{_F_PNAME})"
    rf"[ \t]*(?=[;.])"
)
# fast verb for the slow-path descent: predicates are IRIs/prefixed names
# that repeat massively (the _pn_cache hit rate is near 1 after the first
# few statements), but parse_verb's full descent re-parsed the token every
# time. Whitespace/comment lookahead only — Turtle allows `:p"lit"` with no
# separator, which simply falls back to the full grammar: false negatives
# only, same contract as the other _FAST_* paths.
_FAST_VERB_RE = re.compile(rf"(?P<p>{_F_IRI}|{_F_PNAME})(?=[ \t\r\n#])")


class _Parser:
    __slots__ = ("s", "i", "n", "prefixes", "base", "bnode_counter", "out",
                 "graph", "quads", "star", "depth", "generalized", "_pn_cache")

    def __init__(self, text: str, base_iri: str | None, quads: bool, star: bool,
                 generalized: bool = False):
        if text.startswith("\ufeff"):
            text = text[1:]
        self.s = text
        self.i = 0
        self.n = len(text)
        self.prefixes: dict[str, str] = {}
        self.base = base_iri
        self.bnode_counter = 0
        self.out: list[tuple] = []
        self.graph: Term | None = None
        self.quads = quads
        self.star = star
        self.depth = 0
        self.generalized = generalized
        # per-document memo: prefixed-name token -> canonical IRI string.
        # Predicates/types repeat across statements; reusing ONE str object
        # per distinct term cuts small-string allocator churn, which is the
        # measured scaling bottleneck at high core counts (BENCH/BASELINE.md).
        # Invalidated on prefix redeclaration; bounded by distinct terms/doc.
        self._pn_cache: dict[str, str] = {}

    def _iri_of(self, iri: str) -> str:
        """Resolve an IRIREF against the base. Generalized mode (S7) keeps
        RELATIVE IRIs as-is when no base is set (gtrig.rs
        parse_generalized_iriref: resolution only happens with a base)."""
        if self.generalized and self.base is None:
            return "<" + iri + ">"
        return "<" + resolve_or_validate(iri, self.base) + ">"

    # -- plumbing ------------------------------------------------------------

    def err(self, kind: str, msg: str) -> ParseError:
        line = self.s.count("\n", 0, self.i) + 1
        byte = self.i - self.s.rfind("\n", 0, self.i)
        return ParseError(kind, msg, line, byte)

    def fresh_bnode(self) -> BNode:
        self.bnode_counter += 1
        return BNode("g", str(self.bnode_counter))

    def emit(self, s: Term, p: Term, o: Term) -> None:
        if self.quads:
            self.out.append((s, p, o, self.graph))
        else:
            self.out.append((s, p, o))

    def enter(self) -> None:
        self.depth += 1
        if self.depth > MAX_STACK_SIZE:
            raise self.err("StackOverflow", f"nesting deeper than {MAX_STACK_SIZE}")

    def leave(self) -> None:
        self.depth -= 1

    def skip_ws(self) -> None:
        s, n = self.s, self.n
        i = self.i
        while i < n:
            c = s[i]
            if c in " \t\r\n":
                i += 1
            elif c == "#":
                j = s.find("\n", i)
                i = n if j < 0 else j + 1
            else:
                break
        self.i = i

    def at_end(self) -> bool:
        return self.i >= self.n

    def peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def expect(self, ch: str) -> None:
        if self.peek() != ch:
            raise self.err("UnexpectedChar", f"expected {ch!r}, got {self.peek()!r}")
        self.i += 1

    def _keyword_ahead(self, kw: str, dot_ends: bool = False) -> bool:
        """Case-insensitive keyword probe that must NOT be a prefixed name:
        the char after the keyword may not continue a PNAME (keyword-vs-prefix
        disambiguation, cf. turtle.rs:278-301 / rio-tests keyword_vs_prefix).

        ``dot_ends=True`` (the boolean-literal probes) matches the reference's
        lookahead (turtle.rs:872-879), which only excludes PN_CHARS and ':':
        ``:s :p true.`` is the boolean followed by the statement terminator,
        not a prefixed name. Directive probes keep '.' as disqualifying so
        ``prefix.x:`` stays a PNAME."""
        j = self.i + len(kw)
        if self.s[self.i : j].lower() != kw:
            return False
        if j < self.n:
            c = self.s[j]
            if c == ":" or is_pn_chars(c) or (c == "." and not dot_ends):
                return False
        return True

    # -- directives (G11, G12) -------------------------------------------------

    def parse_prefix_directive(self, sparql_style: bool) -> None:
        self.skip_ws()
        name = self.parse_pname_ns()
        self.skip_ws()
        if self.peek() != "<":
            raise self.err("UnexpectedChar", "expected IRI in prefix directive")
        iri, self.i = scan_iriref(self.s, self.i, 0)
        self.prefixes[name] = self._iri_of(iri)[1:-1]
        # redeclaration invalidates cached expansions — but only of pnames
        # UNDER THIS PREFIX: '<...>' keys depend on @base, not on any
        # prefix, and pnames of other prefixes are untouched, so a
        # directive-heavy document (directives interleaved with data, legal
        # Turtle) no longer discards the whole cache per @prefix (r6 ADVICE)
        dead = [
            k for k in self._pn_cache
            if k[0] != "<" and k.partition(":")[0] == name
        ]
        for k in dead:
            del self._pn_cache[k]
        if not sparql_style:
            self.skip_ws()
            self.expect(".")

    def parse_base_directive(self, sparql_style: bool) -> None:
        self.skip_ws()
        if self.peek() != "<":
            raise self.err("UnexpectedChar", "expected IRI in base directive")
        iri, self.i = scan_iriref(self.s, self.i, 0)
        self.base = resolve_or_validate(iri, self.base)
        # relative-IRI expansions depend on the base; pname expansions do
        # NOT (prefix values were fully resolved at declaration time), so
        # only '<...>' keys are evicted (r6 ADVICE, churn-only twin of the
        # @prefix fix above)
        dead = [k for k in self._pn_cache if k[0] == "<"]
        for k in dead:
            del self._pn_cache[k]
        if not sparql_style:
            self.skip_ws()
            self.expect(".")

    # -- names (G13, G21) ------------------------------------------------------

    def parse_pname_ns(self) -> str:
        """PNAME_NS := PN_PREFIX? ':' — returns prefix name without colon."""
        s = self.s
        i = self.i
        start = i
        if i < self.n and is_pn_chars_base(s[i]):
            i = PN_CHARS_DOT_RUN_RE.match(s, i + 1).end()
            while s[i - 1] == ".":
                i -= 1
        name = s[start:i]
        self.i = i
        self.expect(":")
        return name

    def parse_prefixed_name(self) -> str:
        name = self.parse_pname_ns()
        ns = self.prefixes.get(name)
        if ns is None:
            raise self.err("UnknownPrefix", f"undeclared prefix {name!r}:")
        # PN_LOCAL := (PN_CHARS_U | ':' | [0-9] | PLX)
        #             ((PN_CHARS | '.' | ':' | PLX)* (PN_CHARS | ':' | PLX))?
        s, n = self.s, self.n
        i = self.i
        # fast path: one regex munch for escape-free locals (the vast majority)
        m = _PN_LOCAL_RUN_RE.match(s, i)
        end = m.end()
        if end > i and not (end < n and s[end] in "%\\"):
            while s[end - 1] == ".":
                end -= 1  # trailing dots end the statement, not the name
            local_str = s[i:end]
            if local_str and not _PN_LOCAL_FIRST_RE.match(local_str):
                raise self.err("InvalidIri", f"bad local name start {local_str[0]!r}")
            self.i = end
            return "<" + ns + local_str + ">"
        # slow path: locals containing %XX / backslash escapes
        local: list[str] = []
        pending_dots = 0
        first = True
        while i < n:
            c = s[i]
            if c == "%":
                h = s[i + 1 : i + 3]
                if len(h) != 2 or not all(x in "0123456789abcdefABCDEF" for x in h):
                    self.i = i
                    raise self.err("InvalidEscape", "bad %XX in local name")
                local.extend("." * pending_dots)
                pending_dots = 0
                local.append(s[i : i + 3])
                i += 3
                first = False
                continue
            if c == "\\":
                if i + 1 >= n or s[i + 1] not in _PN_LOCAL_ESC:
                    self.i = i
                    raise self.err("InvalidEscape", "bad \\ escape in local name")
                local.extend("." * pending_dots)
                pending_dots = 0
                local.append(s[i + 1])
                i += 2
                first = False
                continue
            if c == "." and not first:
                pending_dots += 1  # only valid if more name follows (dot backoff)
                i += 1
                continue
            ok = (is_pn_chars_u(c) or c == ":" or (c.isdigit() and c.isascii())) if first \
                else (is_pn_chars(c) or c == ":")
            if not ok:
                break
            local.extend("." * pending_dots)
            pending_dots = 0
            local.append(c)
            i += 1
            first = False
        i -= pending_dots  # give trailing dots back to the statement
        self.i = i
        return "<" + ns + "".join(local) + ">"

    def parse_iri(self) -> str:
        if self.peek() == "<":
            iri, self.i = scan_iriref(self.s, self.i, 0)
            return self._iri_of(iri)
        return self.parse_prefixed_name()

    # -- literals (G15-G18) ----------------------------------------------------

    def parse_long_string(self, quote: str) -> str:
        """Triple-quoted multiline string; start cursor at first of 3 quotes."""
        s, n = self.s, self.n
        i = self.i + 3
        out: list[str] = []
        while i < n:
            c = s[i]
            if c == quote:
                run = 1
                while i + run < n and s[i + run] == quote and run < 5:
                    run += 1
                if run >= 3:
                    out.append(quote * (run - 3))
                    self.i = i + run
                    return "".join(out)
                out.append(quote * run)
                i += run
                continue
            if c == "\\":
                self.i = i
                if i + 1 < n and s[i + 1] in "uU":
                    ch, i = decode_uchar(s, i + 1, 0)
                    out.append(ch)
                    continue
                e = s[i + 1] if i + 1 < n else ""
                m = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
                     '"': '"', "'": "'", "\\": "\\"}.get(e)
                if m is None:
                    raise self.err("InvalidEscape", f"bad escape \\{e}")
                out.append(m)
                i += 2
                continue
            out.append(c)
            i += 1
        self.i = i
        raise self.err("UnexpectedEof", "unterminated long string")

    def parse_rdf_literal(self) -> str:
        q = self.peek()
        if self.s.startswith(q * 3, self.i):
            value = self.parse_long_string(q)
        else:
            value, self.i = scan_string(self.s, self.i, q, 0)
        lang = dt = None
        c = self.peek()
        if c == "@":
            self.i += 1
            s, n = self.s, self.n
            start = self.i
            i = start
            while i < n and ((s[i].isalnum() and s[i].isascii()) or s[i] == "-"):
                i += 1
            self.i = i
            lang = normalize_langtag(s[start:i], 0, start)
        elif self.s.startswith("^^", self.i):
            self.i += 2
            self.skip_ws()
            dt_iri = self.parse_iri()
            dt = dt_iri[1:-1]
        return encode_literal(value, lang, dt)

    def parse_numeric_literal(self) -> str:
        for rx, dt in ((_DOUBLE_RE, XSD_DOUBLE), (_DECIMAL_RE, XSD_DECIMAL),
                       (_INTEGER_RE, XSD_INTEGER)):
            m = rx.match(self.s, self.i)
            if m:
                self.i = m.end()
                return encode_literal(m.group(), None, dt)
        raise self.err("InvalidLiteral", "malformed numeric literal")

    # -- terms -----------------------------------------------------------------

    def parse_quoted_triple(self) -> QTriple:
        """RDF-star << s p o >> (X5)."""
        if not self.star:
            raise self.err("UnexpectedChar", "RDF-star disabled")
        self.enter()
        self.i += 2
        self.skip_ws()
        if self.generalized:
            # any term in any position, no 'a' keyword (gtrig.rs:586-599)
            subj = self.parse_generalized_term()
            self.skip_ws()
            pred = self.parse_generalized_term()
            self.skip_ws()
            obj = self.parse_generalized_term()
        else:
            subj = self.parse_qt_subject()
            self.skip_ws()
            pred = self.parse_verb()
            self.skip_ws()
            obj = self.parse_object(allow_sugar=False)
        self.skip_ws()
        if not self.s.startswith(">>", self.i):
            raise self.err("UnexpectedChar", "expected '>>'")
        self.i += 2
        self.leave()
        return QTriple(subj, pred, obj)

    def parse_qt_subject(self) -> Term:
        c = self.peek()
        if c == "<" and self.s.startswith("<<", self.i):
            return self.parse_quoted_triple()
        if c == "_":
            label, self.i = scan_blank_node_label(self.s, self.i, 0)
            return BNode("u", label)
        if c == "[":
            # ANON only inside quoted triples
            j = self.i + 1
            while j < self.n and self.s[j] in " \t\r\n":
                j += 1
            if j < self.n and self.s[j] == "]":
                self.i = j + 1
                return self.fresh_bnode()
            raise self.err("UnexpectedChar", "property list not allowed in quoted triple")
        return self.parse_iri()

    def parse_verb(self) -> Term:
        if self.peek() == "a":
            j = self.i + 1
            if j >= self.n or not (is_pn_chars(self.s[j]) or self.s[j] in ":."):
                self.i = j
                return RDF_TYPE
        if self.generalized:
            # any node — including a bnode property list ("composite
            # predicate", gtrig.rs parse_generalized_verb -> node)
            return self.parse_generalized_node()
        m = _FAST_VERB_RE.match(self.s, self.i)
        if m is not None:
            tok = m.group("p")
            t = self._pn_cache.get(tok)
            if t is None:
                t = self._fast_term(tok, "p")
            # predicates must be IRIs — enforce it mechanically (same guard
            # as try_fast_statement / the pred-cont loop) rather than rely on
            # _FAST_VERB_RE never admitting a non-IRI-shaped token
            if t is not None and isinstance(t, str) and t.startswith("<"):
                self.i = m.end()
                return t
        return self.parse_iri()

    def parse_subject(self) -> Term:
        if self.generalized:
            return self.parse_generalized_node()
        c = self.peek()
        if c == "(":
            return self.parse_collection()
        if c == "_":
            label, self.i = scan_blank_node_label(self.s, self.i, 0)
            return BNode("u", label)
        if c == "<" and self.s.startswith("<<", self.i):
            return self.parse_quoted_triple()
        return self.parse_iri()

    # -- generalized terms (S7, gtrig.rs:548-657) -------------------------------

    def parse_variable(self) -> str:
        """``?name`` / ``$name`` -> canonical ``?name``. Name chars follow the
        reference's OBSERVABLE parse_variable behavior (gnquads.rs:187-222):
        PN_CHARS_U | digit first, then PN_CHARS_U | digit (no '-'). The
        grammar text also lists U+00B7 as a continuation char, but the
        reference's ``c == 0xb7`` arm is dead code under its ``c <= MAX_ASCII``
        guard and its unicode class excludes U+00B7 — so ``?a·b`` terminates
        at the middle dot there, and we match that."""
        s, n = self.s, self.n
        i = self.i + 1
        if i >= n or not (is_pn_chars_u(s[i]) or (s[i].isdigit() and s[i].isascii())):
            raise self.err("InvalidVariable", "bad variable name")
        j = i + 1
        while j < n and (is_pn_chars_u(s[j]) or (s[j].isdigit() and s[j].isascii())):
            j += 1
        self.i = j
        return "?" + s[i:j]

    def parse_generalized_term(self) -> Term:
        """Atom in generalized mode — IRI (relative OK) / bnode / ANON /
        literal / variable / quoted triple; NO property-list or collection
        sugar (those are node-level, cf. parse_generalized_node)."""
        c = self.peek()
        if not c:
            raise self.err("UnexpectedEof", "expected term")
        if c == "<":
            if self.s.startswith("<<", self.i):
                return self.parse_quoted_triple()
            iri, self.i = scan_iriref(self.s, self.i, 0)
            return self._iri_of(iri)
        if c == "_":
            label, self.i = scan_blank_node_label(self.s, self.i, 0)
            return BNode("u", label)
        if c == "[":
            # ANON only ('[' ws ']', no comments — same as the reference's
            # is_followed_by_space_and_closing_bracket)
            if self._anon_ahead():
                self.i = self.s.index("]", self.i) + 1
                return self.fresh_bnode()
            raise self.err("UnexpectedChar", "property list not allowed here")
        if c in "\"'":
            return self.parse_rdf_literal()
        if c.isdigit() or c in "+-.":
            return self.parse_numeric_literal()
        if c in "?$":
            return self.parse_variable()
        if self._keyword_ahead("true", dot_ends=True):
            self.i += 4
            return encode_literal("true", None, XSD_BOOLEAN)
        if self._keyword_ahead("false", dot_ends=True):
            self.i += 5
            return encode_literal("false", None, XSD_BOOLEAN)
        return self.parse_prefixed_name()

    def parse_generalized_node(self) -> Term:
        """Node in generalized mode: property list / collection / term."""
        c = self.peek()
        if c == "[" and not self._anon_ahead():
            return self.parse_bnode_property_list()
        if c == "(":
            return self.parse_collection()
        return self.parse_generalized_term()

    def parse_object(self, allow_sugar: bool = True) -> Term:
        if self.generalized:
            return self.parse_generalized_node() if allow_sugar else self.parse_generalized_term()
        m = _FAST_OBJ_RE.match(self.s, self.i)
        if m is not None:
            tok = m.group("o")
            t = self._pn_cache.get(tok)
            if t is None:
                t = self._fast_term(tok, "o")
            if t is not None:
                self.i = m.end()
                return t
        c = self.peek()
        if not c:
            raise self.err("UnexpectedEof", "expected object")
        if c == "<":
            if self.s.startswith("<<", self.i):
                return self.parse_quoted_triple()
            iri, self.i = scan_iriref(self.s, self.i, 0)
            return self._iri_of(iri)
        if c == "_":
            label, self.i = scan_blank_node_label(self.s, self.i, 0)
            return BNode("u", label)
        if c == "(":
            if not allow_sugar:
                raise self.err("UnexpectedChar", "collection not allowed here")
            return self.parse_collection()
        if c == "[":
            if not allow_sugar:
                return self.parse_qt_subject()
            return self.parse_bnode_property_list()
        if c in "\"'":
            return self.parse_rdf_literal()
        if c.isdigit() or c in "+-.":
            return self.parse_numeric_literal()
        if self._keyword_ahead("true", dot_ends=True):
            self.i += 4
            return encode_literal("true", None, XSD_BOOLEAN)
        if self._keyword_ahead("false", dot_ends=True):
            self.i += 5
            return encode_literal("false", None, XSD_BOOLEAN)
        return self.parse_iri()

    # -- sugar expansions (X1-X4, G19) -------------------------------------------

    def parse_collection(self) -> Term:
        """( e1 e2 … ) -> rdf:first/rdf:rest/rdf:nil chain (X3)."""
        self.enter()
        self.expect("(")
        head: Term = RDF_NIL
        prev: BNode | None = None
        while True:
            self.skip_ws()
            if self.at_end():
                raise self.err("UnexpectedEof", "unterminated collection")
            if self.peek() == ")":
                self.i += 1
                break
            cell = self.fresh_bnode()
            if prev is None:
                head = cell
            else:
                self.emit(prev, RDF_REST, cell)
            obj = self.parse_object()
            self.emit(cell, RDF_FIRST, obj)
            prev = cell
        if prev is not None:
            self.emit(prev, RDF_REST, RDF_NIL)
        self.leave()
        return head

    def parse_bnode_property_list(self) -> Term:
        """[ p o ; … ] -> fresh bnode + inner triples (X4); [] -> ANON (G19)."""
        self.enter()
        self.expect("[")
        self.skip_ws()
        node = self.fresh_bnode()
        if self.peek() == "]":
            self.i += 1
            self.leave()
            return node
        self.parse_predicate_object_list(node)
        self.skip_ws()
        self.expect("]")
        self.leave()
        return node

    def parse_predicate_object_list(self, subject: Term) -> None:
        """verb objectList (';' (verb objectList)?)* (X1/X2)."""
        while True:
            self.skip_ws()
            pred = self.parse_verb()
            # objectList: object (',' object)*
            while True:
                self.skip_ws()
                obj = self.parse_object()
                self.emit(subject, pred, obj)
                self.parse_annotation_opt(subject, pred, obj)
                self.skip_ws()
                if self.peek() == ",":
                    self.i += 1
                    # fused comma-run: each iteration is one regex match plus
                    # one term expansion; whatever it can't prove falls back
                    # to the generic body above (via the outer `continue`).
                    # emit is inlined (bound append; graph constant inside a
                    # run — r7, same as the fused statement run)
                    cache_get = self._pn_cache.get
                    out_append = self.out.append
                    quads, g = self.quads, self.graph
                    while True:
                        m = _FAST_OBJCONT_RE.match(self.s, self.i)
                        if m is None:
                            break
                        tok = m.group("o")
                        t = cache_get(tok)
                        if t is None:
                            t = self._fast_term(tok, "o")
                            if t is None:
                                break
                        out_append((subject, pred, t, g) if quads
                                   else (subject, pred, t))
                        self.i = m.end()
                    continue
                break
            # fused semicolon-run: each iteration consumes one `; verb
            # object` continuation terminated by a same-line ';' or '.';
            # anything it can't prove falls through to the generic loop.
            # emit inlined as in the comma-run above (r7)
            cache_get = self._pn_cache.get
            out_append = self.out.append
            quads, g = self.quads, self.graph
            while True:
                m = _FAST_PREDCONT_RE.match(self.s, self.i)
                if m is None:
                    break
                pt = m.group("p")
                if pt == "a":
                    p2 = RDF_TYPE
                else:
                    p2 = cache_get(pt)
                    if p2 is None:
                        p2 = self._fast_term(pt, "p")
                if p2 is None or not (isinstance(p2, str) and p2.startswith("<")):
                    break
                tok = m.group("o")
                o2 = cache_get(tok)
                if o2 is None:
                    o2 = self._fast_term(tok, "o")
                    if o2 is None:
                        break
                out_append((subject, p2, o2, g) if quads
                           else (subject, p2, o2))
                self.i = m.end()
            # predicate continuation
            saw_semi = False
            while self.peek() == ";":
                saw_semi = True
                self.i += 1
                self.skip_ws()
            if not saw_semi:
                return
            c = self.peek()
            if not c or c in ".]}|" or (c == ")" ):
                return  # trailing ';'

    def parse_annotation_opt(self, s: Term, p: Term, o: Term) -> None:
        """RDF-star annotation ``{| … |}`` attaches metadata to << s p o >> (X2)."""
        self.skip_ws()
        if not self.s.startswith("{|", self.i):
            return
        if not self.star:
            raise self.err("UnexpectedChar", "RDF-star disabled")
        self.enter()
        self.i += 2
        self.parse_predicate_object_list(QTriple(s, p, o))
        self.skip_ws()
        if not self.s.startswith("|}", self.i):
            raise self.err("UnexpectedChar", "expected '|}'")
        self.i += 2
        self.leave()

    def parse_triples(self) -> None:
        c = self.peek()
        if c == "[":
            # blankNodePropertyList predicateObjectList?
            j = self.i + 1
            while j < self.n and self.s[j] in " \t\r\n":
                j += 1
            is_anon = j < self.n and self.s[j] == "]"
            subj = self.parse_bnode_property_list()
            self.skip_ws()
            if self.peek() != "." and not (self.quads and self.peek() in "}"):
                self.parse_predicate_object_list(subj)
            elif is_anon:
                raise self.err("UnexpectedChar", "ANON subject needs predicates")
        else:
            subj = self.parse_subject()
            self.skip_ws()
            self.parse_predicate_object_list(subj)

    # -- statements ---------------------------------------------------------------

    def parse_directive_opt(self) -> bool:
        if self.peek() == "@":
            self.i += 1
            if self.s.startswith("prefix", self.i):
                self.i += 6
                self.parse_prefix_directive(sparql_style=False)
                return True
            if self.s.startswith("base", self.i):
                self.i += 4
                self.parse_base_directive(sparql_style=False)
                return True
            raise self.err("UnexpectedChar", "unknown @directive")
        if self._keyword_ahead("prefix"):
            self.i += 6
            self.parse_prefix_directive(sparql_style=True)
            return True
        if self._keyword_ahead("base"):
            self.i += 4
            self.parse_base_directive(sparql_style=True)
            return True
        return False

    # -- statement fast path ---------------------------------------------------

    def _fast_term(self, tok: str, pos: str):
        """Expand a fast-path token; None = fall back to the full grammar.

        MISS path only: every call site probes ``_pn_cache`` itself before
        calling (the probe used to run twice per miss — r7 dropped the
        internal one; ~4 dict gets per triple went to ~3)."""
        c0 = tok[0]
        if c0 == "<":
            try:
                out = self._iri_of(tok[1:-1])
            except ParseError:
                return None
            self._pn_cache[tok] = out
            return out
        if c0 == "_":
            label = tok[2:]
            # no trailing-dot check: the _F_BNODE pattern cannot end with one
            if not label or not _F_BNODE_FIRST_RE.match(label):
                return None
            # safe to share the cache: a BNode is not a str, so the
            # predicate call sites' isinstance/startswith('<') guard rejects
            # a cache hit in p position exactly as the miss path would
            out = BNode("u", label)
            self._pn_cache[tok] = out
            return out
        if c0 == '"':
            # token -> term is deterministic (langtag normalization and the
            # datatype IRIs carry no parser state), so literals cache in the
            # same per-parser map as the pnames; object values repeat plenty
            # ("0", "1", enum-ish strings) in real corpora
            qi = tok.rfind('"')
            value = tok[1:qi]
            rest = tok[qi + 1 :]
            if rest:
                try:
                    out = encode_literal(value, normalize_langtag(rest[1:]))
                except ParseError:
                    return None
            else:
                out = encode_literal(value)
            self._pn_cache[tok] = out
            return out
        if pos == "p" and tok == "a":
            return RDF_TYPE
        if pos == "o":
            if tok == "true" or tok == "false":
                # cacheable despite the pos gate: every literal encoding
                # starts with '"', so a hit in s position is rejected by
                # try_fast_statement's literal-subject guard and a hit in
                # p position by the startswith('<') guard — both fall back
                # to the full grammar, which raises the same error the
                # miss path would ('a' has no such guard, so it stays
                # uncached and pos-gated)
                out = encode_literal(tok, None, XSD_BOOLEAN)
                self._pn_cache[tok] = out
                return out
            if c0.isdigit() or c0 in "+-.":
                # the three grammars are mutually exclusive (double needs an
                # exponent, decimal a dot without one), so probe integers —
                # the overwhelmingly common case — first
                for rx, dt in ((_INTEGER_RE, XSD_INTEGER), (_DECIMAL_RE, XSD_DECIMAL),
                               (_DOUBLE_RE, XSD_DOUBLE)):
                    if rx.fullmatch(tok):
                        out = encode_literal(tok, None, dt)
                        self._pn_cache[tok] = out
                        return out
                return None
        ci = tok.find(":")
        if ci < 0:
            return None
        prefix = tok[:ci]
        local = tok[ci + 1 :]
        # no trailing-dot checks: the _F_PNAME pattern cannot end with one;
        # ASCII set probe first — almost every real local starts [A-Za-z0-9_:]
        # — with the regex only for the non-ASCII PN_CHARS_BASE tail
        if local and local[0] not in _PN_LOCAL_FIRST_ASCII and not _PN_LOCAL_FIRST_RE.match(local):
            return None
        ns = self.prefixes.get(prefix)
        if ns is None:
            return None  # slow path raises the positioned UnknownPrefix
        out = "<" + ns + local + ">"
        self._pn_cache[tok] = out
        return out

    def try_fast_statement(self) -> bool:
        """Consume a RUN of consecutive fast statements (r7): after each
        success the whitespace-prefixed twin regex matches the next
        statement directly, skipping the document loop's per-statement
        skip_ws/at_end/dispatch glue.  A term the fast path can't prove
        leaves ``self.i`` at that statement's start (nothing of it was
        consumed), so the caller's slow path re-parses it with positioned
        errors exactly as before; the graph label cannot change inside a
        run (only block structure changes it, which the statement shape
        can't match), so TriG emission stays correct."""
        m = _FAST_STMT_RE.match(self.s, self.i)
        if m is None:
            return False
        # the cache probe is inlined at every fast call site: tokens repeat
        # massively, so the hit path skips the _fast_term call entirely —
        # the per-statement cost drops to three dict gets plus the guards
        cache = self._pn_cache
        cg = cache.get
        quads = self.quads
        g = self.graph
        out_append = self.out.append
        any_ok = False
        while True:
            tok = m.group("s")
            s = cg(tok)
            if s is None:
                s = self._fast_term(tok, "s")
            if s is None or isinstance(s, str) and s.startswith('"'):
                return any_ok  # literal subjects invalid — full grammar rejects
            tok = m.group("p")
            if tok == "a":  # rdf:type sugar — pos-gated, so never in the cache
                p = RDF_TYPE
            else:
                p = cg(tok)
                if p is None:
                    p = self._fast_term(tok, "p")
                if p is None or not (isinstance(p, str) and p.startswith("<")):
                    return any_ok
            tok = m.group("o")
            o = cg(tok)
            if o is None:
                o = self._fast_term(tok, "o")
                if o is None:
                    return any_ok
            out_append((s, p, o, g) if quads else (s, p, o))
            self.i = m.end()
            any_ok = True
            m = _FAST_STMT_WS_RE.match(self.s, self.i)
            if m is None:
                return any_ok

    def parse_turtle_statement(self) -> None:
        if self.try_fast_statement():
            return
        if self.parse_directive_opt():
            return
        self.parse_triples()
        self.skip_ws()
        self.expect(".")

    # -- TriG blocks (S4, X6) -------------------------------------------------------

    def parse_wrapped_graph(self, label: Term | None) -> None:
        self.expect("{")
        prev = self.graph
        self.graph = label
        while True:
            self.skip_ws()
            if self.at_end():
                raise self.err("UnexpectedEof", "unterminated graph block")
            if self.peek() == "}":
                self.i += 1
                break
            if self.try_fast_statement():
                continue
            self.parse_triples()
            self.skip_ws()
            if self.peek() == ".":
                self.i += 1
            elif self.peek() != "}":
                raise self.err("UnexpectedChar", "expected '.' or '}' in graph block")
        self.graph = prev

    def parse_trig_block(self) -> None:
        if self.try_fast_statement():
            return
        if self.parse_directive_opt():
            return
        c = self.peek()
        if c == "{":
            self.parse_wrapped_graph(None)
            return
        if self._keyword_ahead("graph"):
            save = self.i
            self.i += 5
            self.skip_ws()
            c2 = self.peek()
            if c2 in "<_[" or c2 == ":" or is_pn_chars_base(c2):
                label = self.parse_graph_label(label_only=True)
                self.skip_ws()
                self.parse_wrapped_graph(label)
                return
            self.i = save  # not the GRAPH keyword after all
        if c == "[":
            # ANON can label a graph: `[] { … }` (TriG labelOrSubject)
            j = self.i + 1
            while j < self.n and self.s[j] in " \t\r\n":
                j += 1
            if j < self.n and self.s[j] == "]":
                k = j + 1
                while k < self.n and self.s[k] in " \t\r\n":
                    k += 1
                if k < self.n and self.s[k] == "{":
                    self.i = j + 1
                    self.skip_ws()
                    self.parse_wrapped_graph(self.fresh_bnode())
                    return
        if c in "(['\"" or (c and (c.isdigit() or c in "+-.")):
            # cannot be a graph label — plain triples in the default graph
            self.parse_triples()
            self.skip_ws()
            self.expect(".")
            return
        # iri | bnode-label | ANON: graph label iff '{' follows
        label = self.parse_graph_label()
        self.skip_ws()
        if self.peek() == "{":
            self.parse_wrapped_graph(label)
            return
        if isinstance(label, QTriple):
            raise self.err("UnexpectedChar", "quoted triple cannot label a graph")
        self.parse_predicate_object_list(label)
        self.skip_ws()
        self.expect(".")

    def parse_gtrig_block(self) -> None:
        """S7 generalized TriG block: any term (literal, variable, quoted
        triple, ...) can label a graph; the label-vs-subject decision is made
        after parsing one generalized node by peeking for '{'
        (gtrig.rs parse_generalized_triples_or_graph)."""
        if self.try_fast_statement():
            return
        if self.parse_directive_opt():
            return
        c = self.peek()
        if c == "{":
            self.parse_wrapped_graph(None)
            return
        if self._keyword_ahead("graph"):
            # the reference commits to the keyword only when followed by
            # whitespace or '<' (gtrig.rs:134-139)
            j = self.i + 5
            if j >= self.n or self.s[j] in " \t\r\n<" or self.s[j] == "#":
                self.i = j
                self.skip_ws()
                label = self.parse_generalized_term()
                self.skip_ws()
                self.parse_wrapped_graph(label)
                return
        if c == "(" or (c == "[" and not self._anon_ahead()):
            # triples2: bpl/collection subject, never a graph label
            self.parse_triples()
            self.skip_ws()
            self.expect(".")
            return
        node = self.parse_generalized_node()
        self.skip_ws()
        if self.peek() == "{":
            self.parse_wrapped_graph(node)
            return
        self.parse_predicate_object_list(node)
        self.skip_ws()
        self.expect(".")

    def _anon_ahead(self) -> bool:
        j = self.i + 1
        while j < self.n and self.s[j] in " \t\r\n":
            j += 1
        return j < self.n and self.s[j] == "]"

    def parse_graph_label(self, label_only: bool = False) -> Term:
        c = self.peek()
        if c == "_":
            label, self.i = scan_blank_node_label(self.s, self.i, 0)
            return BNode("u", label)
        if c == "[":
            # labelOrSubject only admits ANON, never a property list
            j = self.i + 1
            while j < self.n and self.s[j] in " \t\r\n":
                j += 1
            if j < self.n and self.s[j] == "]":
                self.i = j + 1
                return self.fresh_bnode()
            raise self.err("UnexpectedChar", "property list cannot label a graph")
        if c == "<" and self.s.startswith("<<", self.i):
            if label_only:
                raise self.err("UnexpectedChar", "quoted triple cannot label a graph")
            return self.parse_quoted_triple()
        return self.parse_iri()

    # -- document -------------------------------------------------------------------

    def run(self) -> tuple[list[tuple], list[dict], dict[str, str]]:
        errors: list[dict] = []
        try:
            while True:
                self.skip_ws()
                if self.at_end():
                    break
                if self.generalized:
                    self.parse_gtrig_block()
                elif self.quads:
                    self.parse_trig_block()
                else:
                    self.parse_turtle_statement()
        except ParseError as e:
            if e.line == 0:
                pos = e.byte or self.i
                e.line = self.s.count("\n", 0, pos) + 1
                e.byte = pos - self.s.rfind("\n", 0, pos)
            # a Turtle syntax error poisons the rest of the document
            # (statement-level recovery is not possible mid-grammar; SURVEY §7.3)
            errors.append(e.as_row())
        return self.out, errors, dict(self.prefixes)


def parse_turtle(
    text: str, base_iri: str | None = None, star: bool = True
) -> tuple[list[tuple], list[dict]]:
    """S3: Turtle(-star) document -> ([(s, p, o)], [error rows])."""
    t, e, _ = _Parser(text, base_iri, quads=False, star=star).run()
    return t, e


def parse_trig(
    text: str, base_iri: str | None = None, star: bool = True
) -> tuple[list[tuple], list[dict]]:
    """S4: TriG(-star) document -> ([(s, p, o, g)], [error rows])."""
    t, e, _ = _Parser(text, base_iri, quads=True, star=star).run()
    return t, e


def parse_gtrig(
    text: str, base_iri: str | None = None
) -> tuple[list[tuple], list[dict]]:
    """S7: generalized TriG(-star) — variables (?x/$x), literals and quoted
    triples in ANY position including predicates and graph labels, relative
    IRIs kept when no base (reference turtle/src/gtrig.rs:48-91; the
    non-default `generalized` cargo feature)."""
    t, e, _ = _Parser(text, base_iri, quads=True, star=True, generalized=True).run()
    return t, e


def turtle_prefixes(text: str, base_iri: str | None = None) -> dict[str, str]:
    """Final prefix environment after parsing (cf. TurtleParser::prefixes)."""
    _, _, p = _Parser(text, base_iri, quads=False, star=True).run()
    return p
