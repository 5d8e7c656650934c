"""Shared lexical kernels for all RDF text formats.

Covers SURVEY.md §2.3 G1-G10: IRIREF lexing + ``\\uXXXX``/``\\UXXXXXXXX``
decoding, absolute-IRI validation, RFC 3986 §5 relative-reference resolution,
blank-node labels, BCP-47 language tags (lowercase-normalized), string
literals with ECHAR/UCHAR, and the W3C PN_CHARS identifier alphabets.
Behavioral reference: /root/reference/turtle/src/shared.rs (G1-G10 rows in
SURVEY.md §2 cite exact lines); implementation is from the public W3C Turtle
1.1 grammar and RFC 3986/3987 — not a translation.
"""

from __future__ import annotations

import re

from rio_spark.kernels.errors import ParseError

# --------------------------------------------------------------------------
# W3C identifier alphabets (Turtle 1.1 §6.5 grammar productions 163s-166s)
# --------------------------------------------------------------------------

# character classes as regex fragments (compiled predicates are ~10x faster
# than per-char python range scans in the parser hot path)
PN_CHARS_BASE_CLASS = (
    "A-Za-zÀ-ÖØ-öø-˿Ͱ-ͽͿ-῿"
    "‌-‍⁰-↏Ⰰ-⿯、-퟿豈-﷏"
    "ﷰ-�\U00010000-\U000EFFFF"
)
PN_CHARS_U_CLASS = PN_CHARS_BASE_CLASS + "_"
PN_CHARS_CLASS = PN_CHARS_U_CLASS + "0-9·̀-ͯ‿-⁀\\-"

_PN_CHARS_BASE_RE = re.compile(f"[{PN_CHARS_BASE_CLASS}]")
_PN_CHARS_U_RE = re.compile(f"[{PN_CHARS_U_CLASS}]")
_PN_CHARS_RE = re.compile(f"[{PN_CHARS_CLASS}]")
# maximal (PN_CHARS | '.')* run — callers back off trailing dots
PN_CHARS_DOT_RUN_RE = re.compile(f"[{PN_CHARS_CLASS}.]*")


def is_pn_chars_base(c: str) -> bool:
    return _PN_CHARS_BASE_RE.match(c) is not None


def is_pn_chars_u(c: str) -> bool:
    return _PN_CHARS_U_RE.match(c) is not None


def is_pn_chars(c: str) -> bool:
    return _PN_CHARS_RE.match(c) is not None


# --------------------------------------------------------------------------
# UCHAR / ECHAR decoding (G7, G8)
# --------------------------------------------------------------------------

_ECHAR = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
          '"': '"', "'": "'", "\\": "\\"}


def decode_uchar(s: str, i: int, line: int) -> tuple[str, int]:
    """Decode ``\\uXXXX`` / ``\\UXXXXXXXX`` starting at the ``u``/``U`` in s[i].
    Returns (char, next_index). Rejects surrogates and out-of-range scalars."""
    width = 4 if s[i] == "u" else 8
    hexs = s[i + 1 : i + 1 + width]
    if len(hexs) != width or not all(c in "0123456789abcdefABCDEF" for c in hexs):
        raise ParseError("InvalidUnicodeCodePoint", f"bad \\{s[i]} escape", line, i)
    cp = int(hexs, 16)
    if 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
        raise ParseError("InvalidUnicodeCodePoint", f"invalid scalar U+{cp:X}", line, i)
    return chr(cp), i + 1 + width


# --------------------------------------------------------------------------
# IRIREF (G1, G2)
# --------------------------------------------------------------------------

# chars forbidden inside IRIREF by the grammar: controls, space, <>"{}|^`\
# ('\\' is listed so a UCHAR-decoded backslash is rejected too, matching the
# reference's full Iri::parse; raw '\\' never reaches the membership test
# because scan_iriref handles it as an escape introducer first)
_IRI_FORBIDDEN = set('<>"{}|^`\\') | {chr(c) for c in range(0x21)}


def scan_iriref(s: str, i: int, line: int) -> tuple[str, int]:
    """Lex ``<...>`` starting at the ``<`` in s[i]; decode UCHAR escapes.
    Returns (iri, index_after_closing_gt)."""
    assert s[i] == "<"
    i += 1
    out: list[str] = []
    n = len(s)
    while i < n:
        c = s[i]
        if c == ">":
            return "".join(out), i + 1
        if c == "\\":
            if i + 1 < n and s[i + 1] in "uU":
                ch, i = decode_uchar(s, i + 1, line)
                if ch in _IRI_FORBIDDEN:
                    raise ParseError("InvalidIriCodePoint",
                                     f"escaped forbidden char {ch!r} in IRI", line, i)
                out.append(ch)
                continue
            raise ParseError("InvalidIriCodePoint", "only \\u/\\U escapes allowed in IRI", line, i)
        if c in _IRI_FORBIDDEN:
            raise ParseError("InvalidIriCodePoint", f"forbidden char {c!r} in IRI", line, i)
        out.append(c)
        i += 1
    raise ParseError("UnexpectedEof", "unterminated IRI", line, i)


_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*$")


def split_iri(iri: str) -> tuple[str | None, str | None, str, str | None, str | None]:
    """RFC 3986 component split: (scheme, authority, path, query, fragment)."""
    scheme = authority = query = fragment = None
    rest = iri
    h = rest.find("#")
    if h >= 0:
        fragment, rest = rest[h + 1 :], rest[:h]
    q = rest.find("?")
    if q >= 0:
        query, rest = rest[q + 1 :], rest[:q]
    c = rest.find(":")
    sl = rest.find("/")
    if c > 0 and (sl < 0 or c < sl) and _SCHEME_RE.match(rest[:c]):
        scheme, rest = rest[:c], rest[c + 1 :]
    if rest.startswith("//"):
        rest2 = rest[2:]
        end = len(rest2)
        for ch in "/?#":
            p = rest2.find(ch)
            if 0 <= p < end:
                end = p
        authority, rest = rest2[:end], rest2[end:]
    return scheme, authority, rest, query, fragment


def validate_absolute_iri(iri: str, line: int = 0, byte: int = 0) -> str:
    """G2: the IRI must have a valid scheme (RFC 3987 absolute-IRI check)."""
    scheme, _, _, _, _ = split_iri(iri)
    if scheme is None:
        raise ParseError("InvalidIri", f"relative IRI with no base: <{iri}>", line, byte)
    return iri


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            i = path.find("/", 1)
            if i < 0:
                out.append(path)
                path = ""
            else:
                out.append(path[:i])
                path = path[i:]
    return "".join(out)


def _merge_paths(base_authority: str | None, base_path: str, ref_path: str) -> str:
    """RFC 3986 §5.3 merge."""
    if base_authority is not None and not base_path:
        return "/" + ref_path
    i = base_path.rfind("/")
    if i < 0:
        return ref_path
    return base_path[: i + 1] + ref_path


def resolve_iri(base: str, ref: str) -> str:
    """G3: RFC 3986 §5.2 reference resolution (strict), on IRIs."""
    r_scheme, r_auth, r_path, r_query, r_frag = split_iri(ref)
    if r_scheme is not None:
        t = (r_scheme, r_auth, _remove_dot_segments(r_path), r_query)
    else:
        b_scheme, b_auth, b_path, b_query, _ = split_iri(base)
        if r_auth is not None:
            t = (b_scheme, r_auth, _remove_dot_segments(r_path), r_query)
        elif not r_path:
            t = (b_scheme, b_auth, b_path, r_query if r_query is not None else b_query)
        elif r_path.startswith("/"):
            t = (b_scheme, b_auth, _remove_dot_segments(r_path), r_query)
        else:
            t = (b_scheme, b_auth,
                 _remove_dot_segments(_merge_paths(b_auth, b_path, r_path)), r_query)
    scheme, auth, path, query = t
    parts = []
    if scheme is not None:
        parts += [scheme, ":"]
    if auth is not None:
        parts += ["//", auth]
    parts.append(path)
    if query is not None:
        parts += ["?", query]
    if r_frag is not None:
        parts += ["#", r_frag]
    return "".join(parts)


def resolve_or_validate(iri: str, base: str | None, line: int = 0, byte: int = 0) -> str:
    if base is None:
        return validate_absolute_iri(iri, line, byte)
    scheme, _, _, _, _ = split_iri(iri)
    if scheme is not None:
        return iri
    return resolve_iri(base, iri)


# --------------------------------------------------------------------------
# Language tags (G5): validate BCP-47 shape, lowercase-normalize
# --------------------------------------------------------------------------

# RFC 5646 well-formedness (langtag | privateuse), matched on the lowercased
# tag — same validation depth as the reference (which delegates to a BCP-47
# library after its charset scan, shared.rs:141-147). Grandfathered tags are
# accepted from the published irregular list.
_BCP47_RE = re.compile(
    r"^(?:"
    r"(?:[a-z]{2,3}(?:-[a-z]{3}(?:-[a-z]{3}){0,2})?|[a-z]{4}|[a-z]{5,8})"  # language
    r"(?:-[a-z]{4})?"                                                      # script
    r"(?:-(?:[a-z]{2}|[0-9]{3}))?"                                         # region
    r"(?:-(?:[a-z0-9]{5,8}|[0-9][a-z0-9]{3}))*"                            # variant
    r"(?:-[a-wy-z0-9](?:-[a-z0-9]{2,8})+)*"                                # extension
    r"(?:-x(?:-[a-z0-9]{1,8})+)?"                                          # privateuse
    r"|x(?:-[a-z0-9]{1,8})+"                                               # privateuse only
    r")$"
)
_BCP47_IRREGULAR = {
    "en-gb-oed", "i-ami", "i-bnn", "i-default", "i-enochian", "i-hak",
    "i-klingon", "i-lux", "i-mingo", "i-navajo", "i-pwn", "i-tao", "i-tay",
    "i-tsu", "sgn-be-fr", "sgn-be-nl", "sgn-ch-de",
}


def normalize_langtag(tag: str, line: int = 0, byte: int = 0) -> str:
    low = tag.lower()
    if not _BCP47_RE.match(low) and low not in _BCP47_IRREGULAR:
        raise ParseError("InvalidLanguageTag", f"malformed language tag {tag!r}", line, byte)
    return low


# --------------------------------------------------------------------------
# Blank node labels (G4)
# --------------------------------------------------------------------------

def scan_blank_node_label(s: str, i: int, line: int) -> tuple[str, int]:
    """Lex ``_:label`` starting at the ``_``; trailing-dot backoff per grammar
    (PN_CHARS | '.')* with the label not ending in '.'."""
    assert s[i] == "_"
    if i + 1 >= len(s) or s[i + 1] != ":":
        raise ParseError("InvalidBlankNode", "expected ':' after '_'", line, i)
    i += 2
    n = len(s)
    if i >= n:
        raise ParseError("UnexpectedEof", "eof in blank node label", line, i)
    c = s[i]
    if not (is_pn_chars_u(c) or (c.isdigit() and c.isascii())):
        raise ParseError("InvalidBlankNode", f"bad first label char {c!r}", line, i)
    start = i
    i += 1
    while i < n and (is_pn_chars(s[i]) or s[i] == "."):
        i += 1
    # back off trailing dots (they terminate statements, not labels)
    while s[i - 1] == ".":
        i -= 1
    return s[start:i], i


# --------------------------------------------------------------------------
# Single-line quoted strings (G6) — shared by NT and Turtle
# --------------------------------------------------------------------------

def scan_string(s: str, i: int, quote: str, line: int) -> tuple[str, int]:
    """Lex a single-line string starting at the opening quote s[i]; decode
    ECHAR + UCHAR. Returns (value, index_after_closing_quote)."""
    assert s[i] == quote
    i += 1
    out: list[str] = []
    n = len(s)
    while i < n:
        c = s[i]
        if c == quote:
            return "".join(out), i + 1
        if c in "\n\r":
            raise ParseError("UnexpectedEol", "newline in single-line string", line, i)
        if c == "\\":
            if i + 1 >= n:
                raise ParseError("UnexpectedEof", "eof in escape", line, i)
            e = s[i + 1]
            if e in "uU":
                ch, i = decode_uchar(s, i + 1, line)
                out.append(ch)
                continue
            if e in _ECHAR:
                out.append(_ECHAR[e])
                i += 2
                continue
            raise ParseError("InvalidEscape", f"bad escape \\{e}", line, i)
        out.append(c)
        i += 1
    raise ParseError("UnexpectedEof", "unterminated string", line, i)
