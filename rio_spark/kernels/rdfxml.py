"""RDF/XML parser — streaming SAX (expat) state machine.

Behavioral reference: /root/reference/xml/src/parser.rs (S5/X7 in SURVEY.md
§2) — same observable semantics on the vendored corpus: DTD entity expansion
(incl. nested entities), rdf:about/ID/nodeID subjects, typed node elements,
property attributes, rdf:resource/nodeID/datatype objects, parseType
Resource/Collection/Literal, rdf:li counters, property-element rdf:ID
reification, xml:base resolution, xml:lang inheritance with BCP-47
lowercase-normalization, duplicate rdf:ID detection, and exact literal
whitespace preservation (rio-tests literal_value_space). Implementation
written from the public W3C RDF/XML syntax spec, not translated.

parseType="Literal" capture matches the reference's observable strategy
(an event rewrite, parser.rs:288-300, not a byte copy): source-form
prefixed qnames (expat namespace_prefixes triplets), xmlns declarations
re-emitted where declared, attribute values escaped, text/CDATA escaped.
Remaining canonical-form liberties, both per XML c14n: empty elements
expand to ``<a></a>`` and comments are dropped.
"""

from __future__ import annotations

import xml.parsers.expat

from rio_spark.kernels.errors import MAX_STACK_SIZE, ParseError
from rio_spark.kernels.shared import normalize_langtag, resolve_or_validate
from rio_spark.model import BNode, RDF_FIRST, RDF_NIL, RDF_NS, RDF_REST, RDF_TYPE, Term, encode_literal

_SEP = "\x01"
XML_NS = "http://www.w3.org/XML/1998/namespace"
XML_LITERAL = f"{RDF_NS}XMLLiteral"

# rdf attributes that are syntax, not property attributes
_SYNTAX_ATTRS = {f"{RDF_NS}{x}" for x in
                 ("about", "ID", "nodeID", "resource", "datatype", "parseType",
                  "li", "aboutEach", "aboutEachPrefix", "bagID")}
# element names never allowed as node elements (rdf:Description IS one)
_FORBIDDEN_NODE = {f"{RDF_NS}{x}" for x in ("RDF", "ID", "about", "parseType",
                                            "resource", "nodeID", "li", "aboutEach",
                                            "aboutEachPrefix", "bagID")}
# names never allowed as property elements (rdf:li is rewritten before this check)
_FORBIDDEN_PROP = _FORBIDDEN_NODE | {f"{RDF_NS}Description"} - {f"{RDF_NS}li"}


def _split(expat_name: str) -> tuple[str | None, str]:
    # with namespace_prefixes=True expat reports "uri SEP local SEP prefix"
    # for prefixed names, "uri SEP local" for default-ns, "local" for none
    parts = expat_name.split(_SEP)
    if len(parts) >= 2:
        return parts[0], parts[1]
    return None, parts[0]


def _strip_prefix(expat_name: str) -> str:
    """Drop the trailing prefix of an expat namespace triplet, keeping the
    2-part ``uri SEP local`` form every semantic lookup uses."""
    i = expat_name.find(_SEP)
    if i == -1:
        return expat_name
    j = expat_name.find(_SEP, i + 1)
    return expat_name if j == -1 else expat_name[:j]


def _qname(expat_name: str) -> str:
    """Source-form qualified name (``prefix:local`` or ``local``) — what the
    author wrote, re-derivable only because namespace_prefixes=True."""
    parts = expat_name.split(_SEP)
    if len(parts) == 3:
        return f"{parts[2]}:{parts[1]}"
    return parts[1] if len(parts) == 2 else parts[0]


def _esc_attr(v: str) -> str:
    return v.replace("&", "&amp;").replace("<", "&lt;").replace('"', "&quot;")


class _Frame:
    __slots__ = ("kind", "subject", "predicate", "reify_id", "datatype", "text",
                 "has_child", "li_counter", "base", "lang", "items", "object",
                 "xml_depth", "xml_parts", "emitted")

    def __init__(self, kind: str):
        self.kind = kind  # top | rdf | node | prop | collection | xmlliteral
        self.subject: Term | None = None
        self.predicate: str | None = None
        self.reify_id: str | None = None
        self.datatype: str | None = None
        self.text: list[str] = []
        self.has_child = False
        self.li_counter = 0
        self.base: str | None = None
        self.lang: str | None = None
        self.items: list[Term] = []
        self.object: Term | None = None
        self.xml_depth = 0
        self.xml_parts: list[str] = []
        self.emitted = False


class _RdfXmlParser:
    def __init__(self, base_iri: str | None):
        self.out: list[tuple] = []
        self.stack: list[_Frame] = []
        top = _Frame("top")
        top.base = base_iri
        self.stack.append(top)
        self.bnode_counter = 0
        self.known_ids: set[str] = set()
        self.p = xml.parsers.expat.ParserCreate(namespace_separator=_SEP)
        # triplet names (uri SEP local SEP prefix): semantic paths strip the
        # prefix at the handler boundary; parseType="Literal" capture keeps
        # it so inner elements re-serialize with their source-form qnames
        self.p.namespace_prefixes = True
        self.p.StartElementHandler = self.start
        self.p.EndElementHandler = self.end
        self.p.CharacterDataHandler = self.chars
        self.p.StartNamespaceDeclHandler = self.ns_decl
        # xmlns declarations expat consumed before the upcoming StartElement;
        # re-emitted on that element when it is inside an XML literal
        self._pending_ns: list[tuple[str | None, str]] = []

    # -- plumbing ---------------------------------------------------------

    def err(self, kind: str, msg: str) -> ParseError:
        return ParseError(kind, msg, self.p.CurrentLineNumber, self.p.CurrentColumnNumber)

    def fresh(self) -> BNode:
        self.bnode_counter += 1
        return BNode("g", str(self.bnode_counter))

    def emit(self, s: Term, p: Term, o: Term) -> None:
        self.out.append((s, p, o))

    @property
    def base(self) -> str | None:
        for f in reversed(self.stack):
            if f.base is not None:
                return f.base
        return None

    @property
    def lang(self) -> str | None:
        for f in reversed(self.stack):
            if f.lang is not None:
                return f.lang
        return None

    def _scoped(self, frame: _Frame, attrs: dict) -> None:
        b = attrs.get(f"{XML_NS}{_SEP}base")
        if b is not None:
            frame.base = resolve_or_validate(b, self.base) if self.base else b
        l = attrs.get(f"{XML_NS}{_SEP}lang")
        if l is not None:
            frame.lang = normalize_langtag(l) if l else ""

    def _resolve(self, ref: str) -> str:
        base = self.base
        if base is None:
            return resolve_or_validate(ref, None)
        return resolve_or_validate(ref, base)

    def _register_id(self, rdf_id: str) -> str:
        iri = self._resolve("#" + rdf_id)
        if iri in self.known_ids:
            raise self.err("DuplicateRdfId", f"duplicate rdf:ID {rdf_id!r}")
        self.known_ids.add(iri)
        return iri

    # -- node elements ------------------------------------------------------

    def _start_node(self, uri: str, frame: _Frame, attrs: dict) -> None:
        if uri in _FORBIDDEN_NODE:
            raise self.err("InvalidNodeElement", f"{uri} cannot be a node element")
        about = attrs.get(f"{RDF_NS}{_SEP}about")
        rdf_id = attrs.get(f"{RDF_NS}{_SEP}ID")
        node_id = attrs.get(f"{RDF_NS}{_SEP}nodeID")
        if sum(x is not None for x in (about, rdf_id, node_id)) > 1:
            raise self.err("InvalidNodeElement", "about/ID/nodeID are mutually exclusive")
        if about is not None:
            subj: Term = "<" + self._resolve(about) + ">"
        elif rdf_id is not None:
            subj = "<" + self._register_id(rdf_id) + ">"
        elif node_id is not None:
            subj = BNode("u", node_id)
        else:
            subj = self.fresh()
        frame.subject = subj
        if uri != f"{RDF_NS}Description":
            self.emit(subj, RDF_TYPE, "<" + uri + ">")
        # property attributes
        for k, v in attrs.items():
            ns, local = _split(k)
            if ns in (None, XML_NS) or k.replace(_SEP, "") == "":
                continue
            full = (ns or "") + local
            if full in _SYNTAX_ATTRS:
                continue
            if full == f"{RDF_NS}type":
                self.emit(subj, RDF_TYPE, "<" + self._resolve(v) + ">")
            else:
                self.emit(subj, full and "<" + full + ">", encode_literal(v, self.lang or None))
        # connect to parent
        parent = self.stack[-2]
        if parent.kind == "prop":
            parent.has_child = True
            if parent.object is not None:
                raise self.err("InvalidPropertyElement", "multiple node children")
            parent.object = subj
        elif parent.kind == "collection":
            parent.items.append(subj)

    # -- property elements ---------------------------------------------------

    def _start_prop(self, uri: str, frame: _Frame, attrs: dict, parent: _Frame) -> None:
        if uri == f"{RDF_NS}li":
            parent.li_counter += 1
            uri = f"{RDF_NS}_{parent.li_counter}"
        if uri in _FORBIDDEN_PROP:
            raise self.err("InvalidPropertyElement", f"{uri} cannot be a property element")
        frame.predicate = "<" + uri + ">"
        rdf_id = attrs.get(f"{RDF_NS}{_SEP}ID")
        if rdf_id is not None:
            frame.reify_id = self._register_id(rdf_id)
        parse_type = attrs.get(f"{RDF_NS}{_SEP}parseType")
        resource = attrs.get(f"{RDF_NS}{_SEP}resource")
        node_id = attrs.get(f"{RDF_NS}{_SEP}nodeID")
        frame.datatype = attrs.get(f"{RDF_NS}{_SEP}datatype")
        prop_attrs = []
        for k, v in attrs.items():
            ns, local = _split(k)
            if ns in (None, XML_NS):
                continue
            full = (ns or "") + local
            if full in _SYNTAX_ATTRS or full == f"{RDF_NS}Description":
                continue
            prop_attrs.append((full, v))
        if parse_type == "Resource":
            obj = self.fresh()
            frame.object = obj
            frame.kind = "node"  # children are property elements of obj
            frame.subject = obj
            self._emit_prop(parent.subject, frame.predicate, obj, frame.reify_id)
            frame.emitted = True
        elif parse_type == "Collection":
            frame.kind = "collection"
        elif parse_type == "Literal":
            frame.kind = "xmlliteral"
            frame.xml_depth = 1
        elif resource is not None or node_id is not None or prop_attrs:
            if resource is not None and node_id is not None:
                raise self.err("InvalidPropertyElement", "resource and nodeID are exclusive")
            if resource is not None:
                obj = "<" + self._resolve(resource) + ">"
            elif node_id is not None:
                obj = BNode("u", node_id)
            else:
                obj = self.fresh()
            frame.object = obj
            for full, v in prop_attrs:
                if full == f"{RDF_NS}type":
                    self.emit(obj, RDF_TYPE, "<" + self._resolve(v) + ">")
                else:
                    self.emit(obj, "<" + full + ">", encode_literal(v, self.lang or None))
        # else: object comes from text content or a nested node element

    def _emit_prop(self, s: Term, p: str, o: Term, reify: str | None) -> None:
        self.emit(s, p, o)
        if reify:
            st = "<" + reify + ">"
            self.emit(st, RDF_TYPE, f"<{RDF_NS}Statement>")
            self.emit(st, f"<{RDF_NS}subject>", s)
            self.emit(st, f"<{RDF_NS}predicate>", p)
            self.emit(st, f"<{RDF_NS}object>", o)

    # -- expat handlers -----------------------------------------------------

    def ns_decl(self, prefix: str | None, uri: str | None) -> None:
        self._pending_ns.append((prefix, uri or ""))

    def start(self, name: str, attrs: dict) -> None:
        if len(self.stack) > MAX_STACK_SIZE:
            raise self.err("StackOverflow", f"nesting deeper than {MAX_STACK_SIZE}")
        top = self.stack[-1]
        if top.kind == "xmlliteral":
            # source-faithful capture (mirrors the reference's event rewrite,
            # xml/src/parser.rs:288-300): prefixed qnames as written, xmlns
            # declarations re-emitted where declared, attribute values
            # escaped. Remaining (documented) canonical-form liberties:
            # empty elements expand to <a></a> and comments are dropped —
            # both exactly what XML c14n prescribes for rdf:XMLLiteral.
            top.xml_depth += 1
            decls = "".join(
                f' xmlns:{p}="{_esc_attr(u)}"' if p else f' xmlns="{_esc_attr(u)}"'
                for p, u in self._pending_ns
            )
            self._pending_ns.clear()
            attr_s = "".join(
                f' {_qname(k)}="{_esc_attr(v)}"' for k, v in attrs.items()
            )
            top.xml_parts.append(f"<{_qname(name)}{decls}{attr_s}>")
            return
        self._pending_ns.clear()
        name = _strip_prefix(name)
        attrs = {_strip_prefix(k): v for k, v in attrs.items()}
        ns, local = _split(name)
        uri = (ns or "") + local
        frame = _Frame("?")
        self._scoped(frame, attrs)
        self.stack.append(frame)
        parent = self.stack[-2]
        if parent.kind == "top":
            if uri == f"{RDF_NS}RDF":
                frame.kind = "rdf"
            else:
                frame.kind = "node"
                self._start_node(uri, frame, attrs)
        elif parent.kind in ("rdf", "collection"):
            frame.kind = "node"
            self._start_node(uri, frame, attrs)
        elif parent.kind == "node":
            frame.kind = "prop"
            self._start_prop(uri, frame, attrs, parent)
        elif parent.kind == "prop":
            if parent.text and "".join(parent.text).strip():
                raise self.err("InvalidPropertyElement", "mixed text and element content")
            parent.text = []
            frame.kind = "node"
            self._start_node(uri, frame, attrs)
        else:
            raise self.err("UnexpectedElement", f"unexpected element {uri}")

    def chars(self, data: str) -> None:
        top = self.stack[-1]
        if top.kind == "xmlliteral":
            top.xml_parts.append(
                data.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            )
        elif top.kind == "prop":
            top.text.append(data)
        elif top.kind in ("node", "rdf", "top", "collection"):
            if data.strip():
                raise self.err("UnexpectedText", f"unexpected text {data.strip()[:20]!r}")

    def end(self, name: str) -> None:
        top = self.stack[-1]
        if top.kind == "xmlliteral":
            if top.xml_depth > 1:
                # closing an inner element of the XML literal — keep capturing
                top.xml_parts.append(f"</{_qname(name)}>")
                top.xml_depth -= 1
                return
            # the property element itself closes
            self.stack.pop()
            parent = self.stack[-1]
            lit = encode_literal("".join(top.xml_parts), None, XML_LITERAL)
            self._emit_prop(parent.subject, top.predicate, lit, top.reify_id)
            return
        frame = self.stack.pop()
        if frame.kind == "prop":
            parent = self.stack[-1]
            if frame.emitted:
                return
            if frame.object is not None:
                obj: Term = frame.object
                text = "".join(frame.text)
                if text.strip():
                    raise self.err("InvalidPropertyElement", "mixed content")
            elif frame.has_child:
                raise self.err("InvalidPropertyElement", "missing object")
            else:
                value = "".join(frame.text)
                if frame.datatype is not None:
                    obj = encode_literal(value, None, frame.datatype)
                else:
                    obj = encode_literal(value, self._lang_for(frame))
            self._emit_prop(parent.subject, frame.predicate, obj, frame.reify_id)
        elif frame.kind == "collection":
            parent = self.stack[-1]
            head: Term = RDF_NIL
            prev: BNode | None = None
            for item in frame.items:
                cell = self.fresh()
                if prev is None:
                    head = cell
                else:
                    self.emit(prev, RDF_REST, cell)
                self.emit(cell, RDF_FIRST, item)
                prev = cell
            if prev is not None:
                self.emit(prev, RDF_REST, RDF_NIL)
            self._emit_prop(parent.subject, frame.predicate, head, frame.reify_id)

    def _lang_for(self, frame: _Frame) -> str | None:
        if frame.lang is not None:
            return frame.lang or None
        for f in reversed(self.stack):
            if f.lang is not None:
                return f.lang or None
        return None

    def run(self, text: str) -> tuple[list[tuple], list[dict]]:
        errors: list[dict] = []
        try:
            self.p.Parse(text, True)
        except ParseError as e:
            errors.append(e.as_row())
        except xml.parsers.expat.ExpatError as e:
            errors.append(
                ParseError("XmlError", str(e), getattr(e, "lineno", 0),
                           getattr(e, "offset", 0)).as_row()
            )
        return self.out, errors


def parse_rdfxml(text: str, base_iri: str | None = None) -> tuple[list[tuple], list[dict]]:
    """S5: RDF/XML document -> ([(s, p, o)], [error rows])."""
    return _RdfXmlParser(base_iri).run(text)
