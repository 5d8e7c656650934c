"""Formatters (sinks): canonical triple columns -> serialized RDF text.

Spark re-expression of SURVEY.md §2.2:

* K1 N-Triples  — one ``concat_ws`` per row; the term columns are already
  canonical N-Triples strings (escaping happened once at extraction), so the
  formatter is a pure column expression with no UDF.
* K2 N-Quads    — same plus the optional graph term.
* K3 Turtle     — same-subject (``;``) / same-predicate (``,``) grouping via
  two groupBys with sorted ``collect_list`` — the stateful consecutive-
  grouping of the reference becomes order-insensitive grouping, which is the
  natural (and parallel) Spark form and round-trips to the same graph.

Round-trip property (reference turtle/tests/roundtrip.rs): parse(format(G))
is isomorphic to G — pinned in tests/test_formatters.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def format_ntriples(triples: DataFrame) -> DataFrame:
    """-> one `line` column of N-Triples statements."""
    return triples.select(
        F.concat_ws(" ", "subject", "predicate", "object", F.lit(".")).alias("line")
    )


def format_nquads(quads: DataFrame) -> DataFrame:
    return quads.select(
        F.when(
            F.col("graph").isNull(),
            F.concat_ws(" ", "subject", "predicate", "object", F.lit(".")),
        )
        .otherwise(
            F.concat_ws(" ", "subject", "predicate", "object", "graph", F.lit("."))
        )
        .alias("line")
    )


def format_turtle(triples: DataFrame) -> DataFrame:
    """-> one `block` column per subject:
    ``s p1 o1 , o2 ;\\n  p2 o3 .`` — deterministic (sorted) order."""
    po = (
        triples.groupBy("subject", "predicate")
        .agg(F.array_sort(F.collect_set("object")).alias("objects"))
        .select(
            "subject",
            "predicate",
            F.concat(F.col("predicate"), F.lit(" "), F.array_join("objects", " , ")).alias("po"),
        )
    )
    return (
        po.groupBy("subject")
        .agg(F.array_sort(F.collect_list("po")).alias("pos"))
        .select(
            F.concat(
                F.col("subject"), F.lit(" "), F.array_join("pos", " ;\n  "), F.lit(" .")
            ).alias("block")
        )
    )


def qualify_iris(triples: DataFrame, prefixes: dict[str, str]) -> DataFrame:
    """Compress IRI terms to prefixed names where a declared namespace matches
    and the remainder is a clean local name (serd's `qualify` behavior; cf.
    serd-tests qualify-in/out). Pure column ops: longest namespace first,
    local part gated by a PN_LOCAL-safe regex; non-matching IRIs stay
    bracketed. Combine with :func:`format_turtle` + prefix header lines."""
    # longest namespaces first so e.g. <http://e/ns#> wins over <http://e/>
    ordered = sorted(prefixes.items(), key=lambda kv: -len(kv[1]))
    # A trailing '.' in the local part would be re-lexed as the statement
    # terminator on reparse (Turtle dot-backoff), so such IRIs stay bracketed.
    local_ok = r"^(?:[A-Za-z_][A-Za-z0-9_.\-]*[A-Za-z0-9_\-]|[A-Za-z_])?$"

    def compress(col):
        out = None
        for name, ns in ordered:
            local = col.substr(F.lit(len(ns) + 2), F.length(col))
            local = local.substr(F.lit(1), F.length(local) - 1)  # drop trailing '>'
            cond = col.startswith("<" + ns) & col.endswith(">") & local.rlike(local_ok)
            val = F.concat(F.lit(name + ":"), local)
            out = F.when(cond, val) if out is None else out.when(cond, val)
        return out.otherwise(col) if out is not None else col

    return triples.select(
        *[
            compress(F.col(c)).alias(c) if c in ("subject", "predicate", "object") else F.col(c)
            for c in triples.columns
        ]
    )


def turtle_prefix_header(prefixes: dict[str, str]) -> str:
    return "\n".join(f"@prefix {k}: <{v}> ." for k, v in sorted(prefixes.items()))


def _xml_unescape_literal(col):
    """Decode our canonical-literal escapes, then XML-escape. Pure column ops."""
    c = F.replace(col, F.lit("\\\\"), F.lit("\x00"))
    c = F.replace(c, F.lit("\\n"), F.lit("\n"))
    c = F.replace(c, F.lit("\\r"), F.lit("\r"))
    c = F.replace(c, F.lit("\\t"), F.lit("\t"))
    c = F.replace(c, F.lit('\\"'), F.lit('"'))
    c = F.replace(c, F.lit("\x00"), F.lit("\\"))
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    return c


def format_rdfxml(triples: DataFrame) -> DataFrame:
    """K5: rdf:Description blocks grouped by subject (pure column ops).

    Each property element declares its own namespace inline
    (``<n:local xmlns:n="ns">``), sidestepping document-level prefix
    management — valid XML, one block column per subject. Wrap the collected
    blocks in ``<rdf:RDF xmlns:rdf="...">…</rdf:RDF>`` to form a document
    (see tests). Predicates whose IRI has no NCName-splittable local part
    are not representable in RDF/XML (same restriction as the reference)."""
    lit_re = r'^"(.*)"(?:@([a-z0-9-]+)|\^\^<(.*)>)?$'
    pred_ns = F.regexp_extract("predicate", r"^<(.*[#/])([A-Za-z_][A-Za-z0-9_.-]*)>$", 1)
    pred_local = F.regexp_extract("predicate", r"^<(.*[#/])([A-Za-z_][A-Za-z0-9_.-]*)>$", 2)
    obj = F.col("object")
    lit_value = _xml_unescape_literal(F.regexp_extract(obj, lit_re, 1))
    lit_lang = F.regexp_extract(obj, lit_re, 2)
    lit_dt = F.regexp_extract(obj, lit_re, 3)
    open_tag = F.concat(F.lit("<n:"), pred_local, F.lit(' xmlns:n="'), pred_ns, F.lit('"'))
    iri_attr = F.replace(obj.substr(F.lit(2), F.length(obj) - 2), F.lit("&"), F.lit("&amp;"))
    prop = F.when(
        obj.startswith("<"),
        F.concat(open_tag, F.lit(' rdf:resource="'), iri_attr, F.lit('"/>')),
    ).when(
        obj.startswith("_:"),
        F.concat(open_tag, F.lit(' rdf:nodeID="'), F.substring(obj, 3, 1 << 20), F.lit('"/>')),
    ).otherwise(
        F.concat(
            open_tag,
            F.when(lit_lang != "", F.concat(F.lit(' xml:lang="'), lit_lang, F.lit('"')))
            .otherwise(F.lit("")),
            F.when(
                lit_dt != "",
                F.concat(
                    F.lit(' rdf:datatype="'),
                    F.replace(lit_dt, F.lit("&"), F.lit("&amp;")),
                    F.lit('"'),
                ),
            )
            .otherwise(F.lit("")),
            F.lit(">"), lit_value, F.lit("</n:"), pred_local, F.lit(">"),
        )
    )
    subj_attr = F.when(
        F.col("subject").startswith("_:"),
        F.concat(F.lit(' rdf:nodeID="'), F.substring("subject", 3, 1 << 20), F.lit('"')),
    ).otherwise(
        F.concat(
            F.lit(' rdf:about="'),
            F.replace(
                F.col("subject").substr(F.lit(2), F.length("subject") - 2),
                F.lit("&"),
                F.lit("&amp;"),
            ),
            F.lit('"'),
        )
    )
    return (
        triples.select("subject", prop.alias("prop"), subj_attr.alias("sa"))
        .groupBy("subject", "sa")
        .agg(F.array_sort(F.collect_list("prop")).alias("props"))
        .select(
            F.concat(
                F.lit("<rdf:Description"), F.col("sa"), F.lit(">\n  "),
                F.array_join("props", "\n  "),
                F.lit("\n</rdf:Description>"),
            ).alias("block")
        )
    )


def format_trig(quads: DataFrame) -> DataFrame:
    """Graph-level grouping: ``g { <turtle blocks> }``; default graph bare."""
    po = (
        quads.groupBy("graph", "subject", "predicate")
        .agg(F.array_sort(F.collect_set("object")).alias("objects"))
        .select(
            "graph",
            "subject",
            F.concat(F.col("predicate"), F.lit(" "), F.array_join("objects", " , ")).alias("po"),
        )
    )
    blocks = (
        po.groupBy("graph", "subject")
        .agg(F.array_sort(F.collect_list("po")).alias("pos"))
        .select(
            "graph",
            F.concat(
                F.col("subject"), F.lit(" "), F.array_join("pos", " ;\n  "), F.lit(" .")
            ).alias("block"),
        )
    )
    return (
        blocks.groupBy("graph")
        .agg(F.array_sort(F.collect_list("block")).alias("blocks"))
        .select(
            F.when(
                F.col("graph").isNull(), F.array_join("blocks", "\n")
            )
            .otherwise(
                F.concat(
                    F.col("graph"), F.lit(" {\n"), F.array_join("blocks", "\n"), F.lit("\n}")
                )
            )
            .alias("block")
        )
    )
