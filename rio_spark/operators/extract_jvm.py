"""JVM fast-line pre-pass for N-Triples / N-Quads extraction.

At 100 TB the bulk RDF interchange format is line-oriented N-Triples /
N-Quads (the big public dumps ship as NT), and the overwhelming majority of
dump lines are "fast" lines: plain absolute IRIs and simple literals with no
escape sequences — exactly the shape of the Python kernel's ``_FAST_LINE``
(kernels/ntriples.py:33; the reference's analogous trick is its ASCII fast
path, shared.rs:69-73).  This module parses those lines entirely inside
whole-stage codegen, so they never cross the Python boundary at all: no
Arrow transfer, no Python string allocation — the two measured scaling
bottlenecks at high core counts (BENCH/BASELINE.md).

**Measured outcome (2026-08-16, 32-core Xeon, local[8], 4M-line NT corpus):
422k triples/s via this pre-pass vs 1.12M via the Python kernel — the
pre-pass is OFF by default** (``extract_triples(jvm_fast=False)``).  The
bottleneck is ``java.util.regex`` itself: the strict line pattern costs
~7 core-us per 60-byte line (possessive quantifiers, non-capturing groups,
and dropping the folded BCP-47 alternation all measured within noise of
each other, so it is per-char NFA interpretation, not backtracking or
compilation), while CPython's sre runs the equivalent pattern ~3x faster
per core and the kernel amortizes further with per-document term
memoization.  The plan shape below is still the one you'd want wherever
line matching is cheap relative to moving bytes to Python — e.g. real
multi-node clusters where Python workers compete with the executor for
memory bandwidth, or if Spark ever grows a code-generated regex — so the
operator stays, differential-tested, behind the flag.

The fast branch is shuffle-free::

    docs -> posexplode(lines) -> filter(rlike STRICT) -> project terms

Everything that makes a line "fast" — shape, *absolute* IRIs, *valid*
BCP-47 language tag — is folded into ONE strict Java regex, so acceptance
is a single ``rlike`` and extraction is a single ``regexp_replace`` that
rewrites the line into a ``\\x01``-delimited group string (one ``split``
recovers all capture groups).  Folding matters twice over: FilterExec has
no cross-conjunct subexpression elimination, so a naive
``filter(matched & probe(a) & probe(b) & ...)`` re-runs the regex once per
conjunct (measured 6x slower than the Python kernel), and higher-order
let-bindings are interpreted, not codegen'd.  The extraction keeps the
split array in its own projection (referenced many times, so
CollapseProject cannot inline it) and every term is assembled from plain
array accesses.

Slow lines — anything the strict regex rejects — are reassembled per
document into sparse pseudo-documents: blank-line padding restores original
line numbers for positioned error rows (F1), and grouping by document
preserves blank-node first-occurrence order (G22).  Only those lines are
shuffled (the groupBy); for a real dump that is a trickle.  The
reconstructed documents take the unchanged Python kernel path, so fast/slow
routing can never change a parse result, only where it runs.

Semantic mirror of kernels/ntriples.py, line for line:

* one trailing ``\\r`` stripped; blank / ``#``-comment lines skipped
* any line containing a backslash (escape sequences) -> Python slow path
* scheme requirement folded into every IRI group (relative IRI -> Python ->
  positioned error row)
* BCP-47 language-tag validation folded in as a case-insensitive group
  built from the same source regex as the kernel (G5); emission lowercases
* TAB -> ``\\t`` is the only canonical-literal escape reachable without a
  backslash in the source line (model.py ``_LITERAL_ESCAPES``)
* lines containing ``\\x01`` (the group delimiter) are routed slow, so the
  delimiter can never be confused with content
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rio_spark.kernels.shared import _BCP47_IRREGULAR, _BCP47_RE

_SEP = "\x01"
# IRI character set of the kernel's fast line (no space/control/bad chars),
# with the RFC-3986 scheme requirement folded in front: matching this group
# IS the kernel's "fast shape + absolute-IRI probe" conjunction.
_IRI = r"[A-Za-z][A-Za-z0-9+.\-]*:" + r'[^<>"{}|^`\\\x00-\x20]*'
# BCP-47 language tag, case-insensitive (the kernel lowercases then
# validates; (?i:) over the same lowercase source regex is equivalent
# because every class is a letter range), plus the registered irregular
# grandfathered tags.  Reusing the kernel's regex source means the two
# paths can never drift.
_BCP47_BODY = _BCP47_RE.pattern[1:-1]  # strip ^ $
_LANG = "(?i:" + _BCP47_BODY + "|" + "|".join(sorted(_BCP47_IRREGULAR)) + ")"


def _strict_pattern(quads: bool) -> str:
    """One regex that accepts a line iff the Python kernel's fast path would
    emit a triple for it (kernels/ntriples.py:184-215): shape, absolute
    IRIs, and language-tag validity all folded in.

    Group numbering (a non-match leaves the group empty after the rewrite):
    1=subject 2=predicate 3=object-IRI 4=literal 5=langtag 6=datatype
    [7=graph].  Every IRI group starts with a scheme so it can never match
    empty — '' therefore unambiguously means "the other alternative
    matched" (object) or "absent" (datatype, graph).  An empty ``<>`` term
    fails this pattern and takes the slow path, where the Python fast path
    would have matched it, failed the scheme probe, and taken the slow path
    anyway: same destination.
    """
    core = (
        r"^[ \t]*<(" + _IRI + r")>"
        r"[ \t]+<(" + _IRI + r")>"
        r"[ \t]+(?:"
        r"<(" + _IRI + r")>"
        r'|"([^"\\\n\r]*)"(?:@(' + _LANG + r")|\^\^<(" + _IRI + r")>)?"
        r")"
    )
    if quads:
        core += r"(?:[ \t]+<(" + _IRI + r")>)?"
    return core + r"[ \t]*\.[ \t]*(?:#.*)?$"


_PAT_NT = _strict_pattern(quads=False)
_PAT_NQ = _strict_pattern(quads=True)
_REPL_NT = _SEP.join(["", "$1", "$2", "$3", "$4", "$5", "$6"])
_REPL_NQ = _SEP.join(["", "$1", "$2", "$3", "$4", "$5", "$6", "$7"])


def _lines(docs: DataFrame, fmt_expr: Column, id_col: str, text_col: str) -> DataFrame:
    """(doc, pos, line) for NT/NQ documents: split, strip one trailing \\r."""
    exploded = docs.select(
        F.col(id_col).cast("string").alias("__doc"),
        fmt_expr.alias("__fmt"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__raw"),
    )
    line = F.when(
        F.col("__raw").endswith("\r"),
        F.expr("substring(__raw, 1, length(__raw) - 1)"),
    ).otherwise(F.col("__raw"))
    return exploded.select("__doc", "__fmt", "__pos", line.alias("__l"))


def _is_fast(quads_expr: Column) -> Column:
    """Single-rlike fast-line acceptance (plus the delimiter/escape guards)."""
    l = F.col("__l")
    pat = F.when(quads_expr, l.rlike(_PAT_NQ)).otherwise(l.rlike(_PAT_NT))
    return ~l.contains("\\") & ~l.contains(_SEP) & pat


def _is_blank(col: Column) -> Column:
    stripped = F.expr("trim(LEADING ' \t' FROM __l)")
    return (stripped == "") | stripped.startswith("#")


def fast_triples(lines: DataFrame, quads_expr: Column) -> DataFrame:
    """Fast lines -> EXTRACT_SCHEMA rows, entirely in whole-stage codegen.

    ONE regexp_replace rewrites the matched line into a \\x01-delimited
    group string; the split array lives in its own projection (referenced
    once per term, so CollapseProject keeps it materialized) and the terms
    are plain array accesses + concats.
    """
    rewritten = F.when(
        quads_expr, F.regexp_replace("__l", _PAT_NQ, _REPL_NQ)
    ).otherwise(F.regexp_replace("__l", _PAT_NT, _REPL_NT))

    with_groups = lines.filter(_is_fast(quads_expr)).select(
        "__doc",
        quads_expr.alias("__nq"),
        F.split(rewritten, _SEP).alias("__g"),
    )

    g = F.col("__g")
    sub, pred, obj = F.get(g, 1), F.get(g, 2), F.get(g, 3)
    lit, lang, dt = F.get(g, 4), F.get(g, 5), F.get(g, 6)
    graph = F.when(F.col("__nq"), F.get(g, 7)).otherwise(F.lit(""))

    object_term = F.when(obj != "", F.concat(F.lit("<"), obj, F.lit(">"))).otherwise(
        F.concat(
            F.lit('"'),
            F.replace(lit, F.lit("\t"), F.lit("\\t")),
            F.lit('"'),
            F.when(lang != "", F.concat(F.lit("@"), F.lower(lang)))
            .when(dt != "", F.concat(F.lit("^^<"), dt, F.lit(">")))
            .otherwise(F.lit("")),
        )
    )
    return with_groups.select(
        F.col("__doc").alias("doc_id"),
        F.concat(F.lit("<"), sub, F.lit(">")).alias("subject"),
        F.concat(F.lit("<"), pred, F.lit(">")).alias("predicate"),
        object_term.alias("object"),
        F.when(graph != "", F.concat(F.lit("<"), graph, F.lit(">"))).alias("graph"),
        F.lit(None).cast("string").alias("error_kind"),
        F.lit(None).cast("int").alias("error_line"),
        F.lit(None).cast("int").alias("error_byte"),
        F.lit(None).cast("string").alias("error_msg"),
    )


def slow_residue(
    lines: DataFrame,
    quads_expr: Column,
    id_col: str,
    text_col: str,
    format_col: str,
    base_expr: Column,
) -> DataFrame:
    """Lines the strict regex rejects -> sparse pseudo-documents
    (id_col, format_col, base_col-as-named-by-caller, text_col) for the
    Python kernel.  Blank-line padding restores 1-based line numbers so
    positioned error rows match the whole-document parse exactly; grouping
    by document preserves blank-node first-occurrence order.  Only these
    lines shuffle."""
    slow = lines.filter(~(_is_blank(F.col("__l")) | _is_fast(quads_expr)))
    return (
        slow.groupBy("__doc")
        .agg(
            F.first("__fmt").alias(format_col),
            F.first(base_expr).alias("__base"),
            F.aggregate(
                F.sort_array(
                    F.collect_list(F.struct(F.col("__pos").alias("p"), F.col("__l").alias("t")))
                ),
                F.struct(F.lit(0).alias("nxt"), F.lit("").alias("txt")),
                lambda acc, x: F.struct(
                    (x["p"] + F.lit(1)).alias("nxt"),
                    F.when(
                        (acc["txt"] == "") & (acc["nxt"] == 0),
                        F.concat(F.repeat(F.lit("\n"), x["p"]), x["t"]),
                    )
                    .otherwise(
                        F.concat(
                            acc["txt"],
                            F.repeat(F.lit("\n"), x["p"] - acc["nxt"] + 1),
                            x["t"],
                        )
                    )
                    .alias("txt"),
                ),
                lambda acc: acc["txt"],
            ).alias(text_col),
        )
        .withColumnRenamed("__doc", id_col)
    )


def nt_line_split(
    docs: DataFrame,
    fmt: str | None,
    id_col: str,
    text_col: str,
    format_col: str,
    base_col: str,
) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """Split documents into (fast_triples, slow_nt_docs, other_docs).

    ``fast_triples`` already has EXTRACT_SCHEMA (operators/extract.py):
    every strict fast line, parsed JVM-side with no shuffle.
    ``slow_nt_docs`` are reconstructed sparse NT/NQ documents holding
    everything the strict regex rejected — feed to the Python kernel path.
    ``other_docs`` (mixed-format frames only, else None) are the non-NT/NQ
    documents, untouched — feed to the Python kernel path directly, no
    explode/reassembly detour.
    """
    cols = set(docs.columns)
    has_format = fmt is None and format_col in cols

    if has_format:
        nt_docs = docs.filter(F.col(format_col).isin("nt", "nq"))
        other = docs.filter(~F.col(format_col).isin("nt", "nq") | F.col(format_col).isNull())
        fmt_expr = F.col(format_col)
    else:
        nt_docs, other = docs, None
        fmt_expr = F.lit(fmt)

    # carried through the explode inside a first() aggregate (constant per doc)
    if base_col in cols:
        nt_docs = nt_docs.withColumn("__base_in", F.col(base_col).cast("string"))
    else:
        nt_docs = nt_docs.withColumn("__base_in", F.lit(None).cast("string"))

    lines = nt_docs.select(
        F.col(id_col).cast("string").alias("__doc"),
        fmt_expr.alias("__fmt"),
        F.col("__base_in"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__raw"),
    )
    line = F.when(
        F.col("__raw").endswith("\r"),
        F.expr("substring(__raw, 1, length(__raw) - 1)"),
    ).otherwise(F.col("__raw"))
    lines = lines.select("__doc", "__fmt", "__base_in", "__pos", line.alias("__l")).filter(
        ~_is_blank(F.col("__l"))
    )

    quads = F.col("__fmt") == "nq"
    fast = fast_triples(lines, quads)
    slow_docs = slow_residue(lines, quads, id_col, text_col, format_col, F.col("__base_in"))
    slow_docs = slow_docs.withColumnRenamed("__base", base_col)
    return fast, slow_docs, other
