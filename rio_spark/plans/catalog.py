"""Query catalog: every operator exposed as (spark, sf_dir) -> DataFrame with
a matching DuckDB oracle SQL string (driver correctness gate).

Conventions that make the side-by-side hash comparison meaningful:

* deterministic only — no RNG, no time, no partition-order dependence;
* md5 (not xxhash64) wherever a hash feeds the result, because md5 is
  bit-identical across Spark and DuckDB;
* floats are rounded in BOTH engines before comparison;
* every computed column is aliased identically in both;
* KG queries synthesize a transcripts table from ``documents.parquet`` with
  column ops that DuckDB can replicate, then run the REAL pipeline
  (salted assembly -> mapInPandas grammar kernels -> joins) on the Spark
  side while the oracle computes the expected output directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from rio_spark.operators.assemble import assemble_documents_salted
from rio_spark.operators.canonicalize import connected_components
from rio_spark.operators.dedup import (
    dedup_exact,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_bits,
)
from rio_spark.operators.extract import errors_of, extract_triples, triples_of
from rio_spark.operators.sessions import ntz_epoch, session_stats
from rio_spark.operators.similarity import cosine_pairs_above, lsh_bucket_ids
from rio_spark.operators.text import (
    LANG_PROFILES,
    EN_STOPWORDS,
    fingerprint,
    language_id,
    quality_score,
    token_stats,
)
from rio_spark.formatters import format_ntriples

DOC_NS = "http://ex.org/doc/"
P_NS = "http://ex.org/p/"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# KG pipeline queries (documents -> synthesized transcripts -> kernels)
# ---------------------------------------------------------------------------

def _nt_lines(with_error: bool = False):
    """Three N-Triples lines per document as column expressions."""
    doc_iri = F.concat(F.lit(f"<{DOC_NS}"), F.col("doc_id").cast("string"), F.lit(">"))
    l_source = F.concat(doc_iri, F.lit(f" <{P_NS}source> \""), F.col("source"), F.lit('" .'))
    l_lang = F.concat(doc_iri, F.lit(f" <{P_NS}lang> \""), F.col("lang"), F.lit('" .'))
    if with_error:
        l_lang = F.when(
            F.col("doc_id") % 7 == 3,
            F.concat(doc_iri, F.lit(f" <{P_NS}bad> <oops .")),  # unterminated IRI
        ).otherwise(l_lang)
    l_chars = F.concat(
        doc_iri,
        F.lit(f" <{P_NS}nchars> \""),
        F.col("n_chars").cast("string"),
        F.lit(f'"^^<{XSD_INT}> .'),
    )
    return [l_source, l_lang, l_chars]


def _nt_transcripts(spark, sf_dir, with_error: bool = False) -> DataFrame:
    """documents -> (conv_id, turn_idx, text): one NT line per turn, emitted
    in REVERSE turn order so assembly provably restores ordering."""
    docs = _documents(spark, sf_dir)
    lines = _nt_lines(with_error)
    return docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.posexplode(F.array(*reversed(lines))).alias("rev_idx", "text"),
    ).select(
        "conv_id", (F.lit(len(lines) - 1) - F.col("rev_idx")).alias("turn_idx"), "text"
    )


def q_kg_extract_nt(spark, sf_dir) -> DataFrame:
    """Full path: synthesized turns -> salted assembly -> NT kernel."""
    docs = assemble_documents_salted(_nt_transcripts(spark, sf_dir))
    ext = extract_triples(docs, fmt="nt")
    return triples_of(ext).select("doc_id", "subject", "predicate", "object")


ORACLE_KG_EXTRACT_NT = f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       '<{DOC_NS}' || doc_id || '>' AS subject,
       '<{P_NS}source>' AS predicate,
       '"' || source || '"' AS object
FROM documents
UNION ALL
SELECT CAST(doc_id AS VARCHAR), '<{DOC_NS}' || doc_id || '>', '<{P_NS}lang>',
       '"' || lang || '"'
FROM documents
UNION ALL
SELECT CAST(doc_id AS VARCHAR), '<{DOC_NS}' || doc_id || '>', '<{P_NS}nchars>',
       '"' || n_chars || '"^^<{XSD_INT}>'
FROM documents
"""


def q_kg_extract_turtle(spark, sf_dir) -> DataFrame:
    """Turtle path: prefixes + predicate-object list sugar + typed literal."""
    docs = _documents(spark, sf_dir)
    body = F.concat(
        F.lit(f"@prefix d: <{DOC_NS}> .\n@prefix p: <{P_NS}> .\n"),
        F.lit("d:"), F.col("doc_id").cast("string"),
        F.lit(' p:lang "'), F.col("lang"),
        F.lit('" ; p:nchars '), F.col("n_chars").cast("string"),
        F.lit(" ."),
    )
    d = docs.select(F.col("doc_id").cast("string").alias("conv_id"), body.alias("text"))
    ext = extract_triples(d, fmt="ttl")
    return triples_of(ext).select("doc_id", "subject", "predicate", "object")


ORACLE_KG_EXTRACT_TURTLE = f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       '<{DOC_NS}' || doc_id || '>' AS subject,
       '<{P_NS}lang>' AS predicate,
       '"' || lang || '"' AS object
FROM documents
UNION ALL
SELECT CAST(doc_id AS VARCHAR), '<{DOC_NS}' || doc_id || '>', '<{P_NS}nchars>',
       '"' || n_chars || '"^^<{XSD_INT}>'
FROM documents
"""


def q_kg_extract_rdfxml(spark, sf_dir) -> DataFrame:
    """RDF/XML path (S5): typed literal + property element through the SAX
    state-machine kernel."""
    docs = _documents(spark, sf_dir)
    body = F.concat(
        F.lit('<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
              f' xmlns:p="{P_NS}">'),
        F.lit(f'<rdf:Description rdf:about="{DOC_NS}'), F.col("doc_id").cast("string"),
        F.lit('"><p:lang>'), F.col("lang"),
        F.lit(f'</p:lang><p:nchars rdf:datatype="{XSD_INT}">'),
        F.col("n_chars").cast("string"),
        F.lit("</p:nchars></rdf:Description></rdf:RDF>"),
    )
    d = docs.select(F.col("doc_id").cast("string").alias("conv_id"), body.alias("text"))
    ext = extract_triples(d, fmt="rdf")
    return triples_of(ext).select("doc_id", "subject", "predicate", "object")


ORACLE_KG_EXTRACT_RDFXML = ORACLE_KG_EXTRACT_TURTLE  # same expected triples


def q_kg_predicate_counts(spark, sf_dir) -> DataFrame:
    t = q_kg_extract_nt(spark, sf_dir)
    return t.groupBy("predicate").agg(F.count("*").alias("n")).orderBy("predicate")


ORACLE_KG_PREDICATE_COUNTS = f"""
SELECT p AS predicate, (SELECT COUNT(*) FROM documents) AS n
FROM (VALUES ('<{P_NS}source>'), ('<{P_NS}lang>'), ('<{P_NS}nchars>')) t(p)
ORDER BY p
"""


def q_kg_error_recovery(spark, sf_dir) -> DataFrame:
    """Per-line recovery: corrupt docs yield 2 triples + 1 positioned error."""
    docs = assemble_documents_salted(_nt_transcripts(spark, sf_dir, with_error=True))
    ext = extract_triples(docs, fmt="nt").cache()
    t = triples_of(ext).groupBy("doc_id").agg(F.count("*").alias("n_triples"))
    e = errors_of(ext).groupBy("doc_id").agg(F.count("*").alias("n_errors"))
    return (
        t.join(e, "doc_id", "left")
        .select(
            "doc_id",
            "n_triples",
            F.coalesce("n_errors", F.lit(0)).alias("n_errors"),
        )
    )


ORACLE_KG_ERROR_RECOVERY = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(CASE WHEN doc_id % 7 = 3 THEN 2 ELSE 3 END AS BIGINT) AS n_triples,
       CAST(CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END AS BIGINT) AS n_errors
FROM documents
"""


def q_kg_assembly(spark, sf_dir) -> DataFrame:
    """Salted two-phase assembly restores (conv_id, turn_idx) order over
    shuffled fixed-width chunks of the document text."""
    docs = _documents(spark, sf_dir)
    chunks = [F.substring("text", 1 + 100 * i, 100) for i in range(3)]
    turns = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.posexplode(F.array(*reversed(chunks))).alias("rev_idx", "text"),
    ).select("conv_id", (F.lit(2) - F.col("rev_idx")).alias("turn_idx"), "text")
    return assemble_documents_salted(turns, chunk=2).select(
        F.col("conv_id").alias("doc_id"), F.col("text").alias("assembled")
    )


ORACLE_KG_ASSEMBLY = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       substr(text, 1, 100) || chr(10) || substr(text, 101, 100) || chr(10)
         || substr(text, 201, 100) AS assembled
FROM documents
"""


def q_kg_connected_components(spark, sf_dir) -> DataFrame:
    """Alias-merge style CC over a deterministic star+bridge graph on
    customer keys; component = min node."""
    c = _read(spark, sf_dir, "customer")
    base = (F.col("c_custkey") - F.col("c_custkey") % 10).alias("dst")
    e1 = c.select(F.col("c_custkey").alias("src"), base)
    e2 = (
        c.filter(F.col("c_custkey") % 20 >= 10)
        .select(
            (F.col("c_custkey") - F.col("c_custkey") % 10).alias("src"),
            (F.col("c_custkey") - F.col("c_custkey") % 10 - 10).alias("dst"),
        )
    )
    return connected_components(e1.unionByName(e2)).select("node", "component")


ORACLE_KG_CONNECTED_COMPONENTS = """
WITH e AS (
  SELECT c_custkey AS u, c_custkey - c_custkey % 10 AS v FROM customer
  UNION
  SELECT c_custkey - c_custkey % 10, c_custkey - c_custkey % 10 - 10
  FROM customer WHERE c_custkey % 20 >= 10
), nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e)
SELECT node, node - node % 20 AS component FROM nodes
"""

# entity linking: dictionary phrases drawn from the documents vocabulary
LINK_DICT = [
    # (mention_key, candidate_iri, prior)
    ("table scan", "http://kg.example/op/table_scan", 0.9),
    ("table scan", "http://kg.example/op/table_scan_alt", 0.4),
    ("hash join", "http://kg.example/op/hash_join", 0.9),
    ("sort merge", "http://kg.example/op/sort_merge", 0.8),
    ("window", "http://kg.example/op/window", 0.7),
    ("window", "http://kg.example/op/window_fn", 0.3),
    ("filter", "http://kg.example/op/filter", 0.7),
]


def q_kg_entity_linking(spark, sf_dir) -> DataFrame:
    """Broadcast-dictionary linking with prior-based resolution, checkable:
    mention = token-boundary containment on normalized text."""
    from rio_spark.operators.dedup import normalize_text

    docs = _documents(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit(" "), normalize_text(F.col("text")), F.lit(" ")).alias("padded"),
    )
    d = spark.createDataFrame(LINK_DICT, "mention_key string, candidate_iri string, prior double")
    w = W.partitionBy("mention_key").orderBy(F.col("prior").desc(), F.col("candidate_iri").asc())
    best = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn", "prior")
    hits = docs.join(
        F.broadcast(best),
        F.col("padded").contains(F.concat(F.lit(" "), F.col("mention_key"), F.lit(" "))),
    )
    return hits.select("doc_id", "mention_key", F.col("candidate_iri").alias("entity_iri"))


def _link_dict_values_sql() -> str:
    rows = ", ".join(f"('{k}', '{v}', {p})" for k, v, p in LINK_DICT)
    return f"(VALUES {rows}) d(mention_key, candidate_iri, prior)"


ORACLE_KG_ENTITY_LINKING = f"""
WITH best AS (
  SELECT mention_key, candidate_iri FROM (
    SELECT mention_key, candidate_iri,
           row_number() OVER (PARTITION BY mention_key
                              ORDER BY prior DESC, candidate_iri ASC) AS rn
    FROM {_link_dict_values_sql()}
  ) WHERE rn = 1
), docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         ' ' || trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) || ' ' AS padded
  FROM documents
)
SELECT doc_id, mention_key, candidate_iri AS entity_iri
FROM docs JOIN best ON position(' ' || mention_key || ' ' IN padded) > 0
"""


def q_kg_format_ntriples(spark, sf_dir) -> DataFrame:
    """Formatter sink: canonical triples back to N-Triples lines."""
    t = q_kg_extract_turtle(spark, sf_dir)
    return format_ntriples(t).select("line")


ORACLE_KG_FORMAT_NTRIPLES = f"""
SELECT '<{DOC_NS}' || doc_id || '> <{P_NS}lang> "' || lang || '" .' AS line
FROM documents
UNION ALL
SELECT '<{DOC_NS}' || doc_id || '> <{P_NS}nchars> "' || n_chars
       || '"^^<{XSD_INT}> .'
FROM documents
"""


# ---------------------------------------------------------------------------
# Dedup / text-analysis / similarity (training-data ops)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir) -> DataFrame:
    return dedup_exact(
        _documents(spark, sf_dir).select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    )


ORACLE_DEDUP_EXACT = """
WITH k AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS h
  FROM documents
), g AS (
  SELECT h, min(doc_id) AS rep_id, COUNT(*) AS group_size FROM k GROUP BY h
)
SELECT k.doc_id, g.rep_id, g.group_size FROM k JOIN g USING (h)
"""

_SHINGLE3_SQL = """
  CASE WHEN len(toks) >= 3
       THEN list_transform(generate_series(1, len(toks) - 2),
                           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
       ELSE [array_to_string(toks, ' ')] END
"""

_TOKS_SQL = """
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
  FROM documents
"""


def q_dedup_minhash(spark, sf_dir) -> DataFrame:
    sigs = minhash_signatures(
        _documents(spark, sf_dir).select(F.col("doc_id").cast("string").alias("doc_id"), "text"),
        k=4,
    )
    return sigs.select(
        "doc_id", *[F.col("sig")[i].alias(f"mh{i}") for i in range(4)]
    )


ORACLE_DEDUP_MINHASH = f"""
WITH t AS ({_TOKS_SQL}),
s AS (SELECT doc_id, {_SHINGLE3_SQL} AS sh FROM t)
SELECT doc_id,
  list_min(list_transform(sh, x -> md5('0:' || x))) AS mh0,
  list_min(list_transform(sh, x -> md5('1:' || x))) AS mh1,
  list_min(list_transform(sh, x -> md5('2:' || x))) AS mh2,
  list_min(list_transform(sh, x -> md5('3:' || x))) AS mh3
FROM s
"""


def q_dedup_simhash(spark, sf_dir) -> DataFrame:
    return simhash_bits(
        _documents(spark, sf_dir).select(F.col("doc_id").cast("string").alias("doc_id"), "text"),
        bits=16,
    )


def _oracle_simhash(bits: int = 16) -> str:
    sums = ",\n    ".join(
        f"sum(CASE WHEN ascii(substr(h, {i + 1}, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    concat = " || ".join(f"CASE WHEN b{i} > 0 THEN '1' ELSE '0' END" for i in range(bits))
    return f"""
WITH t AS ({_TOKS_SQL}),
tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
h AS (SELECT doc_id, md5(tk) AS h FROM tok),
b AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id)
SELECT doc_id, {concat} AS simhash FROM b
"""


def q_dedup_jaccard(spark, sf_dir) -> DataFrame:
    return ngram_jaccard_pairs(
        _documents(spark, sf_dir).select(F.col("doc_id").cast("string").alias("doc_id"), "text"),
        n=3,
        threshold=0.2,
    )


ORACLE_DEDUP_JACCARD = f"""
WITH t AS ({_TOKS_SQL}),
s AS (SELECT doc_id, list_distinct({_SHINGLE3_SQL}) AS sh FROM t),
ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM ex GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.2
"""


def q_text_tokens(spark, sf_dir) -> DataFrame:
    return token_stats(
        _documents(spark, sf_dir).select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    )


ORACLE_TEXT_TOKENS = f"""
WITH t AS ({_TOKS_SQL}),
raw AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, length(text) AS n_chars FROM documents)
SELECT t.doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(raw.n_chars AS INT) AS n_chars,
       round(list_sum(list_transform(toks, x -> length(x))) * 1.0
             / greatest(len(toks), 1), 4) AS avg_token_len
FROM t JOIN raw USING (doc_id)
"""


def _profile_hits_sql(words: list[str], divisor_name: str | None = None) -> str:
    terms = [
        f"(length(padded) - length(replace(padded, ' {w} ', ' '))) / {len(w) + 1}.0"
        for w in words
    ]
    return "(" + " + ".join(terms) + ")"


def q_text_langid(spark, sf_dir) -> DataFrame:
    return language_id(
        _documents(spark, sf_dir).select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    )


def _oracle_langid() -> str:
    langs = sorted(LANG_PROFILES)
    scores = ",\n    ".join(
        f"{_profile_hits_sql(LANG_PROFILES[l])} AS s_{l}" for l in langs
    )
    # alphabetical tie-break: first language whose score >= all later ones
    pred_cases = []
    for i, l in enumerate(langs):
        conds = " AND ".join(f"s_{l} >= s_{m}" for m in langs[i + 1 :]) or "TRUE"
        pred_cases.append(f"WHEN {conds} THEN '{l}'")
    # note: earlier langs also need >= than all EARLIER? no — first-match CASE
    # with >= later ones reproduces min-by-(neg score, lang) exactly when each
    # case also requires >= all previous maxima; simplest correct form:
    best = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN s_{l} = {best} THEN '{l}'" for l in langs
    ) + " END"
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         ' ' || trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) || ' ' AS padded
  FROM documents
), s AS (SELECT doc_id, {scores} FROM d)
SELECT doc_id, {pred} AS lang_pred, {best} AS lang_score FROM s
"""


def q_text_quality(spark, sf_dir) -> DataFrame:
    return quality_score(
        _documents(spark, sf_dir).select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    )


def _oracle_quality() -> str:
    stop_hits = _profile_hits_sql(EN_STOPWORDS)
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
         ' ' || trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) || ' ' AS padded,
         string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks,
         greatest(length(text), 1) AS n_chars
  FROM documents
), m AS (
  SELECT doc_id,
         (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0 / n_chars AS punct,
         (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))) * 1.0 / n_chars AS upper_r,
         {stop_hits} / greatest(len(toks), 1) AS stop,
         length(text) AS raw_len
  FROM d
)
SELECT doc_id,
       round(punct, 4) AS punct_ratio,
       round(stop, 4) AS stopword_ratio,
       round(upper_r, 4) AS upper_ratio,
       round(greatest(0.0, least(1.0,
             0.5 + stop - punct * 2 - CASE WHEN raw_len < 20 THEN 0.5 ELSE 0.0 END)), 4)
         AS quality
FROM m
"""


def q_text_fingerprint(spark, sf_dir) -> DataFrame:
    return fingerprint(
        _documents(spark, sf_dir).select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    )


_SHINGLE5_SQL = """
  CASE WHEN len(toks) >= 5
       THEN list_transform(generate_series(1, len(toks) - 4),
                           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))
       ELSE [array_to_string(toks, ' ')] END
"""

ORACLE_TEXT_FINGERPRINT = f"""
WITH t AS ({_TOKS_SQL})
SELECT doc_id,
       md5(array_to_string(toks, ' ')) AS fp,
       list_min(list_transform({_SHINGLE5_SQL}, x -> md5(x))) AS rolling_fp
FROM t
"""


def q_sim_topk(spark, sf_dir) -> DataFrame:
    emb = _embeddings(spark, sf_dir)
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    from rio_spark.operators.similarity import cosine_to_query

    return (
        cosine_to_query(emb, q)
        .select("vec_id", F.round("cosine", 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(10)
    )


ORACLE_SIM_TOPK = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(embedding::DOUBLE[], qv)
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(qv, qv))), 4) AS cosine
FROM embeddings, q
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""


def q_sim_pairs(spark, sf_dir) -> DataFrame:
    emb = _embeddings(spark, sf_dir).filter("vec_id < 60")
    return cosine_pairs_above(emb, threshold=0.3)


ORACLE_SIM_PAIRS = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 60)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4)
         AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.3
"""


def q_sim_lsh_buckets(spark, sf_dir) -> DataFrame:
    emb = _embeddings(spark, sf_dir)
    return (
        lsh_bucket_ids(emb, n_planes=4)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


ORACLE_SIM_LSH_BUCKETS = """
WITH p AS (
  SELECT list(embedding::DOUBLE[] ORDER BY vec_id) AS planes
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 4)
), b AS (
  SELECT
    (CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.planes[1]) >= 0 THEN '1' ELSE '0' END)
    || (CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.planes[2]) >= 0 THEN '1' ELSE '0' END)
    || (CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.planes[3]) >= 0 THEN '1' ELSE '0' END)
    || (CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.planes[4]) >= 0 THEN '1' ELSE '0' END)
      AS bucket
  FROM embeddings e, p
)
SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket
"""


# ---------------------------------------------------------------------------
# Relational / OLAP coverage (TPC-H-style) + event streams
# ---------------------------------------------------------------------------

def q_tpch_q1(spark, sf_dir) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark, sf_dir) -> DataFrame:
    c = _read(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _read(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = _read(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .select(
            "l_orderkey",
            ntz_epoch(F.col("o_orderdate")).alias("o_orderdate_epoch"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


ORACLE_TPCH_Q3 = """
SELECT l_orderkey,
       CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_epoch,
       o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_tpch_q5(spark, sf_dir) -> DataFrame:
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    s = _read(spark, sf_dir, "supplier")
    n = _read(spark, sf_dir, "nation")
    r = _read(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


ORACLE_TPCH_Q5 = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def q_tpch_q6(spark, sf_dir) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.05)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


ORACLE_TPCH_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
"""


def q_window_topk(spark, sf_dir) -> DataFrame:
    """Top-3 line items by revenue per supplier (window row_number)."""
    li = _read(spark, sf_dir, "lineitem")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    w = W.partitionBy("l_suppkey").orderBy(
        F.col("revenue").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    return (
        li.select("l_suppkey", "l_orderkey", "l_linenumber", rev.alias("revenue"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "revenue", "rk")
    )


ORACLE_WINDOW_TOPK = """
SELECT l_suppkey, l_orderkey, l_linenumber, revenue, rk FROM (
  SELECT l_suppkey, l_orderkey, l_linenumber,
         round(l_extendedprice * (1 - l_discount), 4) AS revenue,
         row_number() OVER (PARTITION BY l_suppkey
                            ORDER BY round(l_extendedprice * (1 - l_discount), 4) DESC,
                                     l_orderkey ASC, l_linenumber ASC) AS rk
  FROM lineitem
) WHERE rk <= 3
"""


def q_events_sessionize(spark, sf_dir) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    st = session_stats(ev, gap_minutes=30)
    return st.select(
        "user_id",
        "session_id",
        "n_events",
        ntz_epoch(F.col("t_start")).alias("t_start_epoch"),
        ntz_epoch(F.col("t_end")).alias("t_end_epoch"),
        "total_value",
    )


ORACLE_EVENTS_SESSIONIZE = """
WITH base AS (
  -- whole-second epochs, matching Spark's truncating timestamp->long cast
  SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS e FROM events
), s AS (
  SELECT *,
         CASE WHEN lag(e) OVER w IS NULL
                OR e - lag(e) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s2 AS (
  SELECT *,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM s
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
       min(e) AS t_start_epoch,
       max(e) AS t_end_epoch,
       round(sum(value), 4) AS total_value
FROM s2 GROUP BY user_id, session_id
"""


def q_events_tumbling(spark, sf_dir) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    from rio_spark.operators.sessions import tumbling_counts

    tc = tumbling_counts(ev, minutes=60)
    return tc.select(
        ntz_epoch(F.col("w_start")).alias("w_start_epoch"),
        "event_type",
        "n",
        "total_value",
    )


ORACLE_EVENTS_TUMBLING = """
SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS w_start_epoch,
       event_type, count(*) AS n, round(sum(value), 4) AS total_value
FROM events
GROUP BY 1, 2
"""


def q_events_json_props(spark, sf_dir) -> DataFrame:
    """Semi-structured column: extract props.k (JSON) and aggregate."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


ORACLE_EVENTS_JSON_PROPS = """
SELECT event_type, count(*) AS n,
       sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS sum_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


def q_events_distinct_users(spark, sf_dir) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


ORACLE_EVENTS_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
"""


def q_tpch_rollup(spark, sf_dir) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
    )


ORACLE_TPCH_ROLLUP = """
SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_tpch_pivot(spark, sf_dir) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnsRenamed({"O": "qty_o", "F": "qty_f"})
    )


ORACLE_TPCH_PIVOT = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f
FROM lineitem GROUP BY l_returnflag
"""


def q_multimodal_features(spark, sf_dir) -> DataFrame:
    """Multimodal plumbing smoke (stubbed codec; no SQL oracle — the driver
    records the weaker rows-only check)."""
    from rio_spark.operators.multimodal import extract_features, synthetic_assets

    feats = extract_features(synthetic_assets(spark, n=64))
    return feats.select(
        "asset_id", "kind", F.round(F.element_at("features", 1), 6).alias("f0")
    )


QUERIES = {
    "kg_extract_nt": q_kg_extract_nt,
    "kg_extract_turtle": q_kg_extract_turtle,
    "kg_extract_rdfxml": q_kg_extract_rdfxml,
    "kg_predicate_counts": q_kg_predicate_counts,
    "kg_error_recovery": q_kg_error_recovery,
    "kg_assembly": q_kg_assembly,
    "kg_connected_components": q_kg_connected_components,
    "kg_entity_linking": q_kg_entity_linking,
    "kg_format_ntriples": q_kg_format_ntriples,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_jaccard": q_dedup_jaccard,
    "text_tokens": q_text_tokens,
    "text_langid": q_text_langid,
    "text_quality": q_text_quality,
    "text_fingerprint": q_text_fingerprint,
    "sim_topk": q_sim_topk,
    "sim_pairs": q_sim_pairs,
    "sim_lsh_buckets": q_sim_lsh_buckets,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "window_topk": q_window_topk,
    "events_sessionize": q_events_sessionize,
    "events_tumbling": q_events_tumbling,
    "events_json_props": q_events_json_props,
    "events_distinct_users": q_events_distinct_users,
    "tpch_rollup": q_tpch_rollup,
    "tpch_pivot": q_tpch_pivot,
    "multimodal_features": q_multimodal_features,
}

ORACLES = {
    "kg_extract_nt": ORACLE_KG_EXTRACT_NT,
    "kg_extract_turtle": ORACLE_KG_EXTRACT_TURTLE,
    "kg_extract_rdfxml": ORACLE_KG_EXTRACT_RDFXML,
    "kg_predicate_counts": ORACLE_KG_PREDICATE_COUNTS,
    "kg_error_recovery": ORACLE_KG_ERROR_RECOVERY,
    "kg_assembly": ORACLE_KG_ASSEMBLY,
    "kg_connected_components": ORACLE_KG_CONNECTED_COMPONENTS,
    "kg_entity_linking": ORACLE_KG_ENTITY_LINKING,
    "kg_format_ntriples": ORACLE_KG_FORMAT_NTRIPLES,
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_minhash": ORACLE_DEDUP_MINHASH,
    "dedup_simhash": _oracle_simhash(16),
    "dedup_jaccard": ORACLE_DEDUP_JACCARD,
    "text_tokens": ORACLE_TEXT_TOKENS,
    "text_langid": _oracle_langid(),
    "text_quality": _oracle_quality(),
    "text_fingerprint": ORACLE_TEXT_FINGERPRINT,
    "sim_topk": ORACLE_SIM_TOPK,
    "sim_pairs": ORACLE_SIM_PAIRS,
    "sim_lsh_buckets": ORACLE_SIM_LSH_BUCKETS,
    "tpch_q1": ORACLE_TPCH_Q1,
    "tpch_q3": ORACLE_TPCH_Q3,
    "tpch_q5": ORACLE_TPCH_Q5,
    "tpch_q6": ORACLE_TPCH_Q6,
    "window_topk": ORACLE_WINDOW_TOPK,
    "events_sessionize": ORACLE_EVENTS_SESSIONIZE,
    "events_tumbling": ORACLE_EVENTS_TUMBLING,
    "events_json_props": ORACLE_EVENTS_JSON_PROPS,
    "events_distinct_users": ORACLE_EVENTS_DISTINCT_USERS,
    "tpch_rollup": ORACLE_TPCH_ROLLUP,
    "tpch_pivot": ORACLE_TPCH_PIVOT,
    # multimodal_features intentionally has no oracle (binary feature stub)
}
