"""r7 optimization gate for the fused corpus_mix_report: chaining the three
scorers through passthrough (one corpus pass, zero doc_id joins) must be
row-identical to the pre-r7 triple-equi-join formulation — doc_ids are
unique and each scorer emits exactly one deterministic row per input row,
so the fused projection and the inner joins are the same relation. Kept as
a differential twin so any future scorer change that breaks the chaining
contract (one row per row, doc_id preserved) fails here, not at the
driver's oracle hash."""

from pyspark.sql import functions as F

from rio_spark.operators.text import (
    corpus_mix_report,
    language_id,
    quality_score,
    token_stats,
)

DOCS = [
    ("d1", "the cat and the dog sat in the house of the king"),
    ("d2", "el perro y el gato de la casa que los reyes aman"),
    ("d3", "THE THE THE!!! ??? !!! the of to in"),
    ("d4", "short"),
    ("d5", "le chat et le chien dans la maison des rois et les fleurs"),
    ("d6", "der hund und die katze das ist ein haus und der king"),
    ("d7", "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    ("d8", ""),
    ("d9", "the quality of mercy is not strained it droppeth as the rain"),
    ("d10", "numbers 123 456 789 and symbols #$% mixed with the and of"),
]


def _join_report(docs, bins=5):
    """The pre-r7 join formulation, verbatim."""
    j = (
        language_id(docs).select("doc_id", "lang_pred")
        .join(quality_score(docs).select("doc_id", "quality"), "doc_id")
        .join(token_stats(docs).select("doc_id", "n_tokens"), "doc_id")
    )
    bucket = F.least(F.floor(F.col("quality") * bins), F.lit(bins - 1)).cast("int")
    per = j.groupBy(F.col("lang_pred"), bucket.alias("q_bucket")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
    tot = per.agg(F.sum("n_docs").alias("__t")).withColumn("__k", F.lit(1))
    return (
        per.withColumn("__k", F.lit(1))
        .join(F.broadcast(tot), "__k")
        .select(
            "lang_pred", "q_bucket", "n_docs", "total_tokens",
            F.round(F.col("n_docs") / F.col("__t"), 6).alias("doc_share"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fused_report_equals_join_formulation(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    assert _rows(corpus_mix_report(docs)) == _rows(_join_report(docs))


def test_passthrough_collision_raises(spark):
    """Passthrough refuses inputs that already carry a column the scorer
    emits (silent shadowing would surface as AMBIGUOUS_REFERENCE far
    downstream) — e.g. re-scoring an already-scored frame."""
    import pytest as _pytest

    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    scored = language_id(docs, passthrough=True)
    with _pytest.raises(ValueError, match="lang_pred"):
        language_id(scored, passthrough=True)
    # and a stray doc_id when id_col differs
    renamed = spark.createDataFrame(
        [("k1", "t", "d1")], "k string, text string, doc_id string"
    )
    with _pytest.raises(ValueError, match="doc_id"):
        quality_score(renamed, id_col="k", passthrough=True)


def test_passthrough_chain_carries_and_matches_joined_scores(spark):
    """The chaining contract itself: scorer passthrough output keeps every
    upstream column and adds exactly its own, with values identical to the
    standalone scorer joined on doc_id."""
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    chained = token_stats(
        quality_score(language_id(docs, passthrough=True), passthrough=True),
        passthrough=True,
    )
    for col in ("text", "lang_pred", "lang_score", "quality", "n_tokens"):
        assert col in chained.columns
    joined = (
        language_id(docs)
        .join(quality_score(docs), "doc_id")
        .join(token_stats(docs), "doc_id")
        .select(*[c for c in chained.columns if c != "text"])
    )
    got = _rows(chained.select(*[c for c in chained.columns if c != "text"]))
    assert got == _rows(joined)
