"""Entity linking (J1/J2) and connected-components canonicalization (J3)."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from rio_spark.operators.canonicalize import (
    OWL_SAMEAS,
    canonicalize,
    connected_components,
)
from rio_spark.operators.linking import (
    detect_mentions,
    link_blocked,
    link_broadcast,
    link_entities,
    mention_triples,
    resolve_candidates,
)
from rio_spark.sources.entity_dictionary import entity_dictionary


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame(
        [
            ("c1", "We met Alice Johnson in Paris to discuss Acme Corp", 3),
            ("c2", "alice johnson emailed bob smith about globex", 1),
            ("c3", "nothing relevant here at all", 1),
            ("c4", "Paris Paris Paris Paris Paris", 1),  # hot key
        ],
        columns=["conv_id", "text", "n_turns"],
    )
    return spark.createDataFrame(pdf)


def test_detect_mentions_ngrams(spark, docs):
    m = detect_mentions(docs).toPandas()
    keys = set(m[m.doc_id == "c1"].mention_key)
    assert "alice johnson" in keys  # bigram
    assert "paris" in keys  # unigram
    assert "acme corp" in keys


def test_broadcast_vs_blocked_same_result(spark, docs):
    d = entity_dictionary(spark)
    m = detect_mentions(docs)
    a = (
        link_broadcast(m, d)
        .select("doc_id", "pos", "mention_key", "candidate_iri")
        .toPandas()
        .sort_values(["doc_id", "pos", "mention_key", "candidate_iri"])
        .reset_index(drop=True)
    )
    b = (
        link_blocked(m, d)
        .select("doc_id", "pos", "mention_key", "candidate_iri")
        .toPandas()
        .sort_values(["doc_id", "pos", "mention_key", "candidate_iri"])
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert len(a) > 0


def test_broadcast_join_in_plan(spark, docs):
    d = entity_dictionary(spark)
    plan = link_broadcast(detect_mentions(docs), d)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_resolution_picks_highest_prior(spark, docs):
    d = entity_dictionary(spark)
    resolved = resolve_candidates(link_broadcast(detect_mentions(docs), d)).toPandas()
    acme = resolved[resolved.mention_key == "acme corp"]
    assert set(acme.candidate_iri) == {"http://kg.example/entity/acme_corp"}  # prior .9 beats .4


def test_link_entities_triples(spark, docs):
    d = entity_dictionary(spark)
    t = link_entities(docs, d).toPandas()
    subj = set(t.subject)
    assert "<http://kg.example/doc/c1>" in subj
    mentions = t[t.predicate == "<http://kg.example/ontology#mentions>"]
    assert "<http://kg.example/entity/paris>" in set(mentions.object)
    labels = t[t.predicate == "<http://www.w3.org/2000/01/rdf-schema#label>"]
    assert '"alice johnson"' in set(labels.object)


def test_connected_components_chain_and_star(spark):
    edges = spark.createDataFrame(
        pd.DataFrame(
            [("b", "a"), ("c", "b"), ("d", "c"),  # chain a-b-c-d
             ("x", "z"), ("y", "z"),              # star on z
             ("solo1", "solo2")],
            columns=["src", "dst"],
        )
    )
    cc = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert cc["a"] == cc["b"] == cc["c"] == cc["d"] == "a"
    assert cc["x"] == cc["y"] == cc["z"] == "x"
    assert cc["solo1"] == cc["solo2"] == "solo1"


def test_canonicalize_rewrites_aliases(spark):
    rows = [
        ("d1", "<http://e/alice>", OWL_SAMEAS, "<http://e/alice_dup>", None),
        ("d1", "<http://e/alice_dup>", OWL_SAMEAS, "<http://e/a_johnson>", None),
        ("d1", "<http://e/alice_dup>", "<http://e/knows>", "<http://e/bob>", None),
        ("d2", "<http://e/carol>", "<http://e/knows>", "<http://e/a_johnson>", None),
        ("d2", "<http://e/carol>", "<http://e/age>", '"33"', None),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "subject", "predicate", "object", "graph"])
    )
    out = canonicalize(df).toPandas()
    # canonical id is the lexicographic min: <http://e/a_johnson>
    knows = out[out.predicate == "<http://e/knows>"]
    assert set(knows.subject) == {"<http://e/a_johnson>", "<http://e/carol>"}
    assert set(knows.object) == {"<http://e/bob>", "<http://e/a_johnson>"}
    # degenerate self-sameAs dropped
    self_rows = out[(out.predicate == OWL_SAMEAS) & (out.subject == out.object)]
    assert len(self_rows) == 0
    # untouched triples survive
    assert ('"33"' in set(out.object))
