"""BGP evaluator (operators/bgp.py): relational mapping, repeated-variable
filters, and the explicit cartesian/ASK guard rails."""

import pytest

from rio_spark.operators.bgp import bgp_join

T = [
    # (doc_id, subject, predicate, object, graph)
    ("d", "<http://e/a>", "<http://p/knows>", "<http://e/b>", None),
    ("d", "<http://e/b>", "<http://p/knows>", "<http://e/c>", None),
    ("d", "<http://e/a>", "<http://p/name>", '"alice"', None),
    ("d", "<http://e/b>", "<http://p/name>", '"bob"', None),
    ("d", "<http://e/loop>", "<http://p/knows>", "<http://e/loop>", None),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        T, "doc_id string, subject string, predicate string, object string, graph string"
    )


def test_two_hop_chain(triples):
    out = bgp_join(
        triples,
        [
            ("?x", "<http://p/knows>", "?y"),
            ("?y", "<http://p/knows>", "?z"),
        ],
    )
    rows = {(r.x, r.y, r.z) for r in out.collect()}
    assert ("<http://e/a>", "<http://e/b>", "<http://e/c>") in rows
    # the self-loop chains with itself
    assert ("<http://e/loop>", "<http://e/loop>", "<http://e/loop>") in rows
    assert len(rows) == 2


def test_star_with_constant_object(triples):
    out = bgp_join(
        triples,
        [
            ("?x", "<http://p/name>", '"alice"'),
            ("?x", "<http://p/knows>", "?y"),
        ],
    )
    assert [(r.x, r.y) for r in out.collect()] == [("<http://e/a>", "<http://e/b>")]


def test_repeated_var_in_one_pattern_is_self_loop_filter(triples):
    out = bgp_join(triples, [("?x", "<http://p/knows>", "?x")])
    assert [r.x for r in out.collect()] == ["<http://e/loop>"]


def test_cartesian_raises(triples):
    with pytest.raises(ValueError, match="cartesian"):
        bgp_join(
            triples,
            [("?x", "<http://p/name>", "?n"), ("?a", "<http://p/knows>", "?b")],
        )


def test_all_constant_raises(triples):
    with pytest.raises(ValueError, match="ASK"):
        bgp_join(triples, [("<http://e/a>", "<http://p/name>", '"alice"')])
