"""r7 optimization gate for cc_incremental's scan-only mode: the
batch-scale formulation (labels semi-reduced to touched endpoints,
broadcast lookups, new nodes derived from the lookup misses instead of an
anti-join against the full labeling) must be row-identical to the classic
join formulation (the default — faster at bench scale, impossible past
the broadcast cap) and to the from-scratch recompute. Cases cover every
branch of the new-node derivation: endpoints with old labels, genuinely
new endpoints, new-new edges forming their own component, bridges merging
two old components, and untouched old components."""

import pytest

from rio_spark.operators.canonicalize import cc_incremental, connected_components


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_scan_only_matches_classic_and_scratch(spark):
    # old graph: components {a1,a2,a3}, {b1,b2}, {z1,z2} (z untouched)
    old_edges = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("b1", "b2"), ("z1", "z2")],
        "src string, dst string",
    )
    labels = connected_components(old_edges)
    # batch: bridge a<->b (merges two old comps), old->new (n1 joins a's
    # comp), new->new (n2,n3 form a brand-new comp), new self-contained n4
    batch = spark.createDataFrame(
        [("a3", "b1"), ("a1", "n1"), ("n2", "n3"), ("n4", "n4")],
        "src string, dst string",
    )
    classic = _rows(cc_incremental(labels, batch))
    scan_only = _rows(cc_incremental(labels, batch, scan_only_labels=True))
    assert scan_only == classic
    # and both equal the from-scratch recompute over old ∪ new
    scratch = _rows(connected_components(old_edges.unionByName(batch)))
    assert classic == scratch


def test_scan_only_labels_never_shuffled_or_broadcast(spark):
    """Plan contract of scan_only_labels=True: the old labeling must never
    be the shuffled or broadcast side — every join it feeds is a broadcast
    of the BATCH-scale side (semi reduction, relabel map, new-node semi)."""
    old_edges = spark.createDataFrame(
        [("a1", "a2"), ("b1", "b2")], "src string, dst string"
    )
    labels = connected_components(old_edges)
    batch = spark.createDataFrame([("a1", "n1")], "src string, dst string")
    plan = (
        cc_incremental(labels, batch, scan_only_labels=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # no sort-merge anywhere: every join broadcasts a batch-scale side
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
