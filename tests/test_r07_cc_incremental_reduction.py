"""r7 optimization gate for the semi-join-reduced cc_incremental: the
batch-scale formulation (labels semi-reduced to touched endpoints,
broadcast lookups, new nodes derived from the lookup misses instead of an
anti-join against the full labeling) must be row-identical to the pre-r7
formulation that shuffled/broadcast the whole old labeling. Cases cover
every branch of the new-node derivation: endpoints with old labels,
genuinely new endpoints, new-new edges forming their own component,
bridges merging two old components, and untouched old components."""

from pyspark.sql import functions as F

from rio_spark.operators.canonicalize import cc_incremental, connected_components


def _old_cc_incremental(labels, new_edges, src="src", dst="dst"):
    """The pre-r7 formulation, verbatim (differential twin)."""
    lab = labels.select("node", "component")
    s = lab.select(F.col("node").alias(src), F.col("component").alias("__sc"))
    d = lab.select(F.col("node").alias(dst), F.col("component").alias("__dc"))
    contracted = (
        new_edges.select(src, dst)
        .join(s, src, "left")
        .join(d, dst, "left")
        .select(
            F.coalesce("__sc", F.col(src)).alias("src"),
            F.coalesce("__dc", F.col(dst)).alias("dst"),
        )
    )
    comp2 = connected_components(contracted)
    relabel = comp2.select(
        F.col("node").alias("component"), F.col("component").alias("__new")
    )
    updated = lab.join(relabel, "component", "left").select(
        "node", F.coalesce("__new", F.col("component")).alias("component")
    )
    new_nodes = comp2.join(lab.select("node"), "node", "left_anti")
    return updated.unionByName(new_nodes.select("node", "component"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_reduced_incremental_matches_old_formulation(spark):
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
    got = _rows(cc_incremental(labels, batch))
    want = _rows(_old_cc_incremental(labels, batch))
    assert got == want
    # and both equal the from-scratch recompute over old ∪ new
    scratch = _rows(connected_components(old_edges.unionByName(batch)))
    assert got == scratch


def test_reduced_incremental_labels_only_scanned(spark):
    """Plan contract: the old labeling must never be the shuffled or
    broadcast side — every join it feeds is a broadcast of the BATCH-scale
    side (semi reduction, relabel map, new-node semi)."""
    old_edges = spark.createDataFrame(
        [("a1", "a2"), ("b1", "b2")], "src string, dst string"
    )
    labels = connected_components(old_edges)
    batch = spark.createDataFrame([("a1", "n1")], "src string, dst string")
    plan = (
        cc_incremental(labels, batch)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # no sort-merge anywhere: every join broadcasts a batch-scale side
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
