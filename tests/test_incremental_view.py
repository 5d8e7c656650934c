"""The incremental predicate-count view must equal a from-scratch
aggregation of the live graph after EVERY kind of store transition —
streaming the delta for append-only ranges, falling back to one full
recompute when the range contains delete/rollback, and treating
compaction as the content-neutral commit it is."""

import pytest

from pyspark.sql import functions as F

from rio_spark.operators.incremental import IncrementalPredicateCounts
from rio_spark.operators.materialize import GraphStore


def _truth(spark, store):
    return {
        r["predicate"]: r["n"]
        for r in store.graph(spark).groupBy("predicate").agg(
            F.count("*").alias("n")).collect()
    }


def _view(spark, inc):
    return {r["predicate"]: r["n_quads"] for r in inc.view(spark).collect()}


def test_incremental_view_tracks_every_store_transition(spark, tmp_path):
    store = GraphStore(str(tmp_path / "store"), n_buckets=2)
    inc = IncrementalPredicateCounts(store, str(tmp_path / "view"))

    def merge(pred, n, tag=""):
        store.merge(spark, spark.createDataFrame(
            [(f"<http://e/{pred}{tag}_{j}>", f"<http://p/{pred}>", '"v"', None)
             for j in range(n)],
            "subject string, predicate string, object string, graph string",
        ))

    assert inc.view(spark).count() == 0  # pre-first-refresh: empty view
    merge("a", 5)
    merge("b", 3)
    rep = inc.refresh(spark)
    assert rep["mode"] == "full"  # first refresh has no cursor
    assert _view(spark, inc) == _truth(spark, store)

    # append-only range streams the delta
    merge("a", 2, tag="x")
    merge("c", 4)
    rep = inc.refresh(spark)
    assert rep["mode"] == "incremental"
    assert _view(spark, inc) == _truth(spark, store) == {
        "<http://p/a>": 7, "<http://p/b>": 3, "<http://p/c>": 4}

    # already-current refresh is a no-op; so is one after a pure compact
    assert inc.refresh(spark)["mode"] == "noop"
    store.compact(spark, min_files=2, target_rows_per_file=10_000)
    rep = inc.refresh(spark)
    assert rep["mode"] == "incremental"  # compact commits, adds nothing
    assert _view(spark, inc) == _truth(spark, store)

    # a delete in the range forces the full-recompute fallback
    store.delete_where(spark, F.col("predicate") == "<http://p/b>")
    rep = inc.refresh(spark)
    assert rep["mode"] == "full"
    assert _view(spark, inc) == _truth(spark, store)
    assert "<http://p/b>" not in _view(spark, inc)

    # rollback likewise
    store.rollback(store.current_snapshot() - 1)
    rep = inc.refresh(spark)
    assert rep["mode"] == "full"
    assert _view(spark, inc) == _truth(spark, store)
    assert _view(spark, inc)["<http://p/b>"] == 3  # resurrected by rollback

    # expired history in the range likewise (delta would need gone parents)
    merge("d", 2)
    store.expire_snapshots(keep_last=1)
    rep = inc.refresh(spark)
    assert rep["mode"] == "full"
    assert _view(spark, inc) == _truth(spark, store)

    # exactly one view dir remains and the cursor names it
    dirs = sorted(p.name for p in (tmp_path / "view").glob("view-*"))
    assert dirs == [f"view-{inc.cursor()}"]
    assert inc.cursor() == store.current_snapshot()


def test_count_view_groups_by_arbitrary_columns(spark, tmp_path):
    """The generalized view counts by any quad-column combination —
    here (predicate, graph), with NULL graph keys grouping correctly —
    and keeps the incremental/full-fallback contract."""
    from rio_spark.operators.incremental import IncrementalCountView

    store = GraphStore(str(tmp_path / "store"), n_buckets=2)
    inc = IncrementalCountView(store, str(tmp_path / "view"),
                               group_cols=("predicate", "graph"))

    def merge(pred, graph, n, tag=""):
        store.merge(spark, spark.createDataFrame(
            [(f"<http://e/{pred}{graph}{tag}_{j}>", f"<http://p/{pred}>", '"v"', graph)
             for j in range(n)],
            "subject string, predicate string, object string, graph string",
        ))

    merge("a", None, 3)
    merge("a", "<http://g/1>", 2)
    assert inc.refresh(spark)["mode"] == "full"
    merge("a", None, 1, tag="x")
    assert inc.refresh(spark)["mode"] == "incremental"

    got = {(r["predicate"], r["graph"]): r["n_quads"]
           for r in inc.view(spark).collect()}
    assert got == {("<http://p/a>", None): 4, ("<http://p/a>", "<http://g/1>"): 2}

    truth = {
        (r["predicate"], r["graph"]): r["n"]
        for r in store.graph(spark).groupBy("predicate", "graph").agg(
            F.count("*").alias("n")).collect()
    }
    assert got == truth

    store.delete_where(spark, F.col("graph") == "<http://g/1>")
    assert inc.refresh(spark)["mode"] == "full"
    assert {(r["predicate"], r["graph"]) for r in inc.view(spark).collect()} == {
        ("<http://p/a>", None)}


def test_view_grouping_is_state_metadata(spark, tmp_path):
    """group_cols are validated (quad columns only — p_bucket is layout)
    and frozen into the state dir: a refresh with different columns
    against existing state fails loudly instead of silently rewriting."""
    from rio_spark.operators.incremental import IncrementalCountView

    store = GraphStore(str(tmp_path / "store"), n_buckets=2)
    store.merge(spark, spark.createDataFrame(
        [("<http://e/s>", "<http://p/a>", '"v"', None)],
        "subject string, predicate string, object string, graph string",
    ))
    with pytest.raises(ValueError, match="quad columns"):
        IncrementalCountView(store, str(tmp_path / "v"), group_cols=("p_bucket",))
    with pytest.raises(ValueError, match="quad columns"):
        IncrementalCountView(store, str(tmp_path / "v"), group_cols=())

    state = str(tmp_path / "view")
    IncrementalCountView(store, state).refresh(spark)
    with pytest.raises(ValueError, match="was built with group_cols"):
        IncrementalCountView(store, state, group_cols=("graph",)).refresh(spark)
    # the original grouping keeps refreshing fine
    assert IncrementalCountView(store, state).refresh(spark)["mode"] == "noop"
