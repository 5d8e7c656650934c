"""Gates for the r6 ADVICE correctness fixes taken in the r7 round:

* ``added_quads`` must refuse a range whose parent chain lost a snapshot
  to expiry even when every SURVIVING manifest in the range is append-only
  (the expired snapshot could have been a delete/rollback — the advisor's
  merge -> delete -> compact -> expire repro returned a silently partial
  delta before the fix).
* ``IncrementalCountView.refresh`` must refuse a cursor AHEAD of the
  store's CURRENT (store wiped and re-bootstrapped under persisted view
  state) instead of silently keeping the stale aggregate and rewinding
  the cursor.
"""

import pytest
from pyspark.sql import functions as F


def _batch(spark, i, n):
    return spark.createDataFrame(
        [(f"<http://e/s{i}_{j}>", "<http://p/x>", f'"{j}"', None) for j in range(n)],
        "subject string, predicate string, object string, graph string",
    )


def test_added_quads_refuses_expired_hidden_delete(spark, tmp_path):
    from rio_spark.operators.materialize import GraphStore

    store = GraphStore(str(tmp_path / "store"), n_buckets=2)
    store.merge(spark, _batch(spark, 0, 6))
    since = store.current_snapshot()
    store.merge(spark, _batch(spark, 1, 4))
    store.delete_where(spark, F.col("subject") == "<http://e/s1_0>")
    store.compact(spark, min_files=1, target_rows_per_file=10_000)
    until = store.current_snapshot()

    # the un-expired range already refuses (delete inside it)
    with pytest.raises(ValueError, match="append-only"):
        store.added_quads(spark, since, until)

    # expire everything but the final compact: the delete manifest is gone,
    # so the surviving-ops check alone sees an 'append-only' range — the
    # parent-chain walk must still refuse instead of returning a silently
    # empty/partial delta
    store.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="expired"):
        store.added_quads(spark, since, until)

    # an empty range stays a cheap empty delta (unchanged contract)
    assert store.added_quads(spark, until, until).count() == 0


def test_incremental_view_refuses_cursor_ahead_of_store(spark, tmp_path):
    import shutil

    from rio_spark.operators.incremental import IncrementalCountView
    from rio_spark.operators.materialize import GraphStore

    store_dir = tmp_path / "store"
    store = GraphStore(str(store_dir), n_buckets=2)
    store.merge(spark, _batch(spark, 0, 5))
    store.merge(spark, _batch(spark, 1, 5))
    store.merge(spark, _batch(spark, 2, 5))
    view = IncrementalCountView(store, str(tmp_path / "view"), ["predicate"])
    assert view.refresh(spark)["mode"] == "full"
    cur = view.cursor()
    assert cur == store.current_snapshot()

    # wipe + re-bootstrap the store: numbering restarts below the cursor
    shutil.rmtree(store_dir)
    store2 = GraphStore(str(store_dir), n_buckets=2)
    store2.merge(spark, _batch(spark, 9, 2))
    assert store2.current_snapshot() < cur
    view2 = IncrementalCountView(store2, str(tmp_path / "view"), ["predicate"])
    with pytest.raises(ValueError, match="ahead of the store"):
        view2.refresh(spark)
