"""Model-based stateful check of the graph store: a seeded random sequence
of merge / compact / rollback / expire ops runs against BOTH the real
GraphStore and a pure-Python model (live set + snapshot-number -> quad-set
map).  After every op the live graph, a randomly chosen unexpired
snapshot's time-travel read, and the expired snapshots' refusal to read
must all match the model exactly.  This is the store's linearized
single-writer contract exercised as a whole, not per-method — the class
of bug it exists to catch is an op pair whose interaction breaks an
invariant each op preserves alone (e.g. rollback then expire sweeping a
file the rollback still references)."""

import random

import pytest

from rio_spark.operators.materialize import GraphStore

UNIVERSE = [
    (f"<http://e/s{i}>", "<http://p/x>", f'"{v}"', None)
    for i in range(12)
    for v in range(3)
]
QUAD_SCHEMA = "subject string, predicate string, object string, graph string"


def _graph_set(spark, store, snapshot=None):
    return {
        (r["subject"], r["predicate"], r["object"], r["graph"])
        for r in store.graph(spark, snapshot=snapshot).collect()
    }


@pytest.mark.parametrize("seed", [7, 23])
def test_store_matches_set_model_under_random_ops(spark, tmp_path, seed):
    rng = random.Random(seed)
    store = GraphStore(str(tmp_path / f"store{seed}"), n_buckets=2)
    live: set = set()
    by_snapshot: dict[int, set] = {}
    tags: dict[str, int] = {}

    def record():
        by_snapshot[store.current_snapshot()] = set(live)

    store.merge(spark, spark.createDataFrame([], QUAD_SCHEMA))  # init commit
    record()

    for step in range(10):
        op = rng.choice(["merge", "merge", "merge", "compact", "rollback",
                         "expire", "delete", "tag", "rebucket"])
        if op == "merge":
            batch = rng.sample(UNIVERSE, rng.randint(1, 6))
            merged = store.merge(spark, spark.createDataFrame(batch, QUAD_SCHEMA))
            fresh = set(batch) - live
            assert merged == len(fresh), f"step {step}: merge count drifted"
            live |= fresh
            record()
        elif op == "compact":
            store.compact(spark, min_files=2, target_rows_per_file=1_000)
            record()  # content-neutral; may or may not commit
        elif op == "rollback":
            target = rng.choice(sorted(by_snapshot))
            store.rollback(target)
            live = set(by_snapshot[target])
            record()
        elif op == "delete":
            from pyspark.sql import functions as F

            subj = rng.choice(UNIVERSE)[0]
            n = store.delete_where(spark, F.col("subject") == subj)
            gone = {q for q in live if q[0] == subj}
            assert n == len(gone), f"step {step}: delete count drifted"
            live -= gone
            record()
        elif op == "rebucket":
            store.rebucket(spark, rng.choice([1, 2, 3, 5]))
            record()  # content-neutral layout rewrite
        elif op == "tag":
            target = rng.choice(sorted(by_snapshot))
            store.create_tag(f"t{step}", target)
            tags[f"t{step}"] = target
        elif op == "expire":
            keep = rng.randint(1, 3)
            store.expire_snapshots(keep_last=keep)
            kept = {s["snapshot"] for s in store.snapshots()}
            for n in list(by_snapshot):
                if n not in kept:
                    del by_snapshot[n]

        # live graph == model after every op
        assert _graph_set(spark, store) == live, f"step {step} ({op}): live drifted"
        # the file-pruned point-read agrees with the model too — lookup
        # hashes with the live spec, so this catches any op (rebucket,
        # rollback over one) that desynchronizes spec and layout
        probe_subj = rng.choice(UNIVERSE)[0]
        got = {
            (r["subject"], r["predicate"], r["object"], r["graph"])
            for r in store.lookup(spark, [probe_subj]).collect()
        }
        assert got == {q for q in live if q[0] == probe_subj}, (
            f"step {step} ({op}): lookup({probe_subj}) drifted"
        )
        # a random unexpired snapshot time-travels to its recorded set
        probe = rng.choice(sorted(by_snapshot))
        assert _graph_set(spark, store, snapshot=probe) == by_snapshot[probe], (
            f"step {step} ({op}): time travel to {probe} drifted"
        )

    # expired snapshots refuse to read; metadata tables agree with the model
    expired = set(range(store.current_snapshot() + 1)) - {
        s["snapshot"] for s in store.snapshots()
    }
    if expired:
        with pytest.raises(ValueError, match="unknown or expired"):
            store.graph(spark, snapshot=min(expired)).count()
    rows = {r["snapshot"] for r in store.snapshots_df(spark).collect()}
    assert rows == {s["snapshot"] for s in store.snapshots()}
    assert store.files_df(spark).toPandas()["rows"].sum() == len(live)
    # every tag survived every expire and still reads its pinned set
    assert store.tags() == tags
    for name, n in tags.items():
        assert _graph_set(spark, store, snapshot=n) == by_snapshot[n], (
            f"tagged snapshot {n} ({name}) drifted or was swept")
