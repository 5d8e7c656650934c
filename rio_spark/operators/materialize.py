"""Graph-table materialization with MERGE-style dedup, lineage, and resume (K6).

Production design (SURVEY.md §4.3): an Iceberg table partitioned by
``bucket(N, subject)`` + ``graph``, written with ``MERGE INTO`` on the quad
key, one lineage row per committed input partition. The Iceberg runtime jar
is not on this image's classpath, so the same contract is implemented on
parquet:

* graph table   — parquet dir partitioned by ``p_bucket = pmod(xxhash64(subject), N)``
                  (hidden-partitioning analogue; subject-key joins prune buckets);
* MERGE         — append-only with an anti-join against the existing quad set
                  restricted to the incoming buckets (no full-table rewrite);
* lineage       — parquet table (input_snapshot_id, partition_hash,
                  triple_count, committed_at); a partition is the unit of
                  commit AND of resume: reruns anti-join the input partition
                  list against lineage and skip committed ones.

Atomicity caveat: parquet append is not transactional; Iceberg snapshots
provide that in production. The resume contract (no duplicate quads, skip
committed partitions) is what the tests pin down.
"""

from __future__ import annotations

import re
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

GRAPH_COLUMNS = ["subject", "predicate", "object", "graph", "p_bucket"]
# strict bucket-dir name: `p_bucket=N` only — `.compacting` / `.old` staging
# dirs from an interrupted compaction must never parse as buckets
_BUCKET_DIR_RE = re.compile(r"^p_bucket=(\d+)$")
LINEAGE_SCHEMA = (
    "input_snapshot_id string, partition_hash string, triple_count long, committed_at double"
)


class GraphStore:
    def __init__(self, root: str, n_buckets: int = 64):
        self.root = Path(root)
        self.n_buckets = n_buckets
        self.graph_dir = str(self.root / "graph")
        self.lineage_dir = str(self.root / "lineage")

    # -- reads ---------------------------------------------------------------

    def graph(self, spark: SparkSession) -> DataFrame:
        """Pure read — never mutates the store (r4 ADVICE: a reader running
        destructive recovery races a live compact() in another process and
        deletes its in-progress staging dir).  Staging dirs a crashed
        compact() left behind (``p_bucket=N.compacting`` / ``.old``) are
        simply NOT listed: only dirs matching ``p_bucket=\\d+`` are read,
        via explicit paths + basePath so partition discovery still yields
        the p_bucket column.  Destructive recovery runs only on the
        single-writer paths (merge()/compact() entry).  A reader racing a
        live swap can transiently miss the one bucket mid-rename — the
        documented parquet stand-in semantics for Iceberg's snapshot
        isolation (schedule compaction in the maintenance window)."""
        root = Path(self.graph_dir)
        bucket_dirs = sorted(
            str(d) for d in root.glob("p_bucket=*")
            if _BUCKET_DIR_RE.match(d.name)
        ) if root.exists() else []
        if not bucket_dirs:
            return spark.createDataFrame(
                [], "subject string, predicate string, object string, graph string, p_bucket int"
            )
        return spark.read.option("basePath", self.graph_dir).parquet(*bucket_dirs)

    def lineage(self, spark: SparkSession) -> DataFrame:
        if not Path(self.lineage_dir).exists():
            return spark.createDataFrame([], LINEAGE_SCHEMA)
        return spark.read.parquet(self.lineage_dir)

    def committed_partitions(self, spark: SparkSession, snapshot_id: str) -> set[str]:
        lin = self.lineage(spark)
        return {
            r["partition_hash"]
            for r in lin.filter(F.col("input_snapshot_id") == snapshot_id)
            .select("partition_hash")
            .distinct()
            .collect()
        }

    # -- writes ---------------------------------------------------------------

    def _bucketed(self, triples: DataFrame) -> DataFrame:
        return triples.select(
            "subject", "predicate", "object", "graph",
            F.pmod(F.xxhash64("subject"), F.lit(self.n_buckets)).cast("int").alias("p_bucket"),
        )

    def merge(self, spark: SparkSession, triples: DataFrame) -> int:
        """MERGE semantics: insert quads not already present. Returns rows added.

        The anti-join reads only the buckets the incoming batch touches
        (partition pruning on p_bucket), so merge cost scales with batch
        size, not table size."""
        # single-writer path: heal any crashed compaction before reading, so
        # a bucket left mid-swap (live dir renamed aside) is visible to the
        # anti-join — graph() alone would silently skip it
        if Path(self.graph_dir).exists():
            self._recover_interrupted_compactions(Path(self.graph_dir))
        batch = self._bucketed(triples).dropDuplicates(
            ["subject", "predicate", "object", "graph"]
        )
        existing = self.graph(spark)
        if existing.isEmpty():
            new_rows = batch
        else:
            buckets = [r["p_bucket"] for r in batch.select("p_bucket").distinct().collect()]
            scoped = (
                existing.filter(F.col("p_bucket").isin(buckets))
                .select("subject", "predicate", "object", "graph")
                .alias("ex")
            )
            b = batch.alias("b")
            # null-safe equality on graph: the default graph is NULL and a
            # plain equi-join would re-insert it forever
            cond = (
                (F.col("b.subject") == F.col("ex.subject"))
                & (F.col("b.predicate") == F.col("ex.predicate"))
                & (F.col("b.object") == F.col("ex.object"))
                & F.col("b.graph").eqNullSafe(F.col("ex.graph"))
            )
            new_rows = b.join(scoped, cond, "left_anti")
        new_rows = new_rows.cache()
        n = new_rows.count()
        if n:
            new_rows.write.mode("append").partitionBy("p_bucket").parquet(self.graph_dir)
        new_rows.unpersist()
        return n

    def commit_lineage(
        self, spark: SparkSession, snapshot_id: str, partition_hash: str, triple_count: int
    ) -> None:
        spark.createDataFrame(
            [(snapshot_id, partition_hash, triple_count, time.time())], LINEAGE_SCHEMA
        ).write.mode("append").parquet(self.lineage_dir)

    # -- maintenance -----------------------------------------------------------

    def compact(
        self,
        spark: SparkSession,
        min_files: int = 8,
        target_rows_per_file: int = 1_000_000,
    ) -> dict[int, tuple[int, int]]:
        """Small-file compaction: every incremental merge appends one file
        per task per touched bucket, so a long-lived store accumulates
        thousands of KB-sized files per bucket and scan/planning cost
        explodes — THE standing maintenance problem of incremental lakehouse
        tables.  Buckets at or above ``min_files`` files are rewritten into
        ``ceil(rows / target_rows_per_file)`` files.

        Returns {bucket: (files_before, files_after)}.  Only oversized
        buckets are touched (cost scales with fragmentation, not table
        size), contents are bit-preserved (pinned by tests), and lineage is
        untouched — compaction is invisible to resume.  Like merge, the
        directory swap is the parquet stand-in for Iceberg's transactional
        ``rewrite_data_files``; readers racing the swap can see a partial
        bucket, so schedule it in the maintenance window.

        Crash safety: the rewrite is an atomic-rename swap — the staged dir
        is fully written (``_SUCCESS`` present) before the live dir is
        renamed aside, then the staged dir renamed in, then the old dir
        deleted.  A crash in ANY window leaves either the originals or the
        complete rewrite reachable; ``_recover_interrupted_compactions``
        (called on every compact() entry) rolls the bucket forward or back.
        """
        import math
        import shutil

        report: dict[int, tuple[int, int]] = {}
        root = Path(self.graph_dir)
        if not root.exists():
            return report
        self._recover_interrupted_compactions(root)
        for bdir in sorted(root.glob("p_bucket=*")):
            m = _BUCKET_DIR_RE.match(bdir.name)
            if m is None:  # never treat .compacting/.old staging dirs as buckets
                continue
            files = sorted(bdir.glob("*.parquet"))
            if len(files) < min_files:
                continue
            bucket = int(m.group(1))
            df = spark.read.parquet(str(bdir))
            n = df.count()
            n_out = max(1, math.ceil(n / target_rows_per_file))
            staging = bdir.with_name(bdir.name + ".compacting")
            old = bdir.with_name(bdir.name + ".old")
            if staging.exists():
                shutil.rmtree(staging)
            df.repartition(n_out).write.mode("overwrite").parquet(str(staging))
            # swap: live -> .old, staged -> live, drop .old. Each step is one
            # rename; recovery can always finish or undo a half-done swap.
            bdir.rename(old)
            staging.rename(bdir)
            shutil.rmtree(old)
            report[bucket] = (len(files), len(sorted(bdir.glob("*.parquet"))))
        return report

    @staticmethod
    def _recover_interrupted_compactions(root: Path) -> None:
        """Finish or roll back bucket swaps a crashed compact() left behind.

        States (staging = ``p_bucket=N.compacting``, old = ``p_bucket=N.old``,
        live = ``p_bucket=N``):

        * live present, staging present  -> crash before the swap started;
          the originals are authoritative, drop the staging dir.
        * live absent, staging present   -> crash between the two renames;
          staging was fully written (it is only ever renamed in after
          ``_SUCCESS``), so promote it to live, then drop any ``.old``.
        * live present, old present      -> crash after the swap, before
          cleanup; the rewrite is live, drop the ``.old`` leftovers.
        """
        import shutil

        for staging in sorted(root.glob("p_bucket=*.compacting")):
            live = staging.with_name(staging.name[: -len(".compacting")])
            old = live.with_name(live.name + ".old")
            if live.exists():
                shutil.rmtree(staging)
            else:
                staging.rename(live)
                if old.exists():
                    shutil.rmtree(old)
        for old in sorted(root.glob("p_bucket=*.old")):
            live = old.with_name(old.name[: -len(".old")])
            if live.exists():
                shutil.rmtree(old)
            else:  # staged dir was lost before the swap completed: roll back
                old.rename(live)
