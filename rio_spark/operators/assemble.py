"""Document assembly: turns -> ordered conversation documents.

The unit of parallelism for extraction is the conversation document
(SURVEY.md §7.0): blank-node scope and the @prefix/@base environment are
per-document, and Turtle statements may span turn boundaries, so a document
must be concatenated *in turn order* before parsing (correctness-critical,
§7.3).

Two strategies, both pure built-in column ops (zero Python in the hot path):

* ``assemble_documents`` — single shuffle:
  ``groupBy(conv_id).agg(array_sort(collect_list(struct(turn_idx, text))))``
  then a JVM-side ``concat_ws(transform(...))``. Right default; AQE handles
  moderate skew.

* ``assemble_documents_salted`` — two-phase chunked aggregation for
  hot-conversation skew at 10^12-turn scale. NOTE: hash-salting
  (``pmod(hash(turn_idx), S)``) would interleave turns across salt buckets
  and break ordered concatenation; instead we salt on *contiguous ranges*
  (``floor(turn_idx / chunk)``), concatenate each range in a first shuffle
  (bounded group size regardless of conversation length), then concatenate
  the few range-partials per conversation in a second, tiny shuffle. This is
  the order-preserving form of the north rule's "salted repartitioning".

Per-turn text equality: ``concat_ws`` with ``\\n`` is lossless for turn
payloads that carry document lines; ``split_document_turns`` inverts it for
the invariant test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DOC_COLUMNS = ["conv_id", "text", "n_turns"]


def _ordered_concat(texts_struct_col):
    """array_sort on struct(turn_idx, ...) sorts by turn_idx (first field),
    then project .text and join — all whole-stage-codegen'd."""
    return F.concat_ws(
        "\n", F.transform(F.array_sort(texts_struct_col), lambda x: x["text"])
    )


def assemble_documents(transcripts: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, text, ...) -> (conv_id, text, n_turns); one shuffle."""
    return (
        transcripts.groupBy("conv_id")
        .agg(
            F.collect_list(F.struct("turn_idx", "text")).alias("turns"),
            F.count("*").alias("n_turns"),
        )
        .select("conv_id", _ordered_concat(F.col("turns")).alias("text"), "n_turns")
    )


def assemble_documents_salted(transcripts: DataFrame, chunk: int = 256) -> DataFrame:
    """Two-phase assembly: bounded group sizes under hot-conversation skew.

    Phase 1 groups on (conv_id, turn_idx div chunk) — a conversation with a
    million turns becomes ~4k groups of <=``chunk`` turns spread across the
    cluster. Phase 2 re-groups the partials per conversation (rows now number
    ceil(turns/chunk), not turns) and concatenates in range order.
    """
    part = (
        transcripts.withColumn("salt", (F.col("turn_idx") / F.lit(chunk)).cast("long"))
        .groupBy("conv_id", "salt")
        .agg(
            F.collect_list(F.struct("turn_idx", "text")).alias("turns"),
            F.count("*").alias("n_turns"),
        )
        .select(
            "conv_id",
            "salt",
            _ordered_concat(F.col("turns")).alias("part_text"),
            "n_turns",
        )
    )
    return (
        part.groupBy("conv_id")
        .agg(
            F.collect_list(F.struct(F.col("salt").alias("turn_idx"), F.col("part_text").alias("text"))).alias("turns"),
            F.sum("n_turns").alias("n_turns"),
        )
        .select("conv_id", _ordered_concat(F.col("turns")).alias("text"), "n_turns")
    )
