"""Stateful streaming dedup: duplicates dropped ACROSS micro-batches."""

import pandas as pd


def test_streaming_dedup_across_batches(spark, tmp_path):
    from rio_spark.streaming.stateful import streaming_dedup

    src = tmp_path / "src"
    src.mkdir()
    # two files -> maxFilesPerTrigger=1 makes them separate micro-batches
    b1 = pd.DataFrame(
        [("a", "hello world"), ("b", "unique one"), ("a2", "hello world")],
        columns=["doc_id", "text"],
    )
    b2 = pd.DataFrame(
        [("c", "hello world"), ("d", "brand new"), ("e", "unique one")],
        columns=["doc_id", "text"],
    )
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        streaming_dedup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM dedup_out").toPandas()
    finally:
        q.stop()

    # one row per distinct text, first-seen wins within arrival order
    assert sorted(out.text) == ["brand new", "hello world", "unique one"]
    assert len(out) == 3

def test_streaming_dedup_bounded_state_evicts_oldest(spark, tmp_path):
    """With a state cap, the oldest hash is evicted deterministically and a
    late duplicate of it is re-admitted (sliding-window dedup semantics)."""
    from rio_spark.streaming.stateful import streaming_dedup

    src = tmp_path / "src"
    src.mkdir()
    b1 = pd.DataFrame(
        [("a", "t1"), ("b", "t2"), ("c", "t3")], columns=["doc_id", "text"]
    )
    # t1's hash should have been evicted (cap=2) -> re-admitted; t3 is still
    # in state -> dropped
    b2 = pd.DataFrame([("d", "t1"), ("e", "t3")], columns=["doc_id", "text"])
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = (
        streaming_dedup(stream, n_buckets=1, max_state_per_bucket=2)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_bounded")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM dedup_bounded").toPandas()
    finally:
        q.stop()

    assert sorted(out.doc_id) == ["a", "b", "c", "d"]  # d = re-admitted t1
