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