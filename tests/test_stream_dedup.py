"""Cross-micro-batch streaming dedup (streaming/dedup.py)."""

import os

from pyspark.sql import functions as F

from open_source_search_engine_spark.streaming.dedup import (
    dedup_documents_batch,
    dedup_documents_stream,
)


def test_stream_dedup_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    out_table = "stream_dedup_out"
    os.makedirs(src)
    schema = "doc_id long, content string, ts timestamp"
    # batch 1: A + B; batch 2 (separate file): duplicate of A + new C,
    # all within the watermark horizon
    spark.createDataFrame(
        [(1, "alpha body", "2026-01-01 00:00:00"), (2, "beta body", "2026-01-01 00:00:10")],
        "doc_id long, content string, ts string",
    ).withColumn("ts", F.to_timestamp("ts")).write.parquet(f"{src}/b1.parquet")
    spark.createDataFrame(
        [(3, "alpha body", "2026-01-01 00:00:20"), (4, "gamma body", "2026-01-01 00:00:30")],
        "doc_id long, content string, ts string",
    ).withColumn("ts", F.to_timestamp("ts")).write.parquet(f"{src}/b2.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # force >=2 micro-batches
        .parquet(f"{src}/*.parquet")
    )
    q = (
        dedup_documents_stream(stream, text_col="content", ts_col="ts")
        .writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT content FROM {out_table}").collect()
    contents = sorted(r["content"] for r in rows)
    # 'alpha body' arrived twice across micro-batches -> kept once
    assert contents == ["alpha body", "beta body", "gamma body"]


def test_batch_twin_keeps_min_doc_id(spark):
    docs = spark.createDataFrame(
        [(9, "x"), (3, "x"), (5, "y")], "doc_id long, content string"
    )
    rows = dedup_documents_batch(docs).collect()
    kept = {r["content"]: r["doc_id"] for r in rows}
    assert kept == {"x": 3, "y": 5}


def test_null_content_rows_are_not_duplicates_of_each_other(spark):
    """md5(NULL) is NULL and a NULL dedup key groups ALL null-content
    rows together — distinct failed-fetch docs must all survive."""
    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "same"), (4, "same")],
        "doc_id long, content string",
    )
    kept = sorted(
        r["doc_id"] for r in dedup_documents_batch(docs).collect()
    )
    assert kept == [1, 2, 3]
