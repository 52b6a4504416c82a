"""Structured Streaming: incremental tokenize postings + windowed counts."""

import json
import os
import time

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-streaming-tests")
        .getOrCreate()
    )
    yield s


def test_stream_postings_and_incremental_index(spark, tmp_path):
    from pyspark.sql import functions as F

    from sparkft.corpus import generate_corpus
    from sparkft.streaming import incremental_index

    src = str(tmp_path / "src")
    out = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    pdf = generate_corpus(100, seed=7)
    df = spark.createDataFrame(pdf).withColumn(
        "doc_id", F.xxhash64("repo", "path", "commit")
    )
    df.select("doc_id", F.col("content").alias("text")).write.parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )
    q = incremental_index(stream, out, checkpoint_dir=ckpt).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)

    manifests = os.listdir(f"{out}/manifests")
    assert manifests, "no streaming shard manifests written"
    m = json.load(open(f"{out}/manifests/{manifests[0]}"))
    assert m["source"] == "structured-streaming"

    got = spark.read.parquet(f"{out}/postings_raw")
    # postings from the stream equal postings from the batch path
    from sparkft.index_build import POSTINGS_SCHEMA, make_tokenize_arrow_fn
    from sparkft.config import DEFAULT_CONFIG

    fn = make_tokenize_arrow_fn(DEFAULT_CONFIG, "text", emit_sha=False)
    expected = (
        df.select("doc_id", F.col("content").alias("text"))
        .mapInArrow(fn, POSTINGS_SCHEMA)
    )
    assert got.count() == expected.count()
    cols = ["token", "doc_id", "tf", "doc_len"]
    g = sorted(map(tuple, got.select(*cols).collect()))
    e = sorted(map(tuple, expected.select(*cols).collect()))
    assert g == e


def test_windowed_token_counts(spark, tmp_path):
    from pyspark.sql import functions as F

    from sparkft.streaming import windowed_token_counts

    src = str(tmp_path / "events_src")
    rows = [
        (1, "2026-01-01 00:00:10", "alpha beta"),
        (2, "2026-01-01 00:00:40", "beta gamma"),
        (3, "2026-01-01 00:01:20", "beta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, ts_s string, text string") \
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    df.write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(src)
    out = windowed_token_counts(stream, window="1 minute", watermark="2 minutes")
    q = (
        out.writeStream.format("memory").queryName("wtc")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    res = {
        (str(r["window_start"]), r["token"]): r["cnt"]
        for r in spark.sql("select * from wtc").collect()
    }
    assert res[("2026-01-01 00:00:00", "beta")] == 2
    assert res[("2026-01-01 00:01:00", "beta")] == 1
    assert res[("2026-01-01 00:00:00", "alpha")] == 1


def test_streaming_compaction_equals_batch(spark, tmp_path):
    """stream ingest -> compact_index -> queries identical to a batch build
    over the same docs."""
    from pyspark.sql import functions as F

    from sparkft.corpus import generate_corpus
    from sparkft.index_build import build_index, compact_index
    from sparkft.search import IndexReader, taat_topk, wand_topk
    from sparkft.streaming import incremental_index

    pdf = generate_corpus(120, seed=9)
    df = spark.createDataFrame(pdf).withColumn(
        "doc_id", F.xxhash64("repo", "path", "commit")
    ).select("doc_id", F.col("content").alias("text"))

    # streaming path
    src = str(tmp_path / "src")
    df.repartition(3).write.parquet(src)
    s_out = str(tmp_path / "sidx")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = incremental_index(stream, s_out, checkpoint_dir=str(tmp_path / "ck")) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    compact_index(spark, s_out, num_buckets=8)

    # batch path over the same docs
    b_out = str(tmp_path / "bidx")
    build_index(spark, spark.createDataFrame(pdf), b_out,
                num_shards=1, num_buckets=8, verify_sha=False)

    rs = IndexReader(spark, s_out)
    rb = IndexReader(spark, b_out)
    assert rs.N == rb.N and rs.avgdl == rb.avgdl
    for query in ["import config", "fn parse", "self return"]:
        assert taat_topk(rs, query, 10) == taat_topk(rb, query, 10)
        assert wand_topk(rs, query, 10) == wand_topk(rb, query, 10)


def test_running_token_df_stateful(spark, tmp_path):
    """applyInPandasWithState keeps per-token cumulative df across
    micro-batches (maxFilesPerTrigger=1 forces one batch per file)."""
    from pyspark.sql import functions as F

    from sparkft.streaming import running_token_df

    src = str(tmp_path / "src2")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(3, "alpha beta"), (4, "delta")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_token_df(stream)
        .writeStream.format("memory")
        .queryName("runningdf")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("select * from runningdf").collect()
    final = {}
    for r in rows:
        final[r["token"]] = max(final.get(r["token"], 0), r["cum_df"])
    # alpha appears in docs 1,2 (file A) and 3 (file B) -> cumulative 3
    assert final["alpha"] == 3
    assert final["beta"] == 2
    assert final["gamma"] == 1
    assert final["delta"] == 1
    # at least one token must have been updated across two batches
    assert any(r["batch_delta"] < r["cum_df"] for r in rows)
