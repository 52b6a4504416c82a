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


def test_streaming_attr_typo_geo_compaction_consistency(spark, tmp_path):
    """VERDICT r3 #9: shard append (with attr_cols) + compaction leaves the
    AttributeStore, AttributeIndex, typo-variant artifact, and geo lookups
    consistent with a FRESH batch build over the full corpus; a tombstoned
    streamed doc disappears from all of them on the next compaction."""
    import numpy as np
    from pyspark.sql import functions as F

    from sparkft.corpus import generate_corpus
    from sparkft.facets import (AttributeIndex, AttributeStore,
                                write_attribute_index, write_attribute_store)
    from sparkft.geo import geo_radius_ids
    from sparkft.index_build import build_index, compact_index, delete_docs
    from sparkft.search import IndexReader, wand_topk
    from sparkft.streaming import incremental_index

    def with_attrs(pdf):
        df = spark.createDataFrame(pdf).withColumn(
            "doc_id", F.xxhash64("repo", "path", "commit"))
        return df.select(
            "doc_id", F.col("content").alias("text"), "lang",
            (F.pmod(F.col("doc_id"), F.lit(1800)) / 10.0 - 90.0).alias("lat"),
            (F.pmod(F.col("doc_id"), F.lit(3600)) / 10.0 - 180.0).alias("lng"),
        )

    batch = with_attrs(generate_corpus(80, seed=21))
    streamed = with_attrs(generate_corpus(40, seed=21, offset=80))

    # --- incremental path: batch build + attr stores, then stream append ---
    s_out = str(tmp_path / "sidx")
    build_index(spark, batch, s_out, text_col="text", doc_id_col="doc_id",
                num_shards=1, num_buckets=8, verify_sha=False,
                typo_variants=True)
    write_attribute_store(spark, batch, s_out,
                          cols=("lang", "lat", "lng"), num_buckets=4)
    write_attribute_index(spark, batch, s_out, cols=("lang",), num_buckets=4)

    src = str(tmp_path / "src")
    streamed.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, lat double, lng double"
    ).parquet(src)
    q = incremental_index(stream, s_out,
                          checkpoint_dir=str(tmp_path / "ck"),
                          attr_cols=("lang", "lat", "lng")) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert os.path.isdir(f"{s_out}/attrs_raw")
    compact_index(spark, s_out, num_buckets=8)
    assert not os.path.isdir(f"{s_out}/attrs_raw")  # folded in

    # --- fresh batch build over the full corpus ---
    full = batch.unionByName(streamed)
    b_out = str(tmp_path / "bidx")
    build_index(spark, full, b_out, text_col="text", doc_id_col="doc_id",
                num_shards=1, num_buckets=8, verify_sha=False,
                typo_variants=True)
    write_attribute_store(spark, full, b_out,
                          cols=("lang", "lat", "lng"), num_buckets=4)
    write_attribute_index(spark, full, b_out, cols=("lang",), num_buckets=4)

    rs, rb = IndexReader(spark, s_out), IndexReader(spark, b_out)
    ss, sb = AttributeStore(s_out), AttributeStore(b_out)
    all_ids = np.sort(sb.doc_ids)
    assert np.array_equal(np.sort(ss.doc_ids), all_ids)
    for col in ("lang", "lat", "lng"):
        got, want = ss.lookup(all_ids, col), sb.lookup(all_ids, col)
        assert np.array_equal(got, want), col

    is_, ib = AttributeIndex(s_out), AttributeIndex(b_out)
    langs = {r["lang"] for r in full.select("lang").distinct().collect()}
    for v in sorted(langs):
        assert np.array_equal(is_.doc_ids("lang", v), ib.doc_ids("lang", v)), v

    for term in ("windoe", "impot", "retrun"):
        assert (rs.symspell().expand_with_distance(term)
                == rb.symspell().expand_with_distance(term)), term

    center = (12.0, 34.0)
    g_s = geo_radius_ids(rs, ss, "import", center, 2_000_000)
    g_b = geo_radius_ids(rb, sb, "import", center, 2_000_000)
    assert np.array_equal(np.sort(g_s), np.sort(g_b))

    # --- tombstone a STREAMED doc; next compaction drops it everywhere ---
    victim = int(streamed.select("doc_id").first()["doc_id"])
    delete_docs(s_out, [victim])
    compact_index(spark, s_out, num_buckets=8)
    ss2 = AttributeStore(s_out)
    assert victim not in set(ss2.doc_ids.tolist())
    is2 = AttributeIndex(s_out)
    for v in sorted(langs):
        assert victim not in set(is2.doc_ids("lang", v).tolist()), v
    for query in ("import config", "fn parse"):
        assert victim not in [d for d, _ in wand_topk(
            IndexReader(spark, s_out), query, 50)]


def test_streaming_append_updates_bm25_n(spark, tmp_path):
    """Regression: compaction used to carry N forward from the prior batch
    build, so streaming ADDS left N stale (idf over half the corpus went
    negative and ranking diverged from a fresh build). N must equal the
    full live corpus after append + compaction, and BM25 scores must match
    the batch build over the same docs exactly."""
    from pyspark.sql import functions as F

    from sparkft.corpus import generate_corpus
    from sparkft.index_build import build_index, compact_index
    from sparkft.search import IndexReader, wand_topk
    from sparkft.streaming import incremental_index

    def docs_df(pdf):
        return spark.createDataFrame(pdf).withColumn(
            "doc_id", F.xxhash64("repo", "path", "commit")
        ).select("doc_id", F.col("content").alias("text"))

    first = docs_df(generate_corpus(60, seed=33))
    added = docs_df(generate_corpus(60, seed=33, offset=60))

    s_out = str(tmp_path / "sidx")
    build_index(spark, first, s_out, text_col="text", doc_id_col="doc_id",
                num_shards=1, num_buckets=8, verify_sha=False)
    src = str(tmp_path / "src")
    added.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = incremental_index(stream, s_out, checkpoint_dir=str(tmp_path / "ck")) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    compact_index(spark, s_out, num_buckets=8)

    full = first.unionByName(added)
    b_out = str(tmp_path / "bidx")
    build_index(spark, full, b_out, text_col="text", doc_id_col="doc_id",
                num_shards=1, num_buckets=8, verify_sha=False)

    rs, rb = IndexReader(spark, s_out), IndexReader(spark, b_out)
    assert rs.N == rb.N == full.count()
    assert rs.avgdl == rb.avgdl
    for query in ("import config", "fn parse", "self return"):
        assert wand_topk(rs, query, 10) == wand_topk(rb, query, 10)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Exact-dup rows arriving within the watermark horizon collapse to
    the FIRST arrival; distinct content always passes through. State is
    keyed on md5(text), not the text itself."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "dsrc")
    ckpt = str(tmp_path / "dckpt")
    rows = [
        (1, "alpha beta", "2024-01-01 00:00:00"),
        (2, "alpha beta", "2024-01-01 00:01:00"),   # dup within horizon
        (3, "gamma delta", "2024-01-01 00:02:00"),
        (4, "alpha beta", "2024-01-01 00:03:00"),   # dup within horizon
        (5, "epsilon", "2024-01-01 00:04:00"),
    ]
    (
        spark.createDataFrame(rows, "doc_id long, text string, ts_s string")
        .withColumn("ts", F.to_timestamp("ts_s"))
        .drop("ts_s")
        .write.parquet(src)
    )

    from sparkft.streaming import streaming_dedup

    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp").parquet(src)
    out = streaming_dedup(stream, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["doc_id"]: r for r in spark.sql(
        "SELECT * FROM dedup_sink").collect()}
    # one row per distinct content; the survivor of 'alpha beta' is the
    # first arrival (doc 1), and the key column is the md5 of the text
    assert sorted(got) == [1, 3, 5]
    import hashlib

    assert got[1]["content_key"] == hashlib.md5(b"alpha beta").hexdigest()
